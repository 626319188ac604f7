"""Stage-level profiler for bench queries (guide §1: measure first).

Runs one or more registry queries exactly like bench.py (warm pass,
then a timed pass against the noop sink), with the Spark event log
enabled, then parses the event log and prints a per-stage breakdown of
the timed pass: wall duration, task count, total task time, shuffle
read/write bytes, and the first line of the stage's callsite.

Usage:
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
    python tools/profile_query.py query_a query_b ...
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def run(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark-ev-")

    from sql_based_etl_spark.queries import all_queries
    from sql_based_etl_spark.session import get_spark

    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    registry = all_queries()

    # untimed warmup (mirrors bench.py)
    registry["q06_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    markers: dict[str, tuple[float, float, float]] = {}
    for name in names:
        registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        t0 = time.time()
        tp0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"TIMED:{name}")
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - tp0
        spark.sparkContext.setJobDescription(None)
        markers[name] = (t0, time.time(), wall)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001

    app_id = spark.sparkContext.applicationId
    spark.stop()

    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [p for p in os.listdir(evdir) if app_id in p]
        if not cands:
            raise SystemExit(f"no event log for {app_id} in {evdir}: {os.listdir(evdir)}")
        path = os.path.join(evdir, cands[0])
        if os.path.isdir(path):
            inner = [p for p in os.listdir(path) if p.startswith("events")]
            path = os.path.join(path, inner[0])

    jobs = {}       # jobId -> (submit_ms, desc, [stage_ids])
    stages = {}     # stageId -> dict
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "t": ev["Submission Time"] / 1000.0,
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                st = stages.setdefault(
                    sid,
                    {"name": "?", "details": "", "wall": None, "tasks": None,
                     "task_time": 0.0, "sh_read": 0, "sh_write": 0, "input": 0},
                )
                st["name"] = si.get("Stage Name", si.get("Name", ""))
                st["details"] = (si.get("Details") or "").split("\n")[0]
                st["wall"] = (com - sub) / 1000.0 if sub and com else None
                st["tasks"] = si.get("Number of Tasks")
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.get(sid)
                ti = ev.get("Task Info") or {}
                tm = ev.get("Task Metrics") or {}
                if st is None:
                    # task ends can precede StageCompleted in the log;
                    # buffer under a provisional record
                    st = stages.setdefault(
                        sid,
                        {"name": "?", "details": "", "wall": None, "tasks": None,
                         "task_time": 0.0, "sh_read": 0, "sh_write": 0, "input": 0},
                    )
                if tm:
                    st["task_time"] += tm.get("Executor Run Time", 0) / 1000.0
                    st["sh_read"] += (tm.get("Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0
                    ) + (tm.get("Shuffle Read Metrics") or {}).get(
                        "Local Bytes Read", 0
                    )
                    st["sh_write"] += (tm.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    st["input"] += (tm.get("Input Metrics") or {}).get(
                        "Bytes Read", 0
                    )

    for name, (t0, t1, wall) in markers.items():
        print(f"\n=== {name}: timed pass {wall:.3f}s ===")
        # jobs whose description the engine overwrote (pipeline stages
        # set their own) are still attributed by submission time window
        sel_jobs = [
            (jid, j) for jid, j in sorted(jobs.items())
            if t0 <= j["t"] <= t1
            and (j["desc"] == f"TIMED:{name}" or not j["desc"].startswith("TIMED:"))
        ]
        total_stage_wall = 0.0
        for jid, j in sel_jobs:
            ran = [s for s in j["stages"] if s in stages and stages[s]["wall"]]
            if not ran:
                continue
            for sid in sorted(ran):
                st = stages[sid]
                total_stage_wall += st["wall"] or 0
                print(
                    f"  job {jid:>3} stage {sid:>4} {st['wall']:6.2f}s"
                    f" tasks={st['tasks']:>3}"
                    f" taskT={st['task_time']:7.2f}s"
                    f" in={st['input']/1e6:7.1f}MB"
                    f" shR={st['sh_read']/1e6:6.1f}MB"
                    f" shW={st['sh_write']/1e6:6.1f}MB"
                    f"  {st['name'][:60]}"
                )
        print(f"  -- sum of stage walls: {total_stage_wall:.2f}s (vs {wall:.3f}s wall)")


if __name__ == "__main__":
    run(sys.argv[1:])
