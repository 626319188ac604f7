#!/usr/bin/env python
"""Opt-in scale audit: do the heavy chains scale sub-quadratically?

Runs each audited chain at sf0.01 and sf0.1 on a deliberately small
``local[4]`` (so parallelism can't hide work growth) and checks that
wall time grows SUB-QUADRATICALLY in the data size. The sf0.01 DuckDB
oracle can prove the answer right but cannot see an accidental
all-pairs blowup: a cartesian that sneaks into a pair path is ~100×
more work at 10× the rows, and this is the harness that catches it.

Audited chains (the three places an accidental quadratic could hide):
- ``dedup_chain``: MinHash-LSH pair generation → connected components
  → quality-aware canonical survivors (the full near-dup pipeline).
- ``ann_chain``: k-means Lloyd pivot training → IVF top-k self-probe
  (the graded ``sim_ann_ivf_trained`` path; a broken cell assignment
  degenerates into brute-force all-pairs).
- ``substring_spans``: positioned 8-gram extraction → global gram
  count → lag/cumsum island merge (the graded
  ``dedup_substring_spans`` path; gram explosion or a self-join on
  doc_id would blow up here).

Pass criterion per chain: t(sf0.1) / t(sf0.01) < RATIO_MAX (default
30). The ideal is ~10× (linear in rows); fixed per-job overhead at
sf0.01 pulls the observed ratio well below that; a quadratic operator
pushes it toward 100×. 30 separates the regimes with a wide margin on
a noisy shared host.

Usage:  python tools/scale_check.py              # all sf-scaling chains
        python tools/scale_check.py dedup_chain  # one chain
        python tools/scale_check.py bridge_log_replay  # log-LENGTH audit
Exits 1 if any audited chain exceeds RATIO_MAX.
Committed readings live in PLANS.md (§ scale audit).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

RATIO_MAX = float(os.environ.get("SCALE_CHECK_RATIO_MAX", "30"))


def dedup_chain(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from sql_based_etl_spark.operators.dedup import minhash_lsh_pairs
    from sql_based_etl_spark.operators.graph import canonical_survivors
    from sql_based_etl_spark.queries._util import load

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    return canonical_survivors(
        docs.withColumn("__q", F.length("text")), pairs, quality_col="__q"
    ).drop("__q")


def ann_chain(spark, sf_dir: str):
    # the exact graded path: Lloyd training + trained-IVF self-probe
    from sql_based_etl_spark.queries import all_queries

    return all_queries()["sim_ann_ivf_trained"](spark, sf_dir)


def substring_spans(spark, sf_dir: str):
    from sql_based_etl_spark.queries import all_queries

    return all_queries()["dedup_substring_spans"](spark, sf_dir)


CHAINS = {
    "dedup_chain": dedup_chain,
    "ann_chain": ann_chain,
    "substring_spans": substring_spans,
}


def bridge_log_replay(spark) -> bool:
    """Log-LENGTH scale audit for the Delta bridge read path (a
    different axis from the sf-scaling chains): driver-side log replay
    and a fixed-window CDF read must stay O(JSON tail behind the last
    checkpoint), not O(full history) — the property that keeps a
    one-commit-per-micro-batch streaming sink readable after months.

    Builds two bridge tables with checkpoints every 10 commits — one
    with a SHORT history (20 commits), one LONG (220 commits, the
    VERDICT-prescribed 200+) — then measures (min-of-3):

    - ``_replay_state`` (the driver replay every snapshot read pays):
      with checkpoints, both tables replay `_last_checkpoint` + ≤10
      JSON entries, so the ratio should be ~1; an O(history) replay
      would read 11× the entries.
    - ``read_delta_changes`` over the LAST 10 commits (constant data):
      the CDF reader touches only the requested window's entries, so
      again ~1; O(history) behavior shows up as ~11×.

    Pass: both ratios < 3 (wide margin over ~1, far under 11)."""
    import shutil
    import tempfile

    from sql_based_etl_spark.tables.delta_interop import (
        _replay_state,
        read_delta_changes,
        write_delta,
    )

    def build(n_commits: int) -> str:
        root = tempfile.mkdtemp(prefix="scale_bridge_")
        d = f"{root}/t"
        for i in range(n_commits):
            batch = spark.createDataFrame(
                [(i * 10 + j, f"r{i}-{j}") for j in range(10)],
                "id long, v string").coalesce(1)
            write_delta(batch, d, mode="append" if i else "overwrite",
                        checkpoint_interval=10,
                        properties=(
                            {"delta.enableChangeDataFeed": "true"}
                            if i == 0 else None))
        return root, d

    def t_replay(d: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _replay_state(spark, d)
            best = min(best, time.perf_counter() - t0)
        return best

    def t_cdf(d: str, latest: int) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            read_delta_changes(spark, d, latest - 9, latest).write \
                .format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    root_s, short = build(20)
    root_l, long_ = build(220)
    try:
        r_short, r_long = t_replay(short), t_replay(long_)
        c_short, c_long = t_cdf(short, 19), t_cdf(long_, 219)
    finally:
        shutil.rmtree(root_s, ignore_errors=True)
        shutil.rmtree(root_l, ignore_errors=True)
    replay_ratio = r_long / r_short
    cdf_ratio = c_long / c_short
    ok = replay_ratio < 3 and cdf_ratio < 3
    print(json.dumps({
        "metric": "bridge_log_replay_scale",
        "replay_t_20_commits": round(r_short, 3),
        "replay_t_220_commits": round(r_long, 3),
        "replay_ratio": round(replay_ratio, 2),
        "cdf_window10_t_20_commits": round(c_short, 3),
        "cdf_window10_t_220_commits": round(c_long, 3),
        "cdf_ratio": round(cdf_ratio, 2),
        "ratio_max": 3,
        "ok": ok,
    }))
    return ok


def run_chain(spark, sf_dir: str, fn) -> float:
    """One timed end-to-end chain at ``sf_dir`` (forced with the JVM
    noop sink, like bench.py)."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from sql_based_etl_spark.session import get_spark

    names = sys.argv[1:] or list(CHAINS)
    spark = get_spark(app_name="scale_check", master="local[4]",
                      shuffle_partitions=8)
    all_ok = True
    for name in names:
        if name == "bridge_log_replay":
            all_ok = bridge_log_replay(spark) and all_ok
            continue
        fn = CHAINS[name]
        run_chain(spark, "/root/testdata/sf0.001", fn)  # warmup: JIT/codegen
        t_small = min(run_chain(spark, "/root/testdata/sf0.01", fn)
                      for _ in range(2))
        t_big = run_chain(spark, "/root/testdata/sf0.1", fn)
        ratio = t_big / t_small
        ok = ratio < RATIO_MAX
        all_ok = all_ok and ok
        print(json.dumps({
            "metric": f"{name}_scale_ratio",
            "t_sf0_01": round(t_small, 2),
            "t_sf0_1": round(t_big, 2),
            "ratio": round(ratio, 1),
            "ratio_max": RATIO_MAX,
            "ok": ok,
        }))
    spark.stop()
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
