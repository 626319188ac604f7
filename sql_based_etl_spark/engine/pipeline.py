"""Pipeline runner: ordered execution of typed stages over a named-view
registry — the engine's core abstraction (SURVEY.md §1: every stage
consumes ``inputView`` and/or produces ``outputView``; the notebook's
own tip at scd2-job.ipynb:227 calls views "temp tables").

Lifecycle per stage (SURVEY.md §3): resolve config (P2) → filter by
``environments`` (P1, scd2-job.ipynb:409) → dispatch on ``type`` →
execute one DataFrame chain → register ``outputView``. Stage ``name``
becomes the Spark job description (P4).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from sql_based_etl_spark.engine.config import ConfigError

log = logging.getLogger("sql_based_etl_spark.pipeline")


class StageError(RuntimeError):
    pass


class PipelineContext:
    """Mutable run state: variables (%env), the view registry, and the
    active environment."""

    def __init__(self, spark: SparkSession, environment: str = "dev",
                 variables: dict[str, str] | None = None):
        self.spark = spark
        self.environment = environment
        self.variables: dict[str, str] = dict(variables or {})
        self.views: dict[str, DataFrame] = {}
        self.num_rows_preview = 0  # %conf numRows; 0 = no preview echo
        from sql_based_etl_spark.caching import CacheScope

        # one owner for everything this run caches: Arc `persist: true`
        # views AND operator-level pin() barriers created by stage
        # bodies (stages execute under this scope — see _execute_stage)
        self.cache_scope = CacheScope()
        self.observations: dict[str, Any] = {}

    def observed_metrics(self, wait_secs: float = 2.0) -> dict[str, dict[str, Any]]:
        """Metrics collected by ``observe: true`` stages — per stage
        name, the metric dict Spark accumulated while the FIRST action
        over that stage's output ran (zero extra jobs; that is the
        point of ``Dataset.observe`` vs counting views afterwards).

        Bounded, never hanging: the metric lands via an async listener
        shortly after the action returns, so completion is polled up to
        ``wait_secs`` — but ONLY until the first poll pass, after which
        still-incomplete observations (views nothing downstream ever
        consumed — ``Observation.get`` would block on those forever)
        are simply absent from the result."""
        import time

        def probe(obs) -> bool | None:
            # Observation._jo / .future() are private PySpark/JVM
            # surfaces (not stable API); a Spark upgrade or a Spark
            # Connect session may not expose them. Any probe failure
            # means "cannot confirm completion" — the observation is
            # left absent from the result rather than raising.
            try:
                jo = obs._jo  # noqa: SLF001
                if jo is None:
                    return None  # never attached to a plan
                return bool(jo.future().isCompleted())
            except Exception:  # noqa: BLE001
                return None

        deadline = time.monotonic() + wait_secs
        pending = {
            name: obs for name, obs in self.observations.items()
            if probe(obs) is not None
        }
        out: dict[str, dict[str, Any]] = {}
        while pending:
            for name in [n for n, o in pending.items() if probe(o)]:
                out[name] = pending.pop(name).get
            if not pending or time.monotonic() >= deadline:
                break
            time.sleep(0.05)
        return out

    def track_persisted(self, df: DataFrame) -> DataFrame:
        """Record a view cached via the Arc ``persist`` attribute so
        :meth:`close` can release it — a long-lived session running
        many pipelines (the scheduler pattern) must not accumulate
        MEMORY_AND_DISK blocks forever."""
        return self.cache_scope.add(df)

    def close(self) -> None:
        """Release everything this run persisted — Arc ``persist:
        true`` views and operator pin() barriers alike. Idempotent.
        Call when the run's outputs are no longer needed;
        :func:`run_notebook` and the DAG runner leave views live for
        the caller, so the caller owns the close."""
        self.cache_scope.release()

    def register_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self.views[name] = df

    def view(self, name: str) -> DataFrame:
        if name in self.views:
            return self.views[name]
        try:
            return self.spark.table(name)
        except Exception as e:  # noqa: BLE001
            raise StageError(f"unknown inputView {name!r}") from e


class Pipeline:
    def __init__(self, spark: SparkSession, environment: str = "dev",
                 variables: dict[str, str] | None = None):
        self.ctx = PipelineContext(spark, environment, variables)

    def run(self, stages: list[dict[str, Any]]) -> PipelineContext:
        """Execute stages in order (the production entry point runs the
        same list a notebook produces — scd2-job-scheduler.yaml:29)."""
        for i, stage in enumerate(stages):
            self._execute_stage(i, stage)
        return self.ctx

    def _execute_stage(self, i: int, stage: dict[str, Any]) -> None:
        from sql_based_etl_spark.engine.stages import STAGE_TYPES

        stype = stage.get("type")
        if not stype:
            raise ConfigError(f"stage {i} has no type: {stage}")
        envs = stage.get("environments")
        if envs and self.ctx.environment not in envs:
            log.info("skip stage %s (%s): env %s not in %s",
                     i, stage.get("name"), self.ctx.environment, envs)
            return
        fn = STAGE_TYPES.get(stype)
        if fn is None:
            raise ConfigError(f"unknown stage type {stype!r}")
        name = stage.get("name", stype)
        self.ctx.spark.sparkContext.setJobDescription(f"{stype}: {name}")
        log.info("run stage %s: %s (%s)", i, name, stype)
        from sql_based_etl_spark.caching import use_scope

        # stage bodies run under the context's cache scope so any
        # operator-level pin() barrier they create is released by
        # ctx.close() — including from run_dag's worker threads, where
        # the context variable would not otherwise propagate
        with use_scope(self.ctx.cache_scope):
            df = fn(self.ctx, stage)
        out = stage.get("outputView")
        if out and df is not None:
            # Arc logs per-stage record counts; the Spark-native way
            # is Dataset.observe — metrics accumulate inside the
            # first downstream action, costing ZERO extra jobs
            # (counting views afterwards would re-run their plans)
            if str(stage.get("observe", "")).lower() == "true":
                from pyspark.sql import Observation
                from pyspark.sql import functions as F

                obs = Observation(f"stage:{name}")
                df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                self.ctx.observations[name] = obs
            # Arc stage attribute ``persist``: cache a view that
            # multiple later stages will re-read (e.g. a staged CDC
            # view consumed by both a merge and a validation) so
            # its lineage executes once. StorageLevel defaults to
            # MEMORY_AND_DISK — spill-safe on big views.
            if str(stage.get("persist", "")).lower() == "true":
                df = self.ctx.track_persisted(df.persist())
            self.ctx.register_view(out, df)
            if self.ctx.num_rows_preview:
                df.show(self.ctx.num_rows_preview, truncate=False)

    def run_dag(self, stages: list[dict[str, Any]],
                max_parallel: int = 1) -> PipelineContext:
        """P6 DAG execution (SURVEY.md §2e): topologically order an
        *unordered* stage list and run it.

        Dependency edges, mirroring what the reference's Argo DAG
        encodes by hand (scd2-job-scheduler.yaml:47-48, where SCD2-merge
        depends on initial-load and delta-load):

        - **view edges** — a stage consuming a view (``inputView``,
          ``inputViews``, or a view name referenced in its ``sql`` text)
          depends on the stage producing it via ``outputView``;
        - **table edges** — a stage reading ``inputURI`` (and a merge
          stage targeting ``outputURI``) depends on stages that write
          that same URI, so loads precede merges into the same table;
        - **explicit ``dependsOn``** — a list of stage names, for
          ordering the graph can't infer (side-effect ordering).

        Ties are broken by list position, so a correctly-ordered list
        executes identically under ``run`` and ``run_dag``.

        ``max_parallel > 1`` runs independent branches concurrently from
        driver-side threads — exactly what the reference's Argo DAG does
        with its parallel initial-load/delta-load tasks
        (scd2-job-scheduler.yaml:15-48), and the standard Spark idiom
        for filling a cluster whose single lineages can't: each thread
        submits its own jobs and the scheduler interleaves them. Stage
        bodies stay Python-thin (plan construction + one action), so
        thread overhead is negligible; failures cancel the remaining
        schedule and re-raise.
        """
        order = self._topo_order(stages)
        if max_parallel <= 1:
            return self.run([stages[i] for i in order])

        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        deps = self._stage_deps(stages)
        pending: dict[int, set[int]] = {i: set(d) for i, d in enumerate(deps)}
        running: dict[Any, int] = {}
        with ThreadPoolExecutor(max_workers=max_parallel) as pool:
            while pending or running:
                ready = sorted(i for i, d in pending.items() if not d)
                for i in ready[: max(0, max_parallel - len(running))]:
                    del pending[i]
                    running[pool.submit(self._execute_stage, i, stages[i])] = i
                done, _ = wait(running, return_when=FIRST_COMPLETED)
                for fut in done:
                    i = running.pop(fut)
                    fut.result()  # re-raise stage failures here
                    for d in pending.values():
                        d.discard(i)
        return self.ctx

    @staticmethod
    def _topo_order(stages: list[dict[str, Any]]) -> list[int]:
        """Kahn's algorithm with a min-heap over :meth:`_stage_deps`:
        deterministic, list-position tie-break (an already-ordered list
        round-trips unchanged)."""
        import heapq

        deps = Pipeline._stage_deps(stages)
        out: list[int] = []
        pending = [d.copy() for d in deps]
        ready = [i for i, d in enumerate(pending) if not d]
        heapq.heapify(ready)
        done: set[int] = set()
        while ready:
            i = heapq.heappop(ready)
            out.append(i)
            done.add(i)
            for j, d in enumerate(pending):
                if j not in done and i in d:
                    d.discard(i)
                    if not d:
                        heapq.heappush(ready, j)
        if len(out) != len(stages):
            cyc = [stages[i].get("name", i) for i in range(len(stages)) if i not in done]
            raise ConfigError(f"stage dependency cycle among: {cyc}")
        return out

    @staticmethod
    def _stage_deps(stages: list[dict[str, Any]]) -> list[set[int]]:
        import re

        view_producers: dict[str, list[int]] = {}
        uri_producers: dict[str, list[int]] = {}
        by_name: dict[str, int] = {}
        for i, st in enumerate(stages):
            if st.get("outputView"):
                view_producers.setdefault(st["outputView"], []).append(i)
            if st.get("outputURI"):
                uri_producers.setdefault(st["outputURI"], []).append(i)
            if st.get("name"):
                by_name[st["name"]] = i

        deps: list[set[int]] = [set() for _ in stages]
        # Two stages producing the SAME outputView must not run
        # concurrently: createOrReplaceTempView + ctx.views are
        # last-writer-wins, so an unordered pair racing under
        # run_dag(max_parallel>1) makes the surviving view
        # nondeterministic and can hand a downstream consumer the
        # earlier producer's data. Chain duplicate producers in list
        # order (earlier → later) — the same resolution uri_edges
        # applies to multi-writer tables — so parallel execution
        # matches serial run() semantics.
        for ps in view_producers.values():
            for a, b in zip(ps, ps[1:]):
                deps[b].add(a)
        for i, st in enumerate(stages):
            consumed = list(st.get("inputViews") or [])
            if st.get("inputView"):
                consumed.append(st["inputView"])
            sql = st.get("sql")
            if sql:
                # resolve ${param} indirection BEFORE scanning for view
                # references — the reference's own calc stages consume
                # their input as `FROM ${table_name}` (SURVEY P3), which
                # is invisible to a raw-text scan (this was a latent
                # ordering bug that lingering temp views from earlier
                # pipelines in the same session masked)
                for pk, pv in (st.get("sqlParams") or {}).items():
                    sql = sql.replace("${" + pk + "}", str(pv))
                consumed += [v for v in view_producers
                             if re.search(rf"\b{re.escape(v)}\b", sql)]
            for v in consumed:
                deps[i].update(p for p in view_producers.get(v, []) if p != i)
            explicit = set()
            for dep_name in st.get("dependsOn") or []:
                if dep_name not in by_name:
                    raise ConfigError(
                        f"stage {st.get('name', i)!r} dependsOn unknown stage {dep_name!r}"
                    )
                explicit.add(by_name[dep_name])
            deps[i].update(explicit)

            def uri_edges(uri: str) -> None:
                # A URI written by several stages (load, then merge) has
                # multiple sequential states the graph alone can't order a
                # reader against — when the stage names one of the writers
                # in dependsOn, that explicit choice REPLACES the inferred
                # depend-on-every-writer edges (the reference resolves the
                # same ambiguity with Argo `dependencies`,
                # scd2-job-scheduler.yaml:47-48).
                producers = [p for p in uri_producers.get(uri, []) if p != i]
                if not (explicit & set(producers)):
                    deps[i].update(producers)

            if st.get("inputURI"):
                uri_edges(st["inputURI"])
            # a merge both reads and writes its target table: it must run
            # after any other stage that writes the same URI
            if st.get("outputURI") and "Merge" in str(st.get("type", "")):
                uri_edges(st["outputURI"])

        return deps
