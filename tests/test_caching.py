"""Lifecycle of operator-level persist barriers (round-13, verdict #1).

The contract under test (``sql_based_etl_spark/caching.py``): every
``pin()`` barrier an operator creates has an OWNER —

- a bare-library caller wraps the operator call AND its action in
  ``cache_scope()``; on scope exit the storage-level block count
  returns to the baseline, and the barrier held DURING the action
  (that is the point — unpersisting before the action would defeat
  the scoring-barrier/reuse plans the persists exist for);
- the engine routes stage-created barriers through the
  ``PipelineContext``'s scope, including from ``run_dag`` worker
  threads, so ``ctx.close()`` releases them alongside the Arc
  ``persist: true`` views it already tracked;
- with NO owner, ``pin`` is a bare ``persist()`` — process-lifetime,
  today's semantics (the driver's one-shot correctness runner).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_based_etl_spark.caching import active_scope, cache_scope, pin


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()  # noqa: SLF001


def _settle_persisted(spark) -> int:
    """Persistent-RDD count after draining async cleanup: earlier
    tests' out-of-scope localCheckpoint RDDs are reclaimed by the
    ContextCleaner on GC at arbitrary moments, which races any
    baseline comparison of the global count (observed as base
    captured high, then dropping mid-test)."""
    import gc
    import time

    gc.collect()
    spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    prev = -1
    for _ in range(40):
        cur = _n_persisted(spark)
        if cur == prev:
            return cur
        prev = cur
        time.sleep(0.05)
    return prev


def _docs(spark):
    rows = [(i, f"the quick brown fox jumps over dog number {i % 3}")
            for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cache_scope_releases_operator_barriers(spark):
    """Direct library call: barriers exist while the scope is open
    (and the action has run), and the persisted-RDD count returns to
    baseline on exit."""
    from sql_based_etl_spark.operators.dedup import minhash_lsh_pairs

    spark.catalog.clearCache()
    base = _settle_persisted(spark)
    with cache_scope() as scope:
        pairs = minhash_lsh_pairs(_docs(spark), threshold=0.1)
        n = pairs.count()  # materialize INSIDE the scope
        assert n > 0
        assert scope.pinned_count > 0, "operator created no barriers"
        assert _n_persisted(spark) > base, "barrier not persisted during query"
    assert _n_persisted(spark) == base, "scope exit leaked cached blocks"


def test_cache_scope_nested_inner_owns_its_pins(spark):
    spark.catalog.clearCache()
    base = _settle_persisted(spark)
    df = _docs(spark)
    with cache_scope() as outer:
        pin(df.select("doc_id")).count()
        assert outer.pinned_count == 1
        with cache_scope() as inner:
            pin(df.select("text")).count()
            assert inner.pinned_count == 1
        assert outer.pinned_count == 1  # inner released only its own
        assert _n_persisted(spark) == base + 1
    assert _n_persisted(spark) == base


def test_pin_without_scope_is_caller_owned(spark):
    """No active scope: pin() == bare persist(), process-lifetime."""
    spark.catalog.clearCache()
    base = _settle_persisted(spark)
    assert active_scope() is None
    df = pin(_docs(spark))
    try:
        df.count()
        assert _n_persisted(spark) == base + 1
    finally:
        df.unpersist()
    assert _n_persisted(spark) == base


def test_pipeline_close_releases_stage_operator_pins(spark):
    """A stage body that calls a pinning operator: the barrier lands in
    the PipelineContext's scope (via _execute_stage's use_scope) and
    ctx.close() releases it together with Arc persist:true views."""
    from sql_based_etl_spark.engine.pipeline import Pipeline
    from sql_based_etl_spark.engine.stages import STAGE_TYPES
    from sql_based_etl_spark.operators.dedup import minhash_lsh_pairs

    def dedup_stage(ctx, stage):
        out = minhash_lsh_pairs(_docs(ctx.spark), threshold=0.1)
        out.count()  # materialize like a Load stage would
        return out

    spark.catalog.clearCache()
    base = _settle_persisted(spark)
    STAGE_TYPES["_TestDedupStage"] = dedup_stage
    try:
        pipe = Pipeline(spark)
        ctx = pipe.run([
            {"type": "_TestDedupStage", "name": "dedup",
             "outputView": "test_pairs", "persist": "true"},
        ])
        # operator barriers + the Arc persist:true view are all live
        assert ctx.cache_scope.pinned_count >= 2
        assert _n_persisted(spark) > base
        assert ctx.view("test_pairs").count() >= 0
        ctx.close()
        assert _n_persisted(spark) == base, "ctx.close() leaked blocks"
        ctx.close()  # idempotent
    finally:
        STAGE_TYPES.pop("_TestDedupStage", None)


def test_dag_worker_threads_join_pipeline_scope(spark):
    """run_dag(max_parallel=2) executes stage bodies on worker threads
    where the context variable does not propagate — _execute_stage must
    activate the ctx scope explicitly or threaded barriers leak."""
    from sql_based_etl_spark.engine.pipeline import Pipeline
    from sql_based_etl_spark.engine.stages import STAGE_TYPES

    def pin_stage(ctx, stage):
        df = pin(_docs(ctx.spark).withColumn("s", F.lit(stage["name"])))
        df.count()
        return df

    spark.catalog.clearCache()
    base = _settle_persisted(spark)
    STAGE_TYPES["_TestPinStage"] = pin_stage
    try:
        pipe = Pipeline(spark)
        ctx = pipe.run_dag(
            [{"type": "_TestPinStage", "name": "a", "outputView": "va"},
             {"type": "_TestPinStage", "name": "b", "outputView": "vb"}],
            max_parallel=2)
        assert ctx.cache_scope.pinned_count == 2
        assert _n_persisted(spark) == base + 2
        ctx.close()
        assert _n_persisted(spark) == base
    finally:
        STAGE_TYPES.pop("_TestPinStage", None)
