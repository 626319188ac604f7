"""Physical-plan regression guards for the scale posture.

These assert the *plan shape* the 100 TB design depends on — filters
pushed into the parquet scan, pruned read schemas, broadcast joins for
dimension tables, partial aggregation, and no Python evaluation or
shuffle in operators designed to pipeline off the scan. A correctness
regression shows up in the oracle tests; a silent plan regression
(e.g. a lambda sneaking an operator out of codegen, a filter that
stops pushing down) shows up here.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from sql_based_etl_spark.queries import all_queries

    return all_queries()


def test_filter_pushdown_reaches_scan(spark, queries):
    """q06 is scan+filter+agg: its predicates must appear as
    PushedFilters on the parquet scan, and the read schema must be
    pruned to the referenced columns only."""
    plan = plan_of(queries["q06_forecast_revenue"](spark, SF_ORACLE))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:300]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema  # unreferenced → pruned


def test_dimension_joins_broadcast(spark, queries):
    """q03/q05 join facts to small dims — the plan must use broadcast
    joins (no shuffle of the fact table for dimension lookups)."""
    for name in ("q03_shipping_priority", "q05_region_revenue"):
        plan = plan_of(queries[name](spark, SF_ORACLE))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"


def test_aggregates_are_partial(spark, queries):
    """q01 must use two-phase hash aggregation (map-side combine before
    the shuffle)."""
    plan = plan_of(queries["q01_pricing_summary"](spark, SF_ORACLE))
    assert plan.count("HashAggregate") >= 2


def test_text_ops_stay_jvm_side_and_shuffle_free(spark, queries):
    """text_quality_score is a pure per-row projection: no Python
    evaluation, no shuffle — it must pipeline straight off the scan."""
    plan = plan_of(queries["text_quality_score"](spark, SF_ORACLE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_no_python_eval_outside_multimodal(spark, queries):
    """Only the multimodal decode stub (and stateful streaming) may
    evaluate Python; every dedup/text/similarity plan stays JVM-side."""
    for name in (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "sim_ann_lsh",
        "sim_ann_ivf",
        "text_fingerprint",
        "text_token_count",
    ):
        plan = plan_of(queries[name](spark, SF_ORACLE))
        assert "EvalPython" not in plan, f"{name} fell back to Python evaluation"


def test_no_codegen_fallback_lambdas_in_hot_paths(spark, queries):
    """Higher-order functions (transform/filter/aggregate lambdas) are
    CodegenFallback — they must not appear in CORPUS-SCALE stages
    (scan, shingle explosion, signatures, per-doc projections). The
    bucket-postings pair expansion in minhash/ngram deliberately uses
    transform/slice lambdas: it runs on one row per bucket (arrays
    bounded by max_bucket) AFTER the corpus-sized reduction, and
    measured faster than the lambda-free self-join it replaced — so the
    gate checks the per-document relations, not the pair expansion."""
    for name in ("text_quality_score", "dedup_simhash"):
        plan = plan_of(queries[name](spark, SF_ORACLE))
        assert "lambdafunction" not in plan.lower(), f"{name} reintroduced a lambda"
    from sql_based_etl_spark.operators.dedup import (
        hashed_shingle_rows,
        minhash_signatures_from_hashes,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    sigs = minhash_signatures_from_hashes(hashed_shingle_rows(docs))
    assert "lambdafunction" not in plan_of(sigs).lower(), (
        "the per-document signature pipeline reintroduced a lambda"
    )


def test_typing_transform_plan_has_no_lambda(spark):
    """TypingTransform sits in every CSV-ingest path — its _errors
    column must be built lambda-free (array_compact, not F.filter) so
    ingest stays inside whole-stage codegen."""
    from sql_based_etl_spark.engine.stages.transform import apply_typing

    raw = spark.createDataFrame(
        [("1", "alice", "2024-01-01 00:00:00"), ("x", None, "nope")],
        ["id", "name", "ts"],
    )
    meta = [
        {"name": "id", "type": "integer", "nullable": False},
        {"name": "name", "type": "string"},
        {"name": "ts", "type": "timestamp"},
    ]
    typed = apply_typing(raw, meta)
    plan = plan_of(typed)
    assert "lambdafunction" not in plan.lower()
    assert "EvalPython" not in plan


def test_new_text_ops_plan_shapes(spark, queries):
    """pii_scrub and frame sampling are pure projections (zero
    shuffles, no Python, no lambdas); the composite quality filter
    pays exactly ONE shuffle (the fingerprint window) for the whole
    language+quality+dedup chain."""
    for name in ("text_pii_scrub", "mm_frame_sample"):
        plan = plan_of(queries[name](spark, SF_ORACLE))
        assert "Exchange" not in plan, f"{name} gained a shuffle"
        assert "EvalPython" not in plan and "lambdafunction" not in plan.lower()

    plan = plan_of(queries["docs_quality_filter"](spark, SF_ORACLE))
    assert plan.count("Exchange") == 1, "quality filter should shuffle once (fingerprint window)"
    assert "EvalPython" not in plan and "lambdafunction" not in plan.lower()


def test_ngram_guard_is_free_size_filter(spark, queries):
    """The postings rewrite made the df cutoff a ``size(ids) <= N``
    filter on the already-grouped postings — no anti-join (and no extra
    shuffle of the index) may reappear, and the shingle relation must
    shuffle onto the shingle key exactly once (the postings groupBy;
    the old self-join shape paid it for both join sides)."""
    plan = plan_of(queries["dedup_ngram_jaccard"](spark, SF_ORACLE))
    assert "LeftAnti" not in plan
    assert "size(ids" in plan
    # the postings relation is cached (its one shuffle onto the shingle
    # key is paid once, not once per consumer — the plan text repeats
    # the subtree under InMemoryRelation per branch, so count the cache
    # marker, not Exchange occurrences)
    assert "InMemoryRelation" in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path_factory):
    """Two tables bucketed on the join key into the same bucket count
    must sort-merge join with ZERO exchanges — the write-once shuffle
    amortization bucketing exists for."""
    from sql_based_etl_spark.engine.pipeline import Pipeline

    Pipeline(spark).run([
        {"type": "ParquetExtract", "inputURI": f"{SF_ORACLE}/customer.parquet",
         "outputView": "bk_cust_src"},
        {"type": "ParquetExtract", "inputURI": f"{SF_ORACLE}/orders.parquet",
         "outputView": "bk_ord_src"},
        {"type": "BucketedTableLoad", "inputView": "bk_cust_src",
         "table": "bk_customer", "bucketBy": "c_custkey", "numBuckets": 4,
         "sortBy": "c_custkey"},
        {"type": "BucketedTableLoad", "inputView": "bk_ord_src",
         "table": "bk_orders", "bucketBy": "o_custkey", "numBuckets": 4,
         "sortBy": "o_custkey"},
    ])
    joined = spark.sql("""
        SELECT /*+ MERGE(c) */ c.c_custkey, count(*) AS n
        FROM bk_customer c JOIN bk_orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    """)
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join should not shuffle"


def test_salted_join_plan_shape(spark, queries):
    """The salted join must actually join on (key, salt) — otherwise
    the salt costs a column without spreading the hot key — and the
    replicated dim side must not force a broadcast of the fact side."""
    plan = plan_of(queries["q_salted_join"](spark, SF_ORACLE))
    assert "__salt" in plan
    assert plan.count("HashAggregate") >= 2  # revenue agg still partial


def test_centroids_partial_agg_no_python(spark, queries):
    """The centroid aggregate must combine map-side and stay JVM-only:
    64×|labels| groups after a posexplode must not shuffle raw rows."""
    plan = plan_of(queries["sim_label_centroids"](spark, SF_ORACLE))
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q13_left_join_preserves_broadcast(spark, queries):
    """customer⋈orders with the priority predicate on the build side:
    the filtered orders side must still reach the join without a
    cartesian or nested-loop fallback."""
    plan = plan_of(queries["q13_order_count_distribution"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_new_pipeline_ops_stay_jvm_side(spark, queries):
    """repetition/sampling/sketch queries are built from hashed-shingle
    and salted-hash machinery — they must stay lambda-free, JVM-side,
    and (for the per-row split assignment) shuffle-free."""
    for name in ("text_repetition_stats", "split_hash_assign",
                 "sample_stratified", "sketch_kmv_event_ids"):
        plan = plan_of(queries[name](spark, SF_ORACLE))
        assert "EvalPython" not in plan, f"{name} fell back to Python"
        assert "lambdafunction" not in plan.lower(), f"{name} grew a lambda"
    assert "Exchange" not in plan_of(queries["split_hash_assign"](spark, SF_ORACLE))


def test_chunking_is_lambda_free_and_jvm_side(spark, queries):
    """chunk_documents must pipeline off the scan: no Python eval, no
    higher-order lambdas (posexplode(sequence) + computed-start slice)."""
    from sql_based_etl_spark.operators.textops import chunk_documents

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = plan_of(chunk_documents(docs))
    assert "EvalPython" not in plan
    assert "lambdafunction" not in plan.lower()
    assert "Exchange" not in plan  # per-row: no shuffle before packing


def test_bloom_decontaminate_probe_shape(spark, queries):
    """The Bloom pre-filter must never DATA-join: no shuffle join, no
    per-gram hash join against an index. The ONE allowed join is the
    single-row BroadcastNestedLoopJoin that delivers the 16 KiB bitmap
    as a broadcast attribute — deliberately NOT an inline array literal,
    which overflowed Janino and dropped the probe stage to interpreted
    evaluation (4× slower). Stays JVM-side."""
    plan = plan_of(queries["text_bloom_decontaminate"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" not in plan, "bloom membership must not key-join"
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the bitmap row
    assert "EvalPython" not in plan
    # the probe predicate compiles: a codegen fallback here silently
    # costs ~4x (the literal-array lesson) — no fallback markers allowed
    assert "CodegenFallback" not in plan


def test_mixture_sample_is_shuffle_free(spark, queries):
    """Epoch-weighted mixture sampling is a pure projection+generator:
    no Exchange, no Python, no join."""
    plan = plan_of(queries["sample_mixture"](spark, SF_ORACLE))
    assert "Exchange" not in plan
    assert "Join" not in plan and "EvalPython" not in plan


def test_semantic_dedup_broadcasts_pivots(spark, queries):
    """SemDeDup's cell assignment must broadcast the pivot vectors
    (k×dim doubles) — never shuffle the corpus against them."""
    plan = plan_of(queries["sim_semantic_dedup"](spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_round3_ops_plan_shapes(spark, queries):
    """Round-3 additions keep their scale shape: cap_per_group prunes
    the scan to its two columns and shuffles once on the group key;
    canonical_survivors broadcasts the tiny cluster-assignment side;
    the CMS sketch is a two-phase (map-side-combinable) aggregate with
    no Python anywhere."""
    # other modules cache the documents relation; a cache hit would
    # legitimately serve the full schema and mask the pruning assert
    spark.catalog.clearCache()
    cap = plan_of(queries["sample_cap_per_source"](spark, SF_ORACLE))
    assert "BatchEvalPython" not in cap and "ArrowEvalPython" not in cap
    read_schema = cap.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "source" in read_schema
    assert "text" not in read_schema  # column pruning reached the scan

    canon = plan_of(queries["dedup_canonical"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in canon  # assignment side broadcasts

    cms = plan_of(queries["sketch_cms_word_freq"](spark, SF_ORACLE))
    assert cms.count("HashAggregate") >= 2  # partial counters map-side
    assert "BatchEvalPython" not in cms and "ArrowEvalPython" not in cms


def test_curation_ops_plan_shapes(spark, queries):
    """The curation diagnostics keep their scale shape: the histogram
    is a two-phase int aggregate (values never shuffle) with no Python;
    key_skew broadcasts its 2-column totals; label_outliers broadcasts
    the tiny centroid side; the leakage-safe split's corpus leg joins
    against the small assignment table without Python."""
    spark.catalog.clearCache()
    hist = plan_of(queries["sketch_hist_event_quantiles"](spark, SF_ORACLE))
    assert hist.count("HashAggregate") >= 2  # partial bin counters map-side
    assert "BatchEvalPython" not in hist and "ArrowEvalPython" not in hist

    skew = plan_of(queries["profile_key_skew"](spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" in skew or "BroadcastHashJoin" in skew
    assert "BatchEvalPython" not in skew and "ArrowEvalPython" not in skew

    outl = plan_of(queries["sim_label_outliers"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in outl  # centroids broadcast onto the corpus

    split = plan_of(queries["split_leakage_safe"](spark, SF_ORACLE))
    assert "BatchEvalPython" not in split and "ArrowEvalPython" not in split


def test_hive_partitioned_output_prunes_partitions(spark, tmp_path_factory):
    """partitionBy output + a partition predicate → the scan lists only
    matching directories (PartitionFilters non-empty, PartitionCount
    below the total) — the layout lever FileLoad documents."""
    from sql_based_etl_spark.engine.pipeline import Pipeline

    out = str(tmp_path_factory.mktemp("hive_part") / "events_by_type")
    Pipeline(spark).run([
        {"type": "ParquetExtract", "inputURI": f"{SF_ORACLE}/events.parquet",
         "outputView": "ev"},
        {"type": "FileLoad", "inputView": "ev", "outputURI": out,
         "partitionBy": ["event_type"], "numPartitions": 2},
    ])
    df = spark.read.parquet(out).filter("event_type = 'click'")
    plan = plan_of(df)
    seg = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in seg  # predicate became a partition filter
    assert df.count() == spark.table("ev").filter("event_type = 'click'").count()
