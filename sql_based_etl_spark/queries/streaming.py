"""Structured Streaming queries (driver-runnable: each callable drives
the bounded stream synchronously and returns the materialized result).

``stream_window_counts`` runs the REAL streaming engine (stateful
windowed aggregation over a file stream) and is oracle-checked against
the equivalent batch SQL — on a bounded input with complete output
mode they must agree exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_based_etl_spark.streaming.events import (
    deduped_counts,
    read_events_stream,
    run_bounded,
    sliding_counts,
    windowed_counts,
)


def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = windowed_counts(events, window="5 minutes", watermark="10 minutes")
    out, _ = run_bounded(agg, mode="complete")
    return out.select(
        F.col("window.start").cast("long").alias("bucket_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest: the same file stream read twice and unioned
    (simulating at-least-once duplicate delivery), deduped on event_id
    inside the watermark, then counted — must equal single-copy batch
    counts."""
    path = os.path.join(sf_dir, "events.parquet")
    a = read_events_stream(spark, path)
    b = read_events_stream(spark, path)
    out, _ = run_bounded(deduped_counts(a, b), mode="complete")
    return out


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (10 min window / 5 min slide) event counts: every
    event lands in exactly two overlapping buckets."""
    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out, _ = run_bounded(sliding_counts(events), mode="complete")
    return out.select(
        F.col("window.start").cast("long").alias("bucket_epoch"),
        "event_type",
        "n",
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    session/event totals with a 30-minute gap rule. On a bounded input
    the final state equals the batch gaps-and-islands computation, so
    even the custom-state path is oracle-checked."""
    from sql_based_etl_spark.streaming.stateful import sessionize_stateful

    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out, _ = run_bounded(sessionize_stateful(events), mode="update")
    return out


QUERIES = {
    "stream_window_counts": stream_window_counts,
    "stream_dedup": stream_dedup_counts,
    "stream_sliding_counts": stream_sliding_counts,
    "stream_sessionize": stream_sessionize,
}

ORACLES = {
    "stream_window_counts": """
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_epoch,
               event_type, count(*) AS n,
               sum(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "stream_dedup": """
        SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
    # each event belongs to the two 10-minute windows whose starts are
    # its 5-minute floor and that floor minus 300s
    "stream_sliding_counts": """
        WITH starts AS (
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - s.off AS bucket_epoch
            FROM events, (SELECT unnest([0, 300]) AS off) s
        )
        SELECT bucket_epoch, event_type, count(*) AS n
        FROM starts GROUP BY 1, 2
    """,
    "stream_sessionize": """
        WITH flagged AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, count(*) AS n_events,
               CAST(sum(is_new) AS BIGINT) AS n_sessions
        FROM flagged GROUP BY user_id
    """,
}


def stream_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (events stream ⋈ customer dim,
    broadcast, stateless) feeding a stateful count — the canonical
    enrich-then-aggregate streaming DAG."""
    from sql_based_etl_spark.queries._util import load
    from sql_based_etl_spark.streaming.events import enriched_counts

    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    dim = load(spark, sf_dir, "customer")
    out, _ = run_bounded(enriched_counts(events, dim), mode="complete")
    return out


QUERIES["stream_enriched_counts"] = stream_enriched_counts

ORACLES["stream_enriched_counts"] = """
    SELECT c_mktsegment AS segment, event_type, count(*) AS n
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
"""


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (attribution): purchases
    joined to same-user clicks within the preceding 30 minutes (two
    filtered branches of the stream, each with its own watermark —
    the self-join form; separate topics would only change the
    sources)."""
    from sql_based_etl_spark.streaming.events import click_purchase_join

    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out, _ = run_bounded(click_purchase_join(events), mode="append")
    return out


QUERIES["stream_click_purchase_join"] = stream_click_purchase_join

ORACLES["stream_click_purchase_join"] = """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


# work dirs for the file-stream queries must outlive lazy reads;
# reclaimed at process exit (same contract as queries/scd2.py)
import atexit as _atexit
import shutil as _shutil
import tempfile as _tempfile

_WORK_DIRS: list[str] = []


@_atexit.register
def _cleanup_work_dirs() -> None:
    while _WORK_DIRS:
        _shutil.rmtree(_WORK_DIRS.pop(), ignore_errors=True)


def stream_near_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH near-dedup end-to-end
    (streaming/neardedup.py): the documents table arrives as four
    id-ordered micro-batches over a file stream; each batch is paired
    against the versioned-table index built from the earlier batches,
    flagged, and ingested. Because arrival order follows doc_id, the
    cumulative flag set equals the batch answer: a doc is a duplicate
    iff it is the LATER (doc_b) member of any full-corpus LSH pair —
    which is exactly what the oracle computes."""
    import glob
    import shutil

    from sql_based_etl_spark.queries._util import load
    from sql_based_etl_spark.streaming.neardedup import stream_near_dedup
    from sql_based_etl_spark.tables.versioned import VersionedTable

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    work = _tempfile.mkdtemp(prefix="stream_neardedup_")
    _WORK_DIRS.append(work)
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    n_batches = 4
    step = (max_id + n_batches) // n_batches
    base_mtime = 1_700_000_000
    for i in range(n_batches):
        lo, hi = i * step, (i + 1) * step
        stage = os.path.join(work, f"stage{i}")
        (docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.parquet(stage))
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"batch_{i}.parquet")
        shutil.move(part, dst)
        # file streams discover oldest-modified first: pin strictly
        # increasing mtimes so batch order is deterministic
        os.utime(dst, (base_mtime + 60 * i, base_mtime + 60 * i))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    index_dir = os.path.join(work, "index")
    q = stream_near_dedup(stream, index_dir)
    q.processAllAvailable()
    q.stop()
    return (
        VersionedTable(spark, os.path.join(index_dir, "flags"))
        .read()
        .select("doc_id", "is_dup")
    )


QUERIES["stream_near_dedup"] = stream_near_dedup_flags

# A document is flagged iff it is the later (doc_b) member of any
# full-corpus LSH pair — the streaming keep-first policy under
# id-ordered arrival. Reuses the batch minhash pair oracle verbatim.
from sql_based_etl_spark.queries.dedup import ORACLES as _DEDUP_ORACLES

ORACLES["stream_near_dedup"] = f"""
    WITH pairs AS ({_DEDUP_ORACLES["dedup_minhash_lsh"]})
    SELECT doc_id, doc_id IN (SELECT doc_b FROM pairs) AS is_dup
    FROM documents
"""


def stream_window_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly count-min sketches of per-user event volume maintained by
    the streaming engine (streaming/events.py:windowed_cms); on a
    bounded input the final counters equal the batch CMS per window, so
    the sketch-in-stream path is oracle-checked counter-for-counter."""
    from sql_based_etl_spark.streaming.events import windowed_cms

    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out, _ = run_bounded(windowed_cms(events), mode="complete")
    return out.select(
        F.col("window.start").cast("long").alias("bucket_epoch"),
        "d", "bucket", "cnt",
    )


QUERIES["stream_window_cms"] = stream_window_cms

_CMS_H_U = ("CAST(concat('0x', substr(md5(concat(CAST(user_id AS VARCHAR), '|cms', "
            "CAST(d AS VARCHAR))), 1, 15)) AS BIGINT) % 2048")

ORACLES["stream_window_cms"] = f"""
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_epoch,
           d, {_CMS_H_U} AS bucket, count(*) AS cnt
    FROM events, (SELECT unnest([0, 1, 2, 3]) AS d) ds
    GROUP BY 1, 2, 3
"""


def stream_window_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly value histograms maintained by the streaming engine
    (streaming/events.py:windowed_histogram); on bounded input the
    final counters equal the batch histogram per window, so the
    sketch-in-stream path is oracle-checked counter-for-counter.
    Closed windows fold via histogram_merge / read via
    histogram_quantiles without rescanning the stream."""
    from sql_based_etl_spark.streaming.events import windowed_histogram

    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    out, _ = run_bounded(windowed_histogram(events), mode="complete")
    return out.select(
        F.col("window.start").cast("long").alias("bucket_epoch"), "bin", "cnt"
    )


QUERIES["stream_window_histogram"] = stream_window_histogram

ORACLES["stream_window_histogram"] = """
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_epoch,
           least(greatest(CAST(floor((CAST(value AS DOUBLE) - 0.0) / 500.0 * 100.0)
                               AS BIGINT), 0), 99) AS bin,
           count(*) AS cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
"""


def stream_materialized_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized view
    (streaming/events.py:stream_materialized_aggregate): micro-batches
    append to a base versioned table and incrementally refresh a
    per-event-type aggregate from its change feed. On bounded input the
    final aggregate snapshot equals the batch groupBy — which is what
    the oracle asserts."""
    from sql_based_etl_spark.streaming.events import stream_materialized_aggregate
    from sql_based_etl_spark.tables.versioned import VersionedTable

    events = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    work = _tempfile.mkdtemp(prefix="stream_matagg_")
    _WORK_DIRS.append(work)
    base, agg = os.path.join(work, "base"), os.path.join(work, "agg")
    q = stream_materialized_aggregate(
        events, base, agg, group_cols=["event_type"], sum_cols=["value"],
        num_partitions=2,
    )
    q.processAllAvailable()
    q.stop()
    return VersionedTable(spark, agg).read().select(
        "event_type", "sum_value_micros", "n"
    )


QUERIES["stream_materialized_agg"] = stream_materialized_agg

ORACLES["stream_materialized_agg"] = """
    SELECT event_type,
           CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_value_micros,
           count(*) AS n
    FROM events GROUP BY event_type
"""


def stream_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Change-Data-Feed over a bridge Delta table (round-11
    ``readChangeFeed=true`` on the ``delta_bridge`` source,
    streaming/delta_source.py): create a CDF+DV-enabled table from an
    ``orders`` sample (v0 = even-hundred keys), append the rest (v1),
    MERGE-update the even-custkey matched rows (v2, real cdc
    update_preimage/postimage), then DV-DELETE ``custkey % 10 = 3``
    (v3, cdc delete rows; the data files stay byte-untouched) — and
    consume the WHOLE change stream through Spark's streaming engine.
    Aggregated per change type (plus the number of distinct commits
    each type appeared in, so per-commit multiplicity is still
    checked without depending on absolute version numbers), it must
    equal DuckDB replaying the commit algebra from ``orders``."""
    import tempfile as _tf

    from sql_based_etl_spark.queries._util import load
    from sql_based_etl_spark.streaming.delta_source import (
        register_delta_bridge_source,
    )
    from sql_based_etl_spark.tables.delta_interop import (
        delete_delta,
        merge_delta,
        write_delta,
    )

    base = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_custkey")
    )
    work = _tf.mkdtemp(prefix="stream_delta_cdf_")
    _WORK_DIRS.append(work)
    d = os.path.join(work, "t")
    write_delta(base.filter(F.col("o_orderkey") % 100 == 0), d,
                mode="overwrite",
                properties={"delta.enableChangeDataFeed": "true",
                            "delta.enableDeletionVectors": "true"})
    write_delta(base.filter(F.col("o_orderkey") % 100 != 0), d)
    merge_delta(
        base.filter(F.col("o_orderkey") % 100 == 0), d,
        condition="target.o_orderkey = source.o_orderkey",
        when_matched_update={"o_custkey": "source.o_custkey + 1000000"},
        matched_condition="source.o_custkey % 2 = 0",
        insert_not_matched=False,
    )
    delete_delta(spark, d, "o_custkey % 10 = 3")

    register_delta_bridge_source(spark)
    changes = (spark.readStream.format("delta_bridge")
               .option("path", d)
               .option("readChangeFeed", "true").load())
    # streaming aggregations forbid distinct counts — the stream keeps
    # (change type, commit version) granularity; the materialized
    # bounded result is then folded batch-side
    out, _name = run_bounded(
        changes.groupBy("_change_type", "_commit_version").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_custkey").alias("s"),
        ),
        mode="complete",
    )
    return (
        out.groupBy("_change_type").agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum("s").cast("bigint").alias("sum_custkey"),
            F.countDistinct("_commit_version").cast("bigint")
            .alias("n_commits"),
        )
        .orderBy("_change_type")
    )


QUERIES["stream_delta_cdf"] = stream_delta_cdf

# the commit algebra replayed from `orders`: v0 inserts the
# even-hundred keys, v1 the rest of the %50 sample; the merge updates
# even-custkey matched rows (+1e6 — custkey%10 is preserved); the DV
# delete removes custkey%10=3 from the CURRENT table. HAVING guards
# keep empty change types absent on both sides at tiny scales.
ORACLES["stream_delta_cdf"] = """
    WITH base AS (
        SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 50 = 0
    ),
    ev  AS (SELECT * FROM base WHERE o_orderkey % 100 = 0),
    od  AS (SELECT * FROM base WHERE o_orderkey % 100 <> 0),
    upd AS (SELECT * FROM ev WHERE o_custkey % 2 = 0),
    cur AS (
        SELECT o_orderkey,
               o_custkey + CASE WHEN o_custkey % 2 = 0
                                THEN 1000000 ELSE 0 END AS o_custkey
        FROM ev
        UNION ALL SELECT o_orderkey, o_custkey FROM od
    ),
    del AS (SELECT * FROM cur WHERE o_custkey % 10 = 3)
    SELECT 'delete' AS _change_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(o_custkey) AS BIGINT) AS sum_custkey,
           CAST(1 AS BIGINT) AS n_commits
    FROM del HAVING count(*) > 0
    UNION ALL
    SELECT 'insert', CAST(count(*) AS BIGINT),
           CAST(sum(o_custkey) AS BIGINT),
           CAST((SELECT count(*) > 0 FROM ev) AS BIGINT)
           + CAST((SELECT count(*) > 0 FROM od) AS BIGINT)
    FROM base HAVING count(*) > 0
    UNION ALL
    SELECT 'update_preimage', CAST(count(*) AS BIGINT),
           CAST(sum(o_custkey) AS BIGINT), CAST(1 AS BIGINT)
    FROM upd HAVING count(*) > 0
    UNION ALL
    SELECT 'update_postimage', CAST(count(*) AS BIGINT),
           CAST(sum(o_custkey + 1000000) AS BIGINT), CAST(1 AS BIGINT)
    FROM upd HAVING count(*) > 0
    ORDER BY _change_type
"""
