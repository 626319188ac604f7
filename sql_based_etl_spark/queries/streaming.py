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
