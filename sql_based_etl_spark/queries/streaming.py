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
    read_events_stream,
    run_bounded,
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


QUERIES = {
    "stream_window_counts": stream_window_counts,
}

ORACLES = {
    "stream_window_counts": """
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_epoch,
               event_type, count(*) AS n,
               sum(CAST(round(value * 1000000.0) AS BIGINT)) / 1000000.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
}
