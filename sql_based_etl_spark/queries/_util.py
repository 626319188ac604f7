"""Shared helpers for query modules.

Oracle-parity conventions (the driver hashes values order-insensitively
and matches column names, so both engines must emit bit-identical
values under identical names):

- Sums of double measures: scale to integer micro-units per row
  (``round(x * 1e6)`` → BIGINT), sum exactly (order-independent int64
  addition), divide once by 1e6. Raw double sums are not reproducible
  across engines (accumulation order), and double→DECIMAL casts diverge
  at shortest-repr half boundaries (Spark rounds Java's shortest string
  HALF_UP; DuckDB rounds the exact binary expansion).
- Averages: compute on double, round(2+) — value is O(1e-10) stable.
- Timestamps in output: 'yyyy-MM-dd[ HH:mm:ss]' strings (Spark session
  TZ pinned to UTC; DuckDB timestamps are naive UTC).
- Top-k / limit: always order with a unique key tiebreaker.

The integer-micros pattern also holds at 100 TB: int64 micros overflow
at ~9.2e12 currency units per group, far above any realistic group sum,
and partial aggregation stays map-side combinable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MICROS = 1_000_000.0


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Parquet scan → Catalyst gets pushdown and
    column pruning for free; never cache here (operators decide).

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in one
    testdata generation and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
    another; normalize both to a session-TZ TIMESTAMP so downstream
    numeric casts (``unix_micros``, ``cast("long")``) work and match the
    oracle. DuckDB reads either encoding as a naive-UTC µs TIMESTAMP:
    - NANOS: the Spark vectorized reader rejects it; read as int64 nanos
      (``spark.sql.legacy.parquet.nanosAsLong``) and convert losslessly
      (the data is µs-aligned).
    - MICROS without UTC adjustment: Spark infers TIMESTAMP_NTZ, which
      refuses numeric casts; ``to_timestamp`` reinterprets the naive
      value in the session TZ (pinned UTC) — the same instant DuckDB
      sees, zero-cost projection, pushdown unaffected.

    Session TZ is pinned to UTC here (runtime conf) because the caller
    may hand us an arbitrarily-configured session (the driver does) and
    timestamp rendering must match the oracle's naive-UTC values."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.to_timestamp("ts"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def micros(expr: Column) -> Column:
    """Exact int64 micro-units view of a double expression."""
    return F.round(expr * F.lit(MICROS)).cast("long")


def xsum(expr: Column) -> Column:
    """Exact, order-independent distributed sum of a double expression
    (sum int64 micros, one final division)."""
    return F.sum(micros(expr)) / F.lit(MICROS)


def xsum_sql(expr: str) -> str:
    """DuckDB rendering of :func:`xsum` for oracle SQL strings."""
    return f"sum(CAST(round(({expr}) * 1000000.0) AS BIGINT)) / 1000000.0"
