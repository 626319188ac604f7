"""Mergeable sketch operators. First resident: KMV (k-minimum-values)
distinct-count estimation.

Why KMV and not HyperLogLog here: Spark's ``approx_count_distinct``
(HLL++) is engine-internal — its estimate can't be reproduced by
another engine, so it can't be oracle-checked, and its sketch bytes
aren't portable. KMV over the portable md5-derived hash is exactly
reproducible anywhere (the k smallest distinct hash values are a pure
function of the data), mergeable by construction (union two k-min sets,
re-take the k smallest), and its estimator (k-1)·H/h_k has relative
error ~1/√(k-2).

Scale posture, honestly: building a sketch from scratch shuffles the
distinct 60-bit hashes (8-byte rows — the cheapest possible distinct,
but still O(distinct values)). The 100 TB value is *maintenance*:
per-partition/per-day sketches are tiny (k longs) and merge without
rescanning anything, which is how rolling cardinality dashboards stay
cheap. ``kmv_merge`` is that operation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_based_etl_spark.operators.dedup import portable_hash

KMV_K = 256
HASH_SPACE = float(16 ** 15)  # portable_hash(hex_chars=15) range


def kmv_sketch(df: DataFrame, col: str | Column, k: int = KMV_K) -> DataFrame:
    """The k smallest distinct hashes of ``col`` as rows ``(h)``.

    distinct() collapses duplicate values (8-byte shuffle rows), then
    the global k-minimum is a sort-limit — Spark executes that as
    per-partition takeOrdered(k) + driver merge, never a full sort."""
    c = F.col(col) if isinstance(col, str) else col
    h = portable_hash(c.cast("string"), hex_chars=15)
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """One-row estimate from a sketch: exact count when fewer than k
    distinct values exist (the sketch IS the value set), else
    (k-1)·H/h_k."""
    agg = sketch.agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("h_k")
    )
    return agg.select(
        "n_kept", "h_k", F.round(est, 3).alias("distinct_est")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union two sketches into the sketch of the unioned data: distinct
    of the combined hash sets, k smallest kept. Associative and
    commutative — fold any number of per-shard sketches."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)
