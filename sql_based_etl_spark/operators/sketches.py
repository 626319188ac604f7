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


# --- count-min sketch ---------------------------------------------------

CMS_WIDTH = 2048
CMS_DEPTH = 4


def _cms_bucket(c: Column, d: int, width: int) -> Column:
    """Row d's bucket for a value: portable 60-bit hash of the salted
    value, modulo the width — reproducible in any engine with md5."""
    return portable_hash(F.concat(c.cast("string"), F.lit(f"|cms{d}")),
                         hex_chars=15) % width


def cms_sketch(df: DataFrame, col: str | Column,
               width: int = CMS_WIDTH, depth: int = CMS_DEPTH) -> DataFrame:
    """Count-min sketch of ``col`` as counter rows ``(d, bucket, cnt)``
    (Cormode & Muthukrishnan 2005): ``depth`` independent hash rows of
    ``width`` counters; every occurrence increments one counter per
    row. Point estimate = min over rows (never under-counts; over-count
    ≤ 2N/width with prob 1-2^-depth).

    The DataFrame formulation is one map-side-combinable groupBy over
    (d, bucket) int pairs — the input's values never shuffle, only
    ≤ width·depth counter rows ever exist. Like KMV, the 100 TB value
    is maintenance: per-day/per-shard sketches are width·depth longs
    and merge by plain counter addition (``cms_merge``) without
    rescanning history — the frequency complement to KMV's
    cardinality."""
    c = F.col(col) if isinstance(col, str) else col
    rows = [
        df.select(F.lit(d).alias("d"), _cms_bucket(c, d, width).alias("bucket"))
        for d in range(depth)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of the same (width, depth): counter-wise sum.
    Associative/commutative — fold per-shard sketches freely."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str,
                 width: int = CMS_WIDTH, depth: int = CMS_DEPTH) -> DataFrame:
    """Point-estimate the frequency of every row of ``keys[col]``:
    join each key's ``depth`` buckets against the counters (broadcast —
    the sketch is ≤ width·depth rows by construction), take the min.
    Keys whose buckets were never incremented estimate 0 (min over
    missing counters) — CMS never under-counts, so that only happens
    for keys absent from the sketched data."""
    c = F.col(col)
    probes = None
    for d in range(depth):
        p = keys.select(c.alias("key"),
                        F.lit(d).alias("d"),
                        _cms_bucket(c, d, width).alias("bucket"))
        probes = p if probes is None else probes.unionByName(p)
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("freq_est"))
