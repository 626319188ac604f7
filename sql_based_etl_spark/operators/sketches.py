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


def kmv_sketch_grouped(
    df: DataFrame, group_col: str, col: str | Column, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV sketches as rows ``(g, h)`` — the k smallest
    distinct hashes of ``col`` within each ``group_col`` value.

    One shuffle on the group key: distinct (g, h) pairs (8-byte hash
    rows), then a rank window keeps the k minimum per group. Per-source
    / per-day sketches are the unit of the rolling-cardinality pattern:
    k longs per group, mergeable by re-taking the k smallest
    (``kmv_merge`` works unchanged on any one group's rows)."""
    from pyspark.sql import Window

    c = F.col(col) if isinstance(col, str) else col
    h = portable_hash(c.cast("string"), hex_chars=15)
    pairs = df.select(F.col(group_col).alias("g"), h.alias("h")).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return (
        pairs.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Estimate the overlap of the two sets behind two KMV sketches
    without touching the underlying data (Beyer et al., SIGMOD 2007):
    one row ``(n_kept, matches, union_est, jaccard_est, intersect_est)``.

    Method: the merged sketch's k minimum hashes are a uniform sample
    of the UNION; the fraction of them present in BOTH input sketches
    estimates Jaccard, and intersection = jaccard × union-estimate.
    All inputs are ≤ k rows, so the joins below are broadcast-trivial —
    this is the "compare yesterday's corpus to today's without
    rescanning either" operation, costing k longs per side."""
    m = kmv_merge(a, b, k)
    flagged = (
        m.join(a.select("h", F.lit(1).alias("__in_a")).distinct(), "h", "left")
        .join(b.select("h", F.lit(1).alias("__in_b")).distinct(), "h", "left")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
        F.sum(
            F.coalesce(F.col("__in_a"), F.lit(0)) * F.coalesce(F.col("__in_b"), F.lit(0))
        ).alias("matches"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("h_k"))
    return agg.select(
        "n_kept",
        "matches",
        F.round(union_est, 3).alias("union_est"),
        F.round(F.col("matches") / F.col("n_kept"), 6).alias("jaccard_est"),
        F.round(F.col("matches") / F.col("n_kept") * F.round(union_est, 3), 3).alias(
            "intersect_est"
        ),
    )


# --- mergeable fixed-bin histogram / quantile sketch ----------------------


def histogram_sketch(
    df: DataFrame, col: str | Column, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Equi-width histogram of ``col`` over [lo, hi) as counter rows
    ``(bin, cnt)`` — the mergeable quantile/distribution complement to
    KMV (cardinality) and CMS (frequency).

    One map-side-combinable int groupBy: values never shuffle, only
    ≤ nbins counter rows exist, and per-shard/per-day histograms merge
    by counter addition (``histogram_merge``). Out-of-range values
    clamp into the edge bins (a histogram must account for every row
    or its quantiles silently shift); NULLs are dropped. The bin rule
    ``floor((x - lo) / (hi - lo) * nbins)`` is plain IEEE-754 double
    arithmetic, reproducible in any engine."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    return (
        df.filter(c.isNotNull())
        .select(hist_bin(c, lo, hi, nbins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_bin(c: Column, lo: float, hi: float, nbins: int) -> Column:
    """The clamp-to-edge equi-width bin rule, exposed for streaming
    variants that need the projection without the batch groupBy."""
    b = F.floor((c.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(nbins)))
    return F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1)).cast("long")


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two histograms of the same (lo, hi, nbins): counter-wise
    sum. Associative/commutative — fold per-shard histograms freely."""
    return a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame, qs: list[float], lo: float, hi: float, nbins: int
) -> DataFrame:
    """Quantile estimates from a histogram: ``(q, value_est)`` per
    requested quantile, linearly interpolated inside the holding bin
    (error ≤ one bin width — sized by the caller, unlike
    approx_percentile whose internal sketch no other engine can
    replay).

    The histogram is ≤ nbins rows, so the cumulative-count window and
    the per-quantile min_by below are metadata-sized work regardless of
    how much data was sketched."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    width = (hi - lo) / float(nbins)
    target = F.col("q") * F.col("total").cast("double")
    # value at the target rank inside the holding bin: bin start +
    # (rank distance into the bin / bin count) × bin width
    est = F.lit(lo) + (
        F.col("bin").cast("double")
        + (target - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    ) * F.lit(width)
    joined = qdf.join(F.broadcast(cum)).filter(
        F.col("cum").cast("double") >= target
    )
    return (
        joined.select("q", "bin", F.round(est, 6).alias("v"))
        .groupBy("q")
        .agg(F.min_by("v", "bin").alias("value_est"))
    )


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


def kmv_estimate_grouped(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-group estimates from a grouped sketch (``kmv_sketch_grouped``
    rows): ``(g, n_kept, h_k, distinct_est)`` — exact below k, the
    (k-1)·H/h_k estimator otherwise. One tiny aggregate over ≤ k rows
    per group."""
    agg = sketch.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("h_k")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("h_k")
    )
    return agg.select("g", "n_kept", "h_k", F.round(est, 3).alias("distinct_est"))
