"""Table profiling: per-column statistics in ONE pass over the data —
the data-quality summary an ETL framework runs after every load
(row count, null counts, distinct counts, numeric min/max/mean).

Scale shape: a single groupBy().agg() with every statistic as a
map-side-combinable aggregate — one scan, one reduce, no per-column
jobs. count(DISTINCT) is exact (expensive but exact-oracle-able);
at 100 TB swap in approx_count_distinct per column via the
``approx`` flag and accept sketch variance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def profile(df: DataFrame, columns: list[str] | None = None,
            approx: bool = False) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max rendered as strings so
    heterogeneous column types share one output schema."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__dist_{c}"))
        else:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column — stack() is
    # a constant-folding projection over the 1-row aggregate result
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def key_skew_stats(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnostic for join/agg planning: the ``top_n`` heaviest
    values of ``key`` with their share of all rows and their skew
    factor (count ÷ mean-count-per-key). This is the measurement that
    decides the skew playbook — AQE skew-join handles moderate hotness,
    ``operators/joins.py`` salting targets the keys this report names,
    and a skew factor near 1.0 says do nothing.

    Scale shape: one map-side-combinable groupBy(key).count() (the
    same shuffle a join on the key would pay, which is the point —
    run this BEFORE committing to that join), then a two-row global
    aggregate broadcast back over just ``top_n`` rows. NULL keys are
    counted too: they hash to one partition in a real join, which
    makes them the most common hot key in practice."""
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    # tie-break pins NULLS LAST explicitly on BOTH engines: Spark's
    # bare asc() is NULLS FIRST while DuckDB's `k ASC` defaults NULLS
    # LAST, and the NULL key is precisely the hot key most likely to
    # sit on the top_n boundary
    top = counts.orderBy(
        F.col("cnt").desc(), F.col("key").asc_nulls_last()
    ).limit(top_n)
    # integer-micros ratios via INTEGER division (`div`) — exact, no
    # double-rounding step for another engine to disagree on
    share = F.expr("cnt * 1000000 div __total")
    skew = F.expr("cnt * 1000000 * __nkeys div __total")
    return top.join(F.broadcast(totals)).select(
        F.col("key").cast("string").alias("key"),
        "cnt",
        (share / 1e6).alias("share"),
        (skew / 1e6).alias("skew_factor"),
    )


def profile_drift(old: DataFrame, new: DataFrame,
                  columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Column-level drift between two snapshots of the same table —
    the post-load regression check a pipeline runs against the
    previous version (pair with ``VersionedTable.read(version=-1)``):
    row growth, null-rate delta, distinct-count ratio, and whether the
    value range moved. One profile pass per side (two scans total),
    then a tiny per-column join — nothing row-level ever compares.

    Output per column: ``n_rows_old/new``, ``null_rate_old/new`` +
    ``null_rate_delta`` (micros-exact, cross-engine reproducible),
    ``n_distinct_old/new``, ``range_moved`` (min or max changed).
    Thresholding is the caller's policy — feed this to
    ``ExpectationsValidate`` (e.g. ``expr: abs(null_rate_delta) <
    0.01``) to make drift a fail-loud gate.
    """
    cols = columns or [c for c in new.columns if c in old.columns]
    po = profile(old, cols, approx).select(
        "column",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nulls").alias("n_nulls_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_value").alias("min_old"),
        F.col("max_value").alias("max_old"),
    )
    pn = profile(new, cols, approx).select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("n_nulls_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_value").alias("min_new"),
        F.col("max_value").alias("max_new"),
    )
    j = po.join(pn, "column")
    # integer-micros null rates: exact and identical in any engine
    rate_old = (F.col("n_nulls_old") * 1_000_000 / F.col("n_rows_old")).cast("bigint")
    rate_new = (F.col("n_nulls_new") * 1_000_000 / F.col("n_rows_new")).cast("bigint")
    return j.select(
        "column", "n_rows_old", "n_rows_new",
        (rate_old / 1e6).alias("null_rate_old"),
        (rate_new / 1e6).alias("null_rate_new"),
        ((rate_new - rate_old) / 1e6).alias("null_rate_delta"),
        "n_distinct_old", "n_distinct_new",
        (
            ~F.col("min_old").eqNullSafe(F.col("min_new"))
            | ~F.col("max_old").eqNullSafe(F.col("max_new"))
        ).alias("range_moved"),
    )


def numeric_outlier_stats(
    df: DataFrame, group_col: str, value_col: str, z: float = 3.0
) -> DataFrame:
    """Per-group z-score anomaly report: ``(group, n, mean, std,
    n_outliers)`` where outliers are rows with ``|x - mean| > z·std``
    — the numeric data-quality gate (sensor spikes, unit mix-ups,
    loader bugs) that complements the categorical checks in
    ``ExpectationsValidate``.

    Exactness: sums and sums-of-squares accumulate in integer MILLIS
    (``round(x·1e3)``) so another engine replays them bit-for-bit;
    mean/std are fixed double expressions over those ints, rounded to 6
    decimals BEFORE the outlier comparison so both engines compare
    against identical thresholds. Two scans, both map-side combinable:
    one for the moments, one (with the tiny stats broadcast back) for
    the outlier count. Overflow headroom: |x|·10³ ≤ 10⁶ ⇒ squares
    ≤ 10¹², so int64 holds ~9·10⁶ billion rows per group; shrink the
    scale for wider-ranged values."""
    xq = F.expr(f"cast(round(cast({value_col} as double) * 1000.0) as bigint)")
    moments = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xq).alias("s"),
            F.sum(xq * xq).alias("ss"),
        )
    )
    nd = F.col("n").cast("double")
    mean = F.round(F.col("s").cast("double") / nd / F.lit(1000.0), 6)
    var = (
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / nd)
        / nd
        / F.lit(1_000_000.0)
    )
    stats = moments.select(
        "g", "n", "s", "ss", mean.alias("mean"),
        F.round(F.sqrt(var), 6).alias("std"),
    )
    flagged = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), xq.alias("xq"))
        .join(F.broadcast(stats), "g")
        .filter(
            F.abs(F.col("xq").cast("double") / F.lit(1000.0) - F.col("mean"))
            > F.lit(float(z)) * F.col("std")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        stats.join(flagged, "g", "left")
        .select(
            F.col("g").cast("string").alias("group"),
            "n", "mean", "std",
            F.coalesce(F.col("n_outliers"), F.lit(0)).alias("n_outliers"),
        )
    )
