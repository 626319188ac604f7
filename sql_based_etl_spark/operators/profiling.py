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
