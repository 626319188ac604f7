"""Table-profiling query: per-column stats over ``orders`` in one pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_based_etl_spark.operators.profiling import profile
from sql_based_etl_spark.queries._util import load

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load(spark, sf_dir, "orders"), columns=_COLS)


QUERIES = {"profile_orders": profile_orders}


def _col_block(c: str) -> str:
    return f"""
        SELECT '{c}' AS "column", count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM orders
    """


ORACLES = {
    "profile_orders": " UNION ALL ".join(_col_block(c) for c in _COLS),
}
