"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where expressible) a
DuckDB oracle SQL string over the same parquet tables.

Modules contribute ``QUERIES`` / ``ORACLES`` dicts; ``all_queries()`` /
``all_oracles()`` merge them. ``__spark_entry__.py`` at the repo root
re-exports these for the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from sql_based_etl_spark.queries import (
        dedup,
        multimodal,
        relational,
        scd2,
        similarity,
        streaming,
        textops,
    )

    merged: dict[str, QueryFn] = {}
    for mod in (relational, scd2, dedup, similarity, textops, multimodal, streaming):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from sql_based_etl_spark.queries import (
        dedup,
        multimodal,
        relational,
        scd2,
        similarity,
        streaming,
        textops,
    )

    merged: dict[str, str] = {}
    for mod in (relational, scd2, dedup, similarity, textops, multimodal, streaming):
        merged.update(mod.ORACLES)
    return merged
