from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
# sf0.01 is the driver's CORRECTNESS contract scale — the local gate must run
# at the same SF or driver-only failures (e.g. data-dependent edge rows) hide.
SF_ORACLE = os.environ.get("SQL_ETL_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from sql_based_etl_spark.session import get_spark

    spark = get_spark(app_name="sql_based_etl_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        path = os.path.join(SF_ORACLE, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()
