"""Every queries() entry with an oracle must match DuckDB exactly —
this is a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from sql_based_etl_spark.queries import all_oracles, all_queries
from tests.conftest import SF_ORACLE
from tests.parity import compare

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = _QUERIES[name]
    df = fn(spark, SF_ORACLE)
    assert df is not None
    if name not in _ORACLES:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    problems = compare(df, duck, _ORACLES[name])
    assert not problems, f"{name}: " + " | ".join(problems)


def test_all_oracle_keys_have_queries():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"
