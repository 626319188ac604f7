"""Capture .explain("formatted") for bench headline queries into
plans/<round>/<query>_<tag>.txt (judge-checkable before/after artifacts).

Usage: python tools/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(_REPO, "plans", os.environ.get("SQL_ETL_PLANS_ROUND", "r14"))
    os.makedirs(outdir, exist_ok=True)

    from sql_based_etl_spark.queries import all_queries
    from sql_based_etl_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    registry = all_queries()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]

    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
