"""Drive the driver contract: grade the first-50 registry queries vs DuckDB.

Usage: python tools/graded_sweep.py [sf_dir] [only,names]
Prints one line per query (OK / FAIL + problems) and a summary.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from parity import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as E

    smoke = E.entry(spark).collect()
    assert len(smoke) > 0, "entry() smoke returned 0 rows"
    print(f"entry() smoke: {len(smoke)} rows")

    qs, osql = E.queries(), E.oracle_sql()
    graded = list(qs)[:50]
    if ONLY:
        graded = [g for g in graded if g in ONLY]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    n_ok = n_fail = 0
    for name in graded:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            problems = compare(df, con, osql[name])
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        dt_s = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt_s:.1f}s): {problems[:3]}")
        else:
            n_ok += 1
            print(f"OK   {name} ({dt_s:.1f}s)")
    print(f"\nSUMMARY: {n_ok} ok / {n_fail} fail of {len(graded)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
