#!/usr/bin/env python
"""Opt-in scale audit: does the dedup chain scale sub-quadratically?

Runs the full near-dup chain — MinHash-LSH pair generation → connected
components → quality-aware canonical survivors — at sf0.01 and sf0.1 on
a deliberately small ``local[4]`` (so parallelism can't hide work
growth) and checks that wall time grows SUB-QUADRATICALLY in the data
size. The sf0.01 DuckDB oracle can prove the answer right but cannot
see an accidental all-pairs blowup: a cartesian that sneaks into the
pair path is ~100× more work at 10× the rows, and this is the harness
that catches it.

Pass criterion: t(sf0.1) / t(sf0.01) < RATIO_MAX (default 30). The
ideal is ~10× (linear in rows); fixed per-job overhead at sf0.01 pulls
the observed ratio well below that; a quadratic operator pushes it
toward 100×. 30 separates the regimes with a wide margin on a noisy
shared host.

Usage:  python tools/scale_check.py        # exits 1 on failure
Committed readings live in PLANS.md (§ scale audit).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

RATIO_MAX = float(os.environ.get("SCALE_CHECK_RATIO_MAX", "30"))


def run_chain(spark, sf_dir: str) -> float:
    """One timed end-to-end dedup chain at ``sf_dir`` (forced with the
    JVM noop sink, like bench.py)."""
    from pyspark.sql import functions as F

    from sql_based_etl_spark.operators.dedup import minhash_lsh_pairs
    from sql_based_etl_spark.operators.graph import canonical_survivors
    from sql_based_etl_spark.queries._util import load

    t0 = time.perf_counter()
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    survivors = canonical_survivors(
        docs.withColumn("__q", F.length("text")), pairs, quality_col="__q"
    ).drop("__q")
    survivors.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from sql_based_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_check", master="local[4]",
                      shuffle_partitions=8)
    run_chain(spark, "/root/testdata/sf0.001")  # warmup: JIT/codegen
    t_small = min(run_chain(spark, "/root/testdata/sf0.01") for _ in range(2))
    t_big = run_chain(spark, "/root/testdata/sf0.1")
    ratio = t_big / t_small
    ok = ratio < RATIO_MAX
    print(json.dumps({
        "metric": "dedup_chain_scale_ratio",
        "t_sf0_01": round(t_small, 2),
        "t_sf0_1": round(t_big, 2),
        "ratio": round(ratio, 1),
        "ratio_max": RATIO_MAX,
        "ok": ok,
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
