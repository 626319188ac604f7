"""Native PySpark wordcount job — reconstruction of the ``wordcount.py``
the SparkApplication CRD runs but the snapshot does not contain
(native-spark-job-scheduler.yaml:12 ``mainApplicationFile:
file:///wordcount.py``, :13 output path as argv[1]; SURVEY.md §0 lists
it as an artifact to re-create).

Usage: spark-submit wordcount.py <output_uri> [input_uri]

Input defaults to this script itself (the classic self-counting demo);
on the reference cluster argv[1] is ``s3a://$(BUCKET)/app_code/output/
native``. The count is the canonical declarative shape — explode on
whitespace, hash aggregate with map-side combine — not an RDD
``reduceByKey`` (same result, but the DataFrame plan gets AQE and
whole-stage codegen for free).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: wordcount.py <output_uri> [input_uri]")
    out_uri = sys.argv[1]
    in_uri = sys.argv[2] if len(sys.argv) > 2 else __file__

    spark = SparkSession.builder.appName("word-count").getOrCreate()
    lines = spark.read.text(in_uri)
    counts = (
        lines.select(F.explode(F.split(F.col("value"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    counts.write.mode("overwrite").parquet(out_uri)
    spark.stop()


if __name__ == "__main__":
    main()
