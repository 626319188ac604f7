"""sql_based_etl_spark — a PySpark-native declarative ETL/analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference repo melodyyangaws/sql-based-etl (the Arc declarative ETL
framework surface: Extract / Transform / Load / Execute stages wired
through named temp views), re-expressed Spark-first:

- DataFrame / Spark SQL logical plans; Catalyst + AQE pick physical plans.
- A parquet+manifest versioned table (``tables.versioned``) provides the
  Delta-Lake-shaped semantics the reference relies on (overwrite load,
  MERGE upsert, time travel) without external jars.
- Extension operators for large-scale training-data pipelines: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  similarity search, text analysis, multimodal column plumbing.

Reference parity citations use ``<file>:<line>`` into /root/reference.
"""

__version__ = "0.1.0"

from sql_based_etl_spark.session import get_spark  # noqa: F401
