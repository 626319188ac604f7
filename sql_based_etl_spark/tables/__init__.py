from sql_based_etl_spark.tables.versioned import VersionedTable  # noqa: F401
