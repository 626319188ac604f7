from sql_based_etl_spark.engine.pipeline import Pipeline  # noqa: F401
