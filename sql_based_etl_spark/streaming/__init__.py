from sql_based_etl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    windowed_counts,
)
