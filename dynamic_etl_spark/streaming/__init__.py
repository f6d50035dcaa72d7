from dynamic_etl_spark.streaming.incremental import (  # noqa: F401
    file_stream,
    run_available_now,
    windowed_aggregate,
)
