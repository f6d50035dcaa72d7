from dynamic_etl_spark.streaming.incremental import (  # noqa: F401
    dedup_within_watermark,
    file_stream,
    run_available_now,
    windowed_aggregate,
)
from dynamic_etl_spark.streaming.stateful import running_user_stats  # noqa: F401
