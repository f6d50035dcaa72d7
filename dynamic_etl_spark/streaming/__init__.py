from dynamic_etl_spark.streaming.incremental import (  # noqa: F401
    dedup_within_watermark,
    file_stream,
    interval_stream_join,
    run_available_now,
    windowed_aggregate,
)
from dynamic_etl_spark.streaming.sink import (  # noqa: F401
    run_streaming_curation,
    run_streaming_dedup,
    run_streaming_merge,
    run_streaming_rollup,
    run_streaming_semantic_dedup,
    run_streaming_summary,
)
from dynamic_etl_spark.streaming.stateful import running_user_stats  # noqa: F401
