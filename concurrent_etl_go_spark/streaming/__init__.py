from concurrent_etl_go_spark.streaming.pipelines import (
    events_file_stream,
    session_agg,
    sliding_agg,
    stream_dedup,
    stream_to_http,
    tumbling_agg,
)

__all__ = [
    "events_file_stream",
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "stream_to_http",
    "tumbling_agg",
]
