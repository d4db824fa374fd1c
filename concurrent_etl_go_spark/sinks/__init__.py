from concurrent_etl_go_spark.sinks.http_sink import HttpSinkConfig, run_http_sink
from concurrent_etl_go_spark.sinks.dlq import (
    clear_dlq,
    dlq_files,
    read_dlq,
    replay_dlq_posts,
    replay_union,
)

__all__ = [
    "HttpSinkConfig",
    "run_http_sink",
    "clear_dlq",
    "dlq_files",
    "read_dlq",
    "replay_dlq_posts",
    "replay_union",
]
