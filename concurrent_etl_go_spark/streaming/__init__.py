from concurrent_etl_go_spark.streaming.pipelines import (
    events_file_stream,
    kafka_stream,
    kafka_wire_stream,
    parse_kafka_events,
    session_agg,
    ohlc_agg,
    sliding_agg,
    stream_dedup,
    stream_enrich,
    stream_stream_join,
    stream_to_http,
    tumbling_agg,
)
from concurrent_etl_go_spark.streaming.stateful import (
    funnel_latency_stateful,
    running_totals,
    sessionize_stateful,
)

__all__ = [
    "events_file_stream",
    "funnel_latency_stateful",
    "kafka_stream",
    "kafka_wire_stream",
    "parse_kafka_events",
    "running_totals",
    "session_agg",
    "sessionize_stateful",
    "ohlc_agg",
    "sliding_agg",
    "stream_dedup",
    "stream_enrich",
    "stream_stream_join",
    "stream_to_http",
    "tumbling_agg",
]
