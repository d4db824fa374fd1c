"""Streaming parity tests: memory-sink window aggregations must equal their
oracle-checked batch twins; foreachBatch drives the HTTP sink end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concurrent_etl_go_spark.streaming import (
    events_file_stream,
    session_agg,
    stream_to_http,
    tumbling_agg,
)
from concurrent_etl_go_spark.sinks import HttpSinkConfig
from tests.conftest import SF_SMOKE
from tests.mock_api import MockApiServer


def run_to_memory(spark, agg_df, name, mode="append"):
    q = (
        agg_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark):
    from concurrent_etl_go_spark.operators.time_windows import window_tumbling

    stream = events_file_stream(spark, SF_SMOKE)
    got = run_to_memory(spark, tumbling_agg(stream), "t_tumbling", mode="complete")
    batch = window_tumbling(spark, SF_SMOKE)
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_streaming_session_bounded_and_consistent(spark):
    stream = events_file_stream(spark, SF_SMOKE)
    got = run_to_memory(spark, session_agg(stream), "t_session", mode="complete")
    rows = got.collect()
    assert rows
    # session_window end = last event + gap: end - start >= gap only when
    # multi-event; every session covers its events
    total_events = sum(r.n_events for r in rows)
    assert total_events == 1000  # sf0.001 events rowcount


def test_stream_foreachbatch_http_sink(spark, tmp_path):
    server = MockApiServer().start()
    try:
        stream = events_file_stream(spark, SF_SMOKE).select(
            F.col("event_id"), F.col("event_type"), F.col("value")
        )
        config = HttpSinkConfig(
            endpoint=server.endpoint,
            auth_token="stream-token",
            batch_size=200,
            dlq_dir=str(tmp_path / "dlq"),
        )
        q = stream_to_http(stream, config, str(tmp_path / "ckpt"))
        q.processAllAvailable()
        q.stop()
        assert server.total_rows_received() == 1000
        assert all(
            r.auth_header == "Bearer stream-token" for r in server.state.requests
        )
    finally:
        server.stop()


def test_stateful_running_totals_matches_batch(spark):
    """applyInPandasWithState: final per-user running totals across all
    micro-batches must equal the batch groupBy."""
    from concurrent_etl_go_spark.streaming.stateful import running_totals
    from concurrent_etl_go_spark.sources.readers import read_table

    stream = events_file_stream(spark, SF_SMOKE)
    got = run_to_memory(spark, running_totals(stream), "t_state", mode="update")
    # last update per user wins
    import pandas as pd

    pdf = got.toPandas()
    final = pdf.groupby("user_id").last()

    batch = (
        read_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tot"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        assert final.loc[uid, "running_n"] == row["n"]
        assert abs(final.loc[uid, "running_total"] - row["tot"]) < 1e-6


def test_stream_sink_failure_spills_to_dlq(spark, tmp_path):
    """Streaming foreachBatch inherits the batch sink's DLQ semantics: a
    down endpoint spills every micro-batch chunk; rows are preserved."""
    from concurrent_etl_go_spark.sinks import dlq_files, read_dlq
    from pyspark.sql import types as T

    stream = events_file_stream(spark, SF_SMOKE).select(
        "event_id", "event_type", "value"
    )
    config = HttpSinkConfig(
        endpoint="http://127.0.0.1:1/load",  # nothing listens here
        batch_size=200,
        dlq_dir=str(tmp_path / "dlq"),
    )
    q = stream_to_http(stream, config, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    spills = dlq_files(config.dlq_dir)
    assert spills
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    assert read_dlq(spark, config.dlq_dir, schema).count() == 1000


def test_stream_dedup_within_watermark(spark):
    from concurrent_etl_go_spark.streaming import stream_dedup

    stream = events_file_stream(spark, SF_SMOKE).select("ts", "event_id", "user_id")
    got = run_to_memory(
        spark, stream_dedup(stream, ["event_id"]), "t_dedup", mode="append"
    )
    # events are unique: dedup preserves all; state bounded by watermark
    assert got.count() == 1000
    assert got.select("event_id").distinct().count() == 1000
