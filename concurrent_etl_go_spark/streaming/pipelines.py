"""Structured Streaming parity layer (SURVEY §2.B Streaming; PR 4).

The reference's channels are streams-in-spirit with processing-time
semantics (etl/main.go:177-182); the engine upgrades them to event-time
Structured Streaming:

- file source with ``maxFilesPerTrigger`` rate limiting ≈ the bounded
  channel capacity (S12),
- watermarks bound state for late data (the reference has no event-time
  notion at all — timestamps are stamped at extract time, etl/main.go:202),
- the batch and streaming window operators share the same expressions
  (``F.window`` / ``F.session_window``), so the DuckDB-oracle checks on the
  batch forms (operators/time_windows.py) validate streaming semantics too,
- ``foreachBatch`` drives the PR-3 HTTP sink with DLQ spill, giving the
  streaming pipeline the same at-least-once + replay story as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from concurrent_etl_go_spark.sinks.http_sink import HttpSinkConfig, run_http_sink

def _events_schema(sf_dir: str) -> tuple[T.StructType, bool]:
    """Streaming read schema for the events parquet + whether ``ts`` is
    stored as TIMESTAMP(NANOS) (read as raw nanos longs) or as a plain
    tz-naive timestamp (read as TIMESTAMP_NTZ). Streaming sources need
    the schema up front, so the footer probe the batch reader does per
    read happens here once.  The probe globs exactly as the stream source
    does (``pathGlobFilter`` below) so a multi-file events table can't
    silently diverge from the single footer read."""
    import glob

    import pyarrow.parquet as pq

    matches = sorted(glob.glob(f"{sf_dir}/events.parquet"))
    if not matches:
        raise FileNotFoundError(f"no events.parquet under {sf_dir}")
    ts_is_nanos = any(
        any(
            f.name == "ts" and str(f.type) == "timestamp[ns]"
            for f in pq.read_schema(m)
        )
        for m in matches
    )
    ts_type = T.LongType() if ts_is_nanos else T.TimestampNTZType()
    return (
        T.StructType(
            [
                T.StructField("event_id", T.LongType(), True),
                T.StructField("ts", ts_type, True),
                T.StructField("user_id", T.LongType(), True),
                T.StructField("event_type", T.StringType(), True),
                T.StructField("value", T.DoubleType(), True),
                T.StructField("props", T.StringType(), True),
            ]
        ),
        ts_is_nanos,
    )


def events_file_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet.

    ``maxFilesPerTrigger`` is the engine's rate limit (S12's bounded
    channels). ``ts`` is normalized to TIMESTAMP (ltz, UTC session)
    exactly as the batch reader does — from raw nanos longs when the file
    is TIMESTAMP(NANOS), from TIMESTAMP_NTZ when it is tz-naive micros —
    so streaming twins aggregate the identical event times as batch.
    """
    schema, ts_is_nanos = _events_schema(sf_dir)
    if ts_is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the file-stream source needs a directory; pathGlobFilter narrows the
    # listing to the events file(s) within the sf dir
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_nanos:
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka source (key/value/topic/partition/offset/timestamp wire shape).

    The Kafka connector jar does not ship in this image, so this probes for
    it and fails loudly with the exact package needed — same pattern as the
    lakehouse connectors. Pipelines should be written against the wire
    shape and tested with ``kafka_wire_stream`` (below), which emits the
    identical schema from the built-in rate source.
    """
    from concurrent_etl_go_spark.sources.lakehouse import MissingConnectorError

    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:
        raise MissingConnectorError(
            "kafka support requires the connector jar on the Spark classpath "
            "(spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version>); not present in this environment"
        ) from exc
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )


def kafka_wire_stream(
    spark: SparkSession,
    topic: str = "events",
    rows_per_second: int = 100,
    n_partitions: int = 4,
    rows_per_batch: int | None = None,
) -> DataFrame:
    """Kafka-WIRE-shaped stream from the built-in rate source: the exact
    (key, value, topic, partition, offset, timestamp) schema the Kafka
    source emits, with a JSON event payload in ``value``.

    This is the test double for ``kafka_stream`` AND the proof that the
    engine's streaming operators are source-agnostic: anything written
    against the wire shape runs unchanged on real Kafka. The rate source's
    ``rowsPerSecond`` plays the reference's bounded-channel capacity
    (etl/main.go:177-182) — backpressure by admission rate. Pass
    ``rows_per_batch`` to use the deterministic ``rate-micro-batch``
    source instead (exact batch sizes, for tests).
    """
    if rows_per_batch is not None:
        rate = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .option("startTimestamp", 0)
            .load()
        )
    else:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
    payload = F.to_json(
        F.struct(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).alias("user_id"),
        )
    )
    return rate.select(
        F.col("value").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("value"), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp").alias("timestamp"),
    )


_WIRE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
    ]
)


def parse_kafka_events(wire: DataFrame) -> DataFrame:
    """Decode a kafka-wire frame's JSON ``value`` payload into typed event
    columns — the standard first stage of a Kafka pipeline. Works on
    ``kafka_stream`` and ``kafka_wire_stream`` alike."""
    return wire.select(
        F.from_json(F.col("value").cast("string"), _WIRE_EVENT_SCHEMA).alias("e"),
        "partition",
        "offset",
    ).select("e.event_id", "e.ts", "e.user_id", "partition", "offset")


def tumbling_agg(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked 1-hour tumbling counts — streaming twin of the
    oracle-checked ``window_tumbling`` batch query."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def ohlc_agg(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly OHLC bars — streaming twin of the oracle-checked
    ``agg_resample_ohlc`` batch query.

    Open/close use ``min_by``/``max_by`` over the (ts, event_id) ordering
    struct: the same total order the batch twin expresses with
    row_number, but as a DECLARATIVE aggregate the streaming state store
    can maintain incrementally (a row_number window is not available in a
    streaming agg). State per (bar, type) is one struct per edge — O(1),
    bounded by the watermark."""
    order_key = F.struct("ts", "event_id")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.round(F.min_by("value", order_key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", order_key), 4).alias("close"),
            F.round(F.sum("value"), 4).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("bar"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
    )


def sliding_agg(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked 1-hour/30-min sliding counts (twin of ``window_sliding``)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "total_value",
        )
    )


def session_agg(stream: DataFrame, gap: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """Native streaming session windows (inactivity gap): state is bounded
    by the watermark; the batch twin (``window_session``) uses
    gaps-and-islands and is oracle-checked."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def stream_to_http(
    stream: DataFrame, config: HttpSinkConfig, checkpoint_dir: str
) -> StreamingQuery:
    """Drive the chunked HTTP sink from a stream via ``foreachBatch``:
    every micro-batch gets the same chunk->POST->DLQ-spill semantics as the
    batch pipeline (at-least-once; checkpointing makes replays bounded)."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch_df, _epoch: run_http_sink(batch_df, config))
        .start()
    )


def stream_to_http_idempotent(
    stream: DataFrame,
    config: HttpSinkConfig,
    checkpoint_dir: str,
    ledger_dir: str,
) -> StreamingQuery:
    """Effectively-once streaming HTTP delivery under kill/restart with
    injected sink failures — the HTTP twin of ``stream_to_versioned``'s
    exactly-once contract.

    Three mechanisms compose:

    1. **Epoch ledger** (``ledger_dir``): a marker file per completed
       epoch, written AFTER the epoch's sink pass finishes (every chunk
       either POSTed or spilled).  A restarted query that replays the
       last uncommitted epoch re-runs it; one whose epoch already
       carries a marker skips all its work.
    2. **Deterministic idempotency keys** on every direct POST
       (``e{epoch}/p{partition}/c{chunk}`` — the file source pins a
       batch's files in the offset WAL, so a replayed epoch regenerates
       the same chunks): a replay that re-POSTs chunks the crashed
       attempt already delivered is dropped by a key-deduplicating
       receiver.
    3. **Keyed DLQ replay** (``sinks.dlq.replay_dlq_posts``): chunks
       that exhausted retries spill with unique filenames; replay
       re-POSTs each under its filename-key and deletes only after the
       ack, so the spill path is idempotent too.

    No batch is lost (every chunk is POSTed or spilled, and spills
    survive restarts on disk) and none double-delivers at a
    key-deduplicating receiver — proven under hard mid-backlog kill in
    ``tests/test_streaming_http_dlq.py``."""
    import os

    os.makedirs(ledger_dir, exist_ok=True)

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"epoch-{epoch_id}.done")
        if os.path.exists(marker):
            return  # replayed fully-committed epoch: all chunks durable
        from dataclasses import replace

        cfg = replace(config, idempotency_scope=f"e{epoch_id}")
        run_http_sink(batch_df, cfg)
        with open(marker, "w") as fh:
            fh.write("")

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(commit)
        .start()
    )


def ab_units_agg(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming half of the A/B experiment readout: per
    (day, user, arm) conversion units, maintained incrementally — the
    streaming twin of ``operators/experiments.py::agg_ab_test``'s unit
    derivation (the scalar z/SRM fold over these O(arms)-per-day-user
    rows is a batch-side serving step, like the IVF index's query
    path).

    The arm is the same portable md5 bucket as the batch query (a
    user's arm never flips mid-stream); the day key is a 1-DAY TUMBLING
    WINDOW on the watermarked event time — epoch-aligned, so under the
    UTC-pinned session ``window.start`` equals the batch twin's
    ``date_trunc('day', ts)`` exactly, and the watermark bounds state
    at O(active users x in-flight days) with eviction once a day
    closes.  ``MAX(purchase flag)`` is the combiner-friendly any-hit
    aggregate the state store maintains in O(1) per unit."""
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 day"),
            F.col("user_id"),
            arm.alias("arm"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .select(
            F.col("window.start").alias("day"),
            "user_id",
            "arm",
            "conv",
        )
    )


def stream_dedup(stream: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so dedup state cannot grow without bound (the
    batch twin is ``dedup_exact``)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_enrich(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (broadcast) static dimension — the streaming analog of the reference's
    per-row enrichment fetch (etl/main.go:188-207), but set-based: no
    per-row RPC, the dimension ships once per executor. The static side is
    re-read per batch, so slowly-changing dimensions pick up updates
    between batches at scale."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_bound: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: a right-side event
    matches a left-side event with the same ``key`` when it lands within
    ``[left.ts, left.ts + time_bound]`` — the attribution-join shape
    (view -> click within the window).

    Both sides carry watermarks AND the join has a time-range constraint,
    which is exactly what lets Structured Streaming expire buffered rows:
    state per side is bounded by watermark + bound, not by stream length —
    the requirement for an unbounded 100 TB/day correlation job. Columns
    are exposed under ``l``/``r`` aliases for disambiguation.

    ``how="left_outer"`` additionally emits unmatched left rows (null
    right columns) once the watermark passes their join window — the
    "views that never converted" shape; supported outer modes follow
    Structured Streaming's rules (the time bound makes them evictable).
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how!r}")
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    return lw.join(
        rw,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {time_bound}")),
        how,
    )


def stream_to_versioned(
    stream: DataFrame, root: str, checkpoint_dir: str
) -> StreamingQuery:
    """EXACTLY-ONCE streaming append into a versioned parquet table
    (``sources/versioned.py``) — the jar-free equivalent of a Delta
    streaming sink.

    foreachBatch alone is at-least-once: after a crash between sink
    write and checkpoint commit, the restarted query REPLAYS the last
    epoch. Idempotence comes from recording the epoch id in the table
    manifest at commit time: a replayed epoch is detected
    (``committed_batch_ids``) and skipped before any data is written,
    so the table converges to exactly-once contents under any
    crash/restart schedule the checkpoint allows. Commit races with
    concurrent writers retry against the fresh snapshot
    (``append_prepared``) — data files are written once per epoch,
    never per attempt.
    """
    from concurrent_etl_go_spark.sources import versioned as vt

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in vt.committed_batch_ids(root):
            return  # replayed epoch: already durable, skip
        files = vt._write_data_files(batch_df, root)  # noqa: SLF001
        vt.append_prepared(
            root, files, batch_id=epoch_id, dtypes=batch_df.dtypes
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(commit)
        .start()
    )
