"""Streaming==batch equality proof for the stateful funnel-latency
operator (VERDICT r9 item 1): the `applyInPandasWithState` twin must
reproduce the oracle-green `agg_funnel_latency` batch query exactly —
per-user delays AND the banded histogram — under multi-batch disorder,
adversarial late views, and a checkpoint restart."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources.readers import read_table
from concurrent_etl_go_spark.streaming import funnel_latency_stateful
from tests.conftest import SF_SMOKE


def _batch_delays(ev):
    """The agg_funnel_latency per-user delay relation, computed with the
    exact batch expressions (operators/relational12.py)."""
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return fv.join(fp, "user_id").select(
        "user_id",
        F.expr(
            "(unix_micros(p_ts) - unix_micros(v_ts)) div 60000000"
        ).alias("delay_min"),
    )


def _final_per_user(result_df) -> dict[int, int]:
    """Latest update per user from an update-mode memory sink, keeping
    only users whose funnel completed (non-null delay)."""
    pdf = result_df.toPandas()
    if not len(pdf):
        return {}
    last = pdf.sort_values("n_updates").groupby("user_id").tail(1)
    done = last[last["delay_min"].notna()]
    return {int(r.user_id): int(r.delay_min) for r in done.itertuples()}


def _run_stream(spark, schema, path, name):
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    q = (
        funnel_latency_stateful(sdf)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_funnel_stateful_matches_batch_multibatch(spark, tmp_path):
    """Full sf0.001 events split into 3 interleaved files (event_id mod
    3 — views and purchases arrive out of order across micro-batches):
    the final streaming state must equal the batch relation user for
    user, and fold to the oracle-green histogram band for band."""
    ev = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    d = str(tmp_path / "evstream")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    got = _final_per_user(
        _run_stream(spark, ev.drop("event_id").schema, d, "t_funnel_mb")
    )
    want = {
        int(r.user_id): int(r.delay_min)
        for r in _batch_delays(ev).collect()
    }
    assert got == want
    assert got  # non-degenerate: sf0.001 has converting users

    # fold the streaming delays through the SAME band expressions and
    # compare against the oracle-green batch query's histogram
    from concurrent_etl_go_spark.operators.relational12 import (
        _LAT_CASE,
        _LAT_ORDER,
        agg_funnel_latency,
    )

    delays = spark.createDataFrame(
        pd.DataFrame(
            {"user_id": list(got), "delay_min": list(got.values())}
        )
    )
    bands = {
        (r.band, r.band_order): r.n
        for r in delays.groupBy(
            F.expr(_LAT_CASE).alias("band"),
            F.expr(_LAT_ORDER).cast("long").alias("band_order"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    batch_bands = {
        (r.band, r.band_order): r.n_users
        for r in agg_funnel_latency(spark, SF_SMOKE).collect()
    }
    assert bands == batch_bands


def test_funnel_stateful_late_view_reclassifies_parked_purchase(
    spark, tmp_path
):
    """The adversarial ordering that breaks a naive 2-field state: a
    purchase arrives, is parked against a LATER first view, then an
    EARLIER view lands in a later micro-batch and the parked purchase
    must re-qualify."""
    def frame(rows):
        return spark.createDataFrame(
            [
                (uid, et, f"2024-01-01 00:{mm:02d}:00")
                for uid, et, mm in rows
            ],
            "user_id long, event_type string, ts_s string",
        ).select(
            "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts")
        )

    d = str(tmp_path / "late")
    ckpt = str(tmp_path / "ckpt_late")
    batch1 = frame(
        [
            (1, "purchase", 5),
            (1, "view", 10),  # purchase 5 parks: not after view 10
            (2, "view", 10),
            (2, "purchase", 20),  # plain in-order conversion
            (3, "purchase", 5),  # never sees a view
        ]
    )
    batch2 = frame([(1, "view", 1)])  # late EARLIER view: 5 now qualifies

    batch1.coalesce(1).write.mode("append").parquet(d)
    sdf = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "10")
        .parquet(d)
    )
    q = (
        funnel_latency_stateful(sdf)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_funnel_late")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        mid = _final_per_user(spark.sql("SELECT * FROM t_funnel_late"))
        assert mid == {2: 10}  # user 1 parked, user 3 incomplete
        batch2.coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()
    got = _final_per_user(spark.sql("SELECT * FROM t_funnel_late"))
    assert got == {1: 4, 2: 10}  # purchase@5 - view@1 = 4 minutes
    # equality with the batch semantics on the union of both batches
    want = {
        int(r.user_id): int(r.delay_min)
        for r in _batch_delays(batch1.unionByName(batch2)).collect()
    }
    assert got == want


def test_funnel_stateful_restart_recovers_parked_state(spark, tmp_path):
    """Kill the query between the park and the late view; the restarted
    query must re-qualify the purchase from RECOVERED state — the
    checkpoint carries the pre_ts list, not just the scalars."""
    def frame(rows):
        return spark.createDataFrame(
            [
                (uid, et, f"2024-01-01 00:{mm:02d}:00")
                for uid, et, mm in rows
            ],
            "user_id long, event_type string, ts_s string",
        ).select(
            "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts")
        )

    d = str(tmp_path / "restart")
    ckpt = str(tmp_path / "ckpt_restart")
    frame([(1, "purchase", 5), (1, "view", 10)]).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    updates: list[tuple] = []

    def start():
        # memory sink cannot recover from a checkpoint; foreachBatch is
        # the production recovery path (same as stream_to_versioned)
        sdf = (
            spark.readStream.schema(
                "user_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", "10")
            .parquet(d)
        )
        return (
            funnel_latency_stateful(sdf)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda bdf, _eid: updates.extend(
                    (r.user_id, r.delay_min, r.n_updates)
                    for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
        assert all(delay is None for _, delay, _ in updates)
    finally:
        q.stop()

    frame([(1, "view", 1)]).coalesce(1).write.mode("append").parquet(d)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        uid: delay
        for uid, delay, _ in sorted(updates, key=lambda t: t[2])
    }
    assert final == {1: 4}
