"""Streaming==batch equality proof for the stateful sessionizer: the
interval-merge `applyInPandasWithState` twin must reproduce the
oracle-green `window_session` batch query's per-user session summary
exactly — under multi-batch disorder, a session-BRIDGING late event,
and a checkpoint restart."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources.readers import read_table
from concurrent_etl_go_spark.streaming import sessionize_stateful
from tests.conftest import SF_SMOKE

_SCHEMA = "user_id bigint, ts timestamp"


def _batch_summary(ev):
    """Per-user (n_sessions, n_events, first_start_us, last_end_us)
    from the exact window_session gaps-and-islands expressions."""
    from concurrent_etl_go_spark.operators import lib
    from concurrent_etl_go_spark.operators.time_windows import (
        SESSION_GAP_SECONDS,
    )

    sess = lib.sessionize(
        ev.select("user_id", "ts"),
        key_col="user_id",
        ts_col="ts",
        gap_seconds=SESSION_GAP_SECONDS,
    )
    return {
        int(r.user_id): (
            int(r.n_sessions),
            int(r.n_events),
            int(r.first_start),
            int(r.last_end),
        )
        for r in sess.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("MIN(unix_micros(ts))").alias("first_start"),
            F.expr("MAX(unix_micros(ts))").alias("last_end"),
        )
        .collect()
    }


def _final_state(result_df) -> dict[int, tuple[int, int, int, int]]:
    pdf = result_df.toPandas()
    if not len(pdf):
        return {}
    last = pdf.sort_values("n_updates").groupby("user_id").tail(1)
    return {
        int(r.user_id): (
            int(r.n_sessions),
            int(r.n_events),
            int(r.first_start),
            int(r.last_end),
        )
        for r in last.itertuples()
    }


def _run_stream(spark, schema, path, name):
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    q = (
        sessionize_stateful(sdf)
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


def test_sessions_stateful_matches_batch_multibatch(spark, tmp_path):
    """Full sf0.001 events split into 3 interleaved files (event_id
    mod 3 — each user's events arrive out of order across
    micro-batches): the final state equals the batch sessionization
    user for user."""
    ev = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id"
    )
    d = str(tmp_path / "sessstream")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).select(
            "user_id", "ts"
        ).coalesce(1).write.mode("append").parquet(d)
    got = _final_state(
        _run_stream(
            spark, ev.select("user_id", "ts").schema, d, "t_sess_mb"
        )
    )
    want = _batch_summary(ev)
    assert got == want
    assert got and any(v[0] > 1 for v in got.values()), (
        "non-degenerate: some user must have >1 session"
    )


def _frame(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [dt.datetime(2026, 1, 1, 0, 0, 0) + r[1] for r in rows],
        }
    )


def test_sessions_stateful_late_event_bridges_two_sessions(
    spark, tmp_path
):
    """The merge case no watermark operator can express: a user has
    events at t=0 and t=60min (two sessions under the 30-min gap), then
    a LATE event at t=30min arrives in a later micro-batch — both
    hops are now exactly the gap (the batch rule splits only when
    STRICTLY exceeded), chaining 0 -> 30 -> 60 into ONE session."""
    d = str(tmp_path / "bridge")
    m = dt.timedelta(minutes=1)
    spark.createDataFrame(
        _frame([(1, 0 * m), (1, 60 * m)]), _SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(_frame([(1, 30 * m)]), _SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(d)
    got = _final_state(
        _run_stream(
            spark,
            spark.createDataFrame(_frame([]), _SCHEMA).schema,
            d,
            "t_sess_bridge",
        )
    )
    # one session, three events: 0->30 and 30->60 are both exactly the
    # 30-min gap (kept: the batch rule splits only when STRICTLY over)
    assert got[1][0] == 1 and got[1][1] == 3
    # and the batch relation agrees
    ev = spark.read.parquet(d)
    assert got == _batch_summary(ev)


def test_sessions_stateful_restart_recovers_interval_state(
    spark, tmp_path
):
    """Kill the query between files, restart from the checkpoint with a
    foreachBatch collector: the interval list survives, so the late
    bridge still merges after the restart."""
    d = str(tmp_path / "restart")
    ck = str(tmp_path / "ck")
    m = dt.timedelta(minutes=1)
    collected: list[pd.DataFrame] = []

    def sink(batch_df, _bid):
        collected.append(batch_df.toPandas())

    def start():
        sdf = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        return (
            sessionize_stateful(sdf)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ck)
            .foreachBatch(sink)
            .start()
        )

    spark.createDataFrame(
        _frame([(7, 0 * m), (7, 60 * m)]), _SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark.createDataFrame(_frame([(7, 30 * m)]), _SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(d)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pdf = pd.concat(collected, ignore_index=True)
    last = pdf.sort_values("n_updates").groupby("user_id").tail(1)
    row = last[last.user_id == 7].iloc[0]
    assert (int(row.n_sessions), int(row.n_events)) == (1, 3)


# --- property: interval-merge == batch gaps-and-islands, any order -----------


def _batch_rule(ts_sorted):
    """Reference gaps-and-islands: list of (start, end, count)."""
    from concurrent_etl_go_spark.streaming.stateful import SESSION_GAP_US

    out = []
    for t in ts_sorted:
        if out and t <= out[-1][1] + SESSION_GAP_US:
            out[-1][1] = max(out[-1][1], t)
            out[-1][2] += 1
        else:
            out.append([t, t, 1])
    return [tuple(x) for x in out]


def test_interval_merge_property_matches_batch_any_order():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from concurrent_etl_go_spark.streaming.stateful import (
        SESSION_GAP_US,
        _merge_intervals,
    )

    # timestamps clustered around multiples of the gap so splits, joins
    # and exact-boundary ties all occur
    ts_strategy = st.lists(
        st.integers(min_value=0, max_value=8 * SESSION_GAP_US),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=300, deadline=None)
    @given(ts=ts_strategy, split=st.integers(min_value=0, max_value=40))
    def check(ts, split):
        want = _batch_rule(sorted(ts))
        # fold in two arbitrary chunks, as two micro-batches would
        split = min(split, len(ts))
        state = _merge_intervals([(t, t, 1) for t in ts[:split]])
        state = _merge_intervals(state + [(t, t, 1) for t in ts[split:]])
        assert state == want

    check()


def test_sessions_stateful_midstream_kill_no_loss_no_dup(
    spark, tmp_path
):
    """Hard kill MID-BACKLOG (not a clean drain): with 6 files pending
    and maxFilesPerTrigger=1, stop the query as soon as the first
    batches land, restart from the checkpoint, and drain.  Proves the
    restart contract end to end:

    - NO LOSS: the final per-user state equals the batch
      sessionization of the full corpus, user for user;
    - NO DOUBLE-EMIT (idempotent-upsert sense): a batch interrupted
      before its commit may REPLAY through foreachBatch, but the file
      source pins a batch's files in the offset WAL before execution
      and state comes from the last committed batch, so a replayed
      (user_id, n_updates) row must be BIT-IDENTICAL to the original
      emission — the exactly-once property an upsert sink needs.
    """
    import time as _time

    ev = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id"
    )
    d = str(tmp_path / "killstream")
    ck = str(tmp_path / "killck")
    for i in range(6):
        ev.where(F.col("event_id") % 6 == i).select(
            "user_id", "ts"
        ).coalesce(1).write.mode("append").parquet(d)

    collected: list[pd.DataFrame] = []

    def sink(batch_df, _bid):
        collected.append(batch_df.toPandas())

    def start():
        sdf = (
            spark.readStream.schema(
                ev.select("user_id", "ts").schema
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        return (
            sessionize_stateful(sdf)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ck)
            .foreachBatch(sink)
            .start()
        )

    # phase 1: kill as soon as the first emissions land, well before
    # the 6-file backlog drains
    q = start()
    deadline = _time.time() + 120
    while not collected and _time.time() < deadline:
        _time.sleep(0.05)
    try:
        q.stop()
    except Exception:
        pass
    n_before = len(collected)
    assert 0 < n_before < 6, (
        f"kill must land mid-backlog (got {n_before} of 6 batches)"
    )

    # phase 2: restart from the checkpoint and drain the backlog
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    pdf = pd.concat(collected, ignore_index=True)

    # NO LOSS: final state == batch sessionization of the full corpus
    last = pdf.sort_values("n_updates").groupby("user_id").tail(1)
    got = {
        int(r.user_id): (
            int(r.n_sessions),
            int(r.n_events),
            int(r.first_start),
            int(r.last_end),
        )
        for r in last.itertuples()
    }
    assert got == _batch_summary(ev)

    # NO DOUBLE-EMIT: any replayed (user_id, n_updates) key carries an
    # identical row (deterministic replay -> idempotent upsert)
    dups = pdf.groupby(["user_id", "n_updates"]).nunique()
    assert (dups.max(axis=None) <= 1), (
        "replayed emission differs from the original:\n"
        f"{dups[(dups > 1).any(axis=1)]}"
    )
