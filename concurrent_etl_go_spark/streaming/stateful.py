"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only cross-batch state is the DLQ spill/replay (SURVEY
§2.A.1); the engine adds the general mechanism: arbitrary per-key state
maintained across micro-batches. ``running_totals`` is the canonical
instance — a per-key running (count, sum) that survives batches; state
lives in the state store (RocksDB-backed when state exceeds memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, batch_rows bigint, running_n bigint, running_total double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_rows": [batch_rows],
            "running_n": [n],
            "running_total": [round(total, 4)],
        }
    )


def running_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum of value) across micro-batches."""
    return stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming funnel latency (stateful twin of agg_funnel_latency) ----------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, v_ts bigint, p_ts bigint, delay_min bigint, "
    "n_updates bigint"
)
FUNNEL_STATE_SCHEMA = (
    "v_ts bigint, p_qual bigint, pre_ts array<bigint>, n_updates bigint"
)


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user funnel state fold — EXACT under arbitrary cross-batch
    disorder.

    Batch semantics being twinned (operators/relational12.py::
    agg_funnel_latency): v_ts = MIN ts of the user's 'view' events,
    p_qual = MIN ts of their 'purchase' events STRICTLY AFTER v_ts.

    The naive two-field state (min view, min qualifying purchase) is
    NOT exact when a view arrives late: a purchase rejected against the
    then-current v_ts may qualify against the final, earlier one.  So
    purchases at or before the current v_ts (or seen before any view)
    are PARKED in ``pre_ts`` and re-qualified whenever v_ts decreases.
    State is bounded by the user's purchases-before-first-view count —
    in funnel data a handful; the watermark-less exactness trade every
    as-of engine makes explicitly.
    """
    (user_id,) = key
    if state.exists:
        v_ts, p_qual, pre_ts, n_updates = state.get
        pre_ts = list(pre_ts) if pre_ts is not None else []
    else:
        v_ts, p_qual, pre_ts, n_updates = None, None, [], 0
    for pdf in pdfs:
        micros = pdf["ts"].astype("int64") // 1000
        is_view = pdf["event_type"] == "view"
        if is_view.any():
            batch_v = int(micros[is_view].min())
            if v_ts is None or batch_v < v_ts:
                v_ts = batch_v
                # re-qualify parked purchases against the new, earlier v
                still_parked = []
                for p in pre_ts:
                    if p > v_ts:
                        p_qual = p if p_qual is None else min(p_qual, p)
                    else:
                        still_parked.append(p)
                pre_ts = still_parked
        for p in micros[pdf["event_type"] == "purchase"]:
            p = int(p)
            if v_ts is not None and p > v_ts:
                p_qual = p if p_qual is None else min(p_qual, p)
            else:
                pre_ts.append(p)
    n_updates += 1
    state.update((v_ts, p_qual, pre_ts, n_updates))
    delay = (
        (p_qual - v_ts) // 60_000_000
        if v_ts is not None and p_qual is not None
        else None
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "v_ts": pd.array([v_ts], dtype="Int64"),
            "p_ts": pd.array([p_qual], dtype="Int64"),
            "delay_min": pd.array([delay], dtype="Int64"),
            "n_updates": [n_updates],
        }
    )


def funnel_latency_stateful(stream: DataFrame) -> DataFrame:
    """Streaming twin of the oracle-green ``agg_funnel_latency`` batch
    query: per-user first-view -> first-qualifying-purchase delay in
    integer minutes, maintained incrementally across micro-batches with
    exact out-of-order semantics (see ``_update_funnel``).  The banded
    histogram is a stateless 5-row fold over this output — the
    streaming==batch equality pytest proves both grains."""
    return (
        stream.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas twin (Spark 4.x successor API) ---------------
#
# Same running-totals semantics through the newer StatefulProcessor
# interface: typed named state (getValueState) instead of one opaque
# tuple, lifecycle hooks, timers, and TTL support. Requires the RocksDB
# state store provider (enable_rocksdb_state) AND google.protobuf (the
# API's state-server wire protocol) — protobuf is not shipped in this
# image, so the runtime path is probe-gated in tests exactly like the
# kafka connector; applyInPandasWithState above remains the executable
# twin here.
#
# EXPERIMENTAL: this wrapper has never executed in an image that ships
# protobuf (the gated test skips here), so the ValueState.get()/
# getValueState usage is API-documented but unexercised.  Treat it as
# unverified until the probe-gated test has run green once in a CI image
# with protobuf installed; the applyInPandasWithState twin above is the
# verified production path.

try:  # import guard: keeps module import working on older Sparks
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-key running (count, sum) with explicit named value state."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prior = self._state.get()
            n, total = prior if prior is not None else (0, 0.0)
            batch_rows = 0
            for pdf in rows:
                batch_rows += len(pdf)
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "batch_rows": [batch_rows],
                    "running_n": [n],
                    "running_total": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    def running_totals_tws(stream: DataFrame) -> DataFrame:
        """``running_totals`` through ``transformWithStateInPandas``.

        EXPERIMENTAL until executed once: the wrapper's pytest is
        probe-gated on google.protobuf (absent in this image), so this
        exact path has never run here — the applyInPandasWithState twin
        (``running_totals``) is the tested equivalent. Run
        ``tests/test_streaming.py -k transform_with_state`` in any image
        that ships protobuf before relying on it."""
        return (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover — Spark < 4 lacks the API
    RunningTotalsProcessor = None  # type: ignore[assignment]
    running_totals_tws = None  # type: ignore[assignment]
