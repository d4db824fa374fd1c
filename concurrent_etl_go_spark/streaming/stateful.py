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
