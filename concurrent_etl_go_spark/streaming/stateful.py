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
