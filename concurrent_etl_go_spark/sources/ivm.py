"""Incremental materialized-view maintenance over versioned tables.

The end-to-end no-rescan pattern: a rollup (materialized view) over an
append-only versioned fact table refreshes by reading ONLY the data
files the source manifest added since the last refresh (a set
difference of two manifests — no timestamps, no file mtimes, no
guessing), aggregating those into partials, and merging the partials
into the rollup with re-aggregatable combine functions (count/sum —
the ``agg_incremental_merge`` algebra; HLL sketches extend it to
distincts).

Each refresh commits the rollup as a new version whose manifest records
the SOURCE VERSION it reflects (``src_version`` in the refresh state),
so refreshes are idempotent and resumable: a crashed refresh leaves the
previous rollup version intact, and the next refresh recomputes from
the same source delta. At 100 TB this is the difference between a
rollup costing O(day's data) per day and O(history).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import versioned as vt

#: Rollup grain/measures: (event_type, day) -> n_events, total_value.
_KEYS = ("event_type", "day")


def _state_path(rollup_root: str) -> str:
    return os.path.join(rollup_root, "_refresh_state.json")


def refresh_state(rollup_root: str) -> dict:
    """Last refresh bookkeeping: {"src_version": int, "rollup_version":
    int}; empty dict before the first refresh.

    Corrupt state (a crash mid-write under a pre-atomic writer, or disk
    damage) degrades to "missing", which safely forces a full recompute
    on the next refresh instead of wedging every refresh on
    ``JSONDecodeError``."""
    try:
        with open(_state_path(rollup_root)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def _write_state(rollup_root: str, state: dict) -> None:
    """Atomically persist refresh state (temp file + ``os.replace``) so a
    crash mid-write can never leave truncated JSON behind."""
    path = _state_path(rollup_root)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)




def _partials(df: DataFrame) -> DataFrame:
    day = F.date_trunc("day", "ts").alias("day")
    return df.groupBy("event_type", day).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def refresh_rollup(
    spark: SparkSession, src_root: str, rollup_root: str
) -> tuple[int, int]:
    """Incrementally refresh the (event_type, day) rollup of ``src_root``.

    Reads only files added to the source since the last refresh, merges
    their partials into the rollup (outer-merge on the grain keys,
    count/sum combined additively), commits the result as a new rollup
    version, and records the reflected source version. Returns
    (source_version_reflected, n_new_files_read). No-op (returns the
    recorded version and 0) when the source hasn't advanced.
    """
    state = refresh_state(rollup_root)
    prev_version = state.get("src_version")
    try:
        delta_src, snap = vt.incremental_scan(spark, src_root, prev_version)
    except ValueError:
        # A compact/overwrite/merge/restore replaced the source file set:
        # the manifest set-difference no longer means "rows added", so an
        # incremental merge would double-count. Recompute the rollup from
        # the full current snapshot instead (still one commit, still
        # idempotent/resumable via the same state protocol).
        snap = vt.snapshot(src_root)
        full = _partials(
            spark.read.option("mergeSchema", "true").parquet(*snap.files)
        )
        new_rollup = vt.write_table(full, rollup_root, mode="overwrite")
        _write_state(
            rollup_root,
            {"src_version": snap.version, "rollup_version": new_rollup.version},
        )
        return snap.version, len(snap.files)
    if delta_src is None:
        return snap.version, 0
    # telemetry: the delta's own input file list, already resolved by
    # incremental_scan — no second manifest read or set-difference
    n_new_files = len(delta_src.inputFiles())

    delta = _partials(delta_src)
    # Merge against the rollup version RECORDED IN STATE, never "latest":
    # a crash between the rollup commit below and the state write leaves
    # an orphan newer rollup version; merging into latest would count the
    # delta twice on retry, merging into the state-recorded version redoes
    # the identical refresh and the orphan is simply superseded.
    base_rollup = state.get("rollup_version")
    if state:
        try:
            current = vt.read_table_version(spark, rollup_root, base_rollup)
        except FileNotFoundError:
            # State RECORDS a rollup version that no longer exists (e.g.
            # vacuum removed it after a crash left an orphan newer
            # version). Merging the delta alone would silently DROP all
            # history — recompute from the full source snapshot instead.
            full = _partials(
                spark.read.option("mergeSchema", "true").parquet(*snap.files)
            )
            new_rollup = vt.write_table(full, rollup_root, mode="overwrite")
            _write_state(
                rollup_root,
                {
                    "src_version": snap.version,
                    "rollup_version": new_rollup.version,
                },
            )
            return snap.version, len(snap.files)
        merged = (
            current.select(
                *_KEYS,
                F.col("n_events").alias("n_a"),
                F.col("total_value").alias("v_a"),
            )
            .join(
                delta.select(
                    *_KEYS,
                    F.col("n_events").alias("n_b"),
                    F.col("total_value").alias("v_b"),
                ),
                list(_KEYS),
                "full_outer",
            )
            .select(
                *_KEYS,
                (
                    F.coalesce(F.col("n_a"), F.lit(0))
                    + F.coalesce(F.col("n_b"), F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce(F.col("v_a"), F.lit(0.0))
                    + F.coalesce(F.col("v_b"), F.lit(0.0))
                ).alias("total_value"),
            )
        )
    else:
        merged = delta  # first refresh: the delta IS the rollup
    new_rollup = vt.write_table(merged, rollup_root, mode="overwrite")

    _write_state(
        rollup_root,
        {"src_version": snap.version, "rollup_version": new_rollup.version},
    )
    return snap.version, n_new_files
