"""Incremental materialized-view maintenance (sources/ivm.py): rollup
equals a full recompute, refresh reads only the delta files, and a
crash between rollup-commit and state-write never double-counts."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import ivm, versioned as vt
from concurrent_etl_go_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def _events_slice(spark, lo, hi):
    ev = read_table(spark, SF_SMOKE, "events")
    return ev.where((F.col("event_id") >= lo) & (F.col("event_id") < hi))


def _rollup_dict(spark, root):
    return {
        (r.event_type, r.day): (r.n_events, round(r.total_value, 6))
        for r in vt.read_table_version(spark, root).collect()
    }


def _expected_dict(df):
    rows = (
        df.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
        )
        .collect()
    )
    return {(r.event_type, r.day): (r.n, round(r.v, 6)) for r in rows}


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "rollup")

    vt.write_table(_events_slice(spark, 0, 400), src)
    v, n = ivm.refresh_rollup(spark, src, dst)
    assert v == 1 and n > 0
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 400)
    )

    # second batch appends; refresh must read ONLY the new files
    s2 = vt.write_table(_events_slice(spark, 400, 1000), src)
    prior_files = set(vt.snapshot(src, 1).files)
    v, n = ivm.refresh_rollup(spark, src, dst)
    assert v == s2.version
    assert n == len(set(s2.files) - prior_files)
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 1000)
    )

    # source unchanged -> no-op
    v, n = ivm.refresh_rollup(spark, src, dst)
    assert n == 0


def test_crashed_refresh_retry_never_double_counts(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "rollup")
    vt.write_table(_events_slice(spark, 0, 300), src)
    ivm.refresh_rollup(spark, src, dst)

    vt.write_table(_events_slice(spark, 300, 600), src)
    ivm.refresh_rollup(spark, src, dst)

    # simulate the crash window: the rollup committed (version advanced)
    # but the state write was lost -> roll state back one refresh
    state = ivm.refresh_state(dst)
    with open(os.path.join(dst, "_refresh_state.json"), "w") as f:
        json.dump({"src_version": 1, "rollup_version": 1}, f)

    # retry redoes the same delta against the RECORDED rollup version —
    # the orphan newer version must not be read, so counts stay exact
    v, n = ivm.refresh_rollup(spark, src, dst)
    assert v == 2 and n > 0
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 600)
    )
    assert ivm.refresh_state(dst)["rollup_version"] > state["rollup_version"]


def test_compacted_source_triggers_full_recompute_not_double_count(
    spark, tmp_path
):
    """After a source compact, every rewritten file looks 'new' to the
    manifest set-difference; the refresh must detect the non-append op and
    recompute from the full snapshot instead of re-merging all rows into
    the existing rollup (which would exactly double every count)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "rollup")
    vt.write_table(_events_slice(spark, 0, 300), src)
    ivm.refresh_rollup(spark, src, dst)

    vt.write_table(_events_slice(spark, 300, 600), src)
    vt.compact(spark, src, target_files=2)  # replaces the file set, op="compact"
    ivm.refresh_rollup(spark, src, dst)
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 600)
    )

    # and incremental refresh keeps working after the recompute
    vt.write_table(_events_slice(spark, 600, 900), src)
    v, n = ivm.refresh_rollup(spark, src, dst)
    assert n > 0
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 900)
    )


def test_corrupt_state_degrades_to_full_recompute(spark, tmp_path):
    """Truncated _refresh_state.json (crash mid-write) must read as
    'missing' and the next refresh must still converge, not raise."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "rollup")
    vt.write_table(_events_slice(spark, 0, 400), src)
    ivm.refresh_rollup(spark, src, dst)

    with open(os.path.join(dst, "_refresh_state.json"), "w") as f:
        f.write('{"src_version": 1, "rollup_')  # truncated JSON
    assert ivm.refresh_state(dst) == {}

    v, n = ivm.refresh_rollup(spark, src, dst)
    assert v == 1 and n > 0
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 400)
    )


def test_vacuumed_state_rollup_version_recovers_with_full_recompute(
    spark, tmp_path
):
    """Crash+vacuum corner: state records a rollup version whose manifest
    was vacuumed away (an orphan newer version superseded it). The next
    refresh must recompute from the full source — NOT treat it as a
    first refresh and silently drop all history to delta-only."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "rollup")
    vt.write_table(_events_slice(spark, 0, 300), src)
    ivm.refresh_rollup(spark, src, dst)                 # rollup v1
    vt.write_table(_events_slice(spark, 300, 600), src)
    ivm.refresh_rollup(spark, src, dst)                 # rollup v2

    # crash window: state still points at rollup v1...
    with open(os.path.join(dst, "_refresh_state.json"), "w") as f:
        json.dump({"src_version": 1, "rollup_version": 1}, f)
    # ...and vacuum removes v1 (keeps only the orphan v2)
    vt.vacuum(dst, keep_versions=1)

    vt.write_table(_events_slice(spark, 600, 900), src)
    v, n = ivm.refresh_rollup(spark, src, dst)
    assert v == 3
    assert _rollup_dict(spark, dst) == _expected_dict(
        _events_slice(spark, 0, 900)
    )


def test_ivm_converges_under_random_schedules(spark, tmp_path):
    """Property: any interleaving of appends, compactions, crash-lost
    state writes (the WHOLE state dict reverts — ``_write_state`` is
    atomic, so a crash can only lose src_version and rollup_version
    together, never half a pair), and torn/corrupt state leaves the
    next refresh equal to the full recompute of the source's current
    snapshot. Seeded so failures reproduce."""
    import random

    rng = random.Random(0x1BADB002)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "rollup")
    state_path = os.path.join(dst, "_refresh_state.json")
    cursor = [0]

    def next_slice(n):
        lo = cursor[0]
        cursor[0] = min(lo + n, 900)
        return _events_slice(spark, lo, cursor[0])

    vt.write_table(next_slice(100), src)
    ivm.refresh_rollup(spark, src, dst)

    for step in range(10):
        op = rng.choice(["append", "append", "compact", "noop"])
        if op == "append" and cursor[0] < 900:
            vt.write_table(next_slice(rng.randint(50, 150)), src,
                           mode="append")
        elif op == "compact":
            vt.compact(spark, src, target_files=2)

        pre_state = ivm.refresh_state(dst)
        ivm.refresh_rollup(spark, src, dst)
        # crash/corruption injection AFTER the refresh commits
        r = rng.random()
        if r < 0.3 and pre_state:
            with open(state_path, "w") as f:
                json.dump(pre_state, f)            # state write lost
        elif r < 0.4:
            with open(state_path, "w") as f:
                f.write("{corrupt")                # torn write
        ivm.refresh_rollup(spark, src, dst)        # retry converges

        snap = vt.snapshot(src)
        full = spark.read.option("mergeSchema", "true").parquet(*snap.files)
        assert _rollup_dict(spark, dst) == _expected_dict(full), (
            f"diverged at step {step} after {op}"
        )
