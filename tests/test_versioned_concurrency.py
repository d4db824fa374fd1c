"""Concurrent-writer chaos tests for the versioned-table commit
protocol (VERDICT r13 §Next #6).

The O_CREAT|O_EXCL manifest claim (sources/versioned.py::_commit) had
conflict-DETECTION tests but no concurrent-writer stress.  These tests
race two committers on the same base version:

- a deterministic race (both writers pinned to the SAME base, barrier
  right before the commit claim): exactly one wins, the loser raises
  ``CommitConflictError``, and the committed manifest references only
  the winner's files;
- a multi-round retry chaos (two threads x K merge_upserts each, with
  a per-attempt barrier to maximize collisions, losers re-read and
  retry): the final table holds every writer's rows at their latest
  values, the version history is linear with no gaps, and ``vacuum``
  leaves no orphan — every surviving data file is referenced by the
  retained manifest.

Threads (not processes) carry the race: the contended primitive is the
atomic manifest create on the shared filesystem, which is exactly what
two independent sessions/processes would contend on — the POSIX
O_EXCL semantics don't care who the opener is.
"""

from __future__ import annotations

import glob
import os
import threading

import pytest
from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import versioned as V


def _mk_table(spark, root, n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"), F.lit("base").alias("val")
    )
    return V.write_table(df, root, mode="overwrite")


def test_same_base_race_exactly_one_winner(spark, tmp_path):
    """Both writers stage data files against the SAME base version and
    claim base+1 simultaneously — exactly one commit must win."""
    root = str(tmp_path / "tbl")
    base = _mk_table(spark, root)

    staged = []
    for tag in ("a", "b"):
        upd = spark.range(5).select(
            F.col("id").alias("k"), F.lit(f"writer-{tag}").alias("val")
        )
        cur = spark.read.parquet(*base.files)
        merged = cur.join(
            upd.select("k").distinct(), "k", "left_anti"
        ).unionByName(upd)
        staged.append(V._write_data_files(merged, root))

    barrier = threading.Barrier(2)
    outcomes: list[tuple[str, object]] = []
    lock = threading.Lock()

    def commit(files, tag):
        barrier.wait()
        try:
            snap = V._commit(root, "merge", files, base_version=base.version)
            res = ("win", snap)
        except V.CommitConflictError as exc:
            res = ("conflict", exc)
        with lock:
            outcomes.append((tag, res))

    threads = [
        threading.Thread(target=commit, args=(staged[i], tag))
        for i, tag in enumerate(("a", "b"))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    results = {tag: res for tag, res in outcomes}
    kinds = sorted(res[0] for res in results.values())
    assert kinds == ["conflict", "win"], f"expected 1 winner 1 loser: {kinds}"
    winner_tag = next(t for t, r in results.items() if r[0] == "win")
    snap = results[winner_tag][1]
    assert snap.version == base.version + 1
    # the committed manifest references exactly the winner's files
    assert set(V.snapshot(root).files) == set(
        staged[("a", "b").index(winner_tag)]
    )
    # the loser's staged files are orphans until vacuum — and vacuum
    # removes them without touching the winner's
    deleted = V.vacuum(root, keep_versions=1)
    loser_files = staged[1 - ("a", "b").index(winner_tag)]
    assert set(loser_files) <= set(deleted)
    assert not set(V.snapshot(root).files) & set(deleted)


@pytest.mark.parametrize("rounds", [4])
def test_merge_upsert_retry_chaos_converges(spark, tmp_path, rounds):
    """Two writers x `rounds` merge_upserts each, per-attempt barrier,
    retry on conflict: every round at most one claim of a given version
    succeeds, the replica converges to all writers' latest values, and
    no manifest orphan survives vacuum."""
    root = str(tmp_path / "tbl")
    _mk_table(spark, root)

    barrier = threading.Barrier(2)
    errors: list[Exception] = []
    conflicts = {"n": 0}
    lock = threading.Lock()

    def writer(tag: str, keys: range):
        try:
            for r in range(rounds):
                upd = spark.createDataFrame(
                    [(k, f"{tag}-r{r}") for k in keys], "k long, val string"
                )
                barrier.wait()
                while True:
                    try:
                        V.merge_upsert(spark, root, upd, key="k")
                        break
                    except V.CommitConflictError:
                        with lock:
                            conflicts["n"] += 1
        except Exception as exc:  # noqa: BLE001 — surface in main thread
            with lock:
                errors.append(exc)
            # unblock the peer's barrier waits for remaining rounds
            barrier.abort()

    # overlapping key ranges: writer-b's last round must win on 20-29
    ta = threading.Thread(target=writer, args=("a", range(0, 30)))
    tb = threading.Thread(target=writer, args=("b", range(20, 50)))
    ta.start(), tb.start()
    ta.join(), tb.join()
    assert not errors, errors

    # linear history, no version gaps
    versions = V._versions(root)
    assert versions == list(range(1, len(versions) + 1))
    # base(1) + 2*rounds merges = every successful commit claimed a
    # distinct version
    assert len(versions) == 1 + 2 * rounds

    # convergence: every key holds SOME writer's final-round value, and
    # keys owned by exactly one writer hold that writer's last round
    rowmap = {
        r["k"]: r["val"]
        for r in spark.read.parquet(*V.snapshot(root).files).collect()
    }
    last = rounds - 1
    for k in range(0, 20):
        assert rowmap[k] == f"a-r{last}"
    for k in range(30, 50):
        assert rowmap[k] == f"b-r{last}"
    for k in range(20, 30):  # contended keys: one of the two finals
        assert rowmap[k] in (f"a-r{last}", f"b-r{last}")

    # the chaos actually exercised the conflict path
    assert conflicts["n"] >= 1, "no conflict ever hit — race not exercised"

    # vacuum: afterwards every remaining data file is referenced and
    # every referenced file exists (no manifest orphan)
    V.vacuum(root, keep_versions=1)
    kept = set(V.snapshot(root).files)
    on_disk = {
        p
        for p in glob.glob(os.path.join(root, "data", "*", "*.parquet"))
    }
    assert kept == on_disk
    for p in kept:
        assert os.path.exists(p)
