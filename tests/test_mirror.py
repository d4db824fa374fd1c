"""Table replication (sources/mirror.py): cheapest-mechanism selection,
convergence after every upstream shape, and crash-retry idempotence."""

from __future__ import annotations

import json
import os
from collections import Counter

from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import mirror, versioned as vt


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("double_id")
    )


def _multiset(spark, root):
    return Counter(
        (r.id, r.double_id)
        for r in vt.read_table_version(spark, root).collect()
    )


def test_mirror_selects_cheapest_mechanism_and_converges(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    vt.write_table(_df(spark, 0, 6), src)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (1, "rebuild")  # first sync
    assert _multiset(spark, dst) == _multiset(spark, src)

    v, mode = mirror.mirror_table(spark, src, dst)
    assert mode == "noop"

    # plain appends forward as appends (delta files only)
    vt.write_table(_df(spark, 6, 9), src)
    vt.write_table(_df(spark, 9, 11), src)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (3, "append")
    assert _multiset(spark, dst) == _multiset(spark, src)

    # a rewritten window with a key catches up via CDC
    upd = spark.createDataFrame([(0, 999)], "id long, double_id long")
    vt.merge_upsert(spark, src, upd, key="id")
    v, mode = mirror.mirror_table(spark, src, dst, key="id")
    assert mode == "cdc"
    assert _multiset(spark, dst) == _multiset(spark, src)

    # a rewritten window WITHOUT a key rebuilds (priced, surfaced)
    vt.compact(spark, src, target_files=1)
    vt.write_table(_df(spark, 50, 52), src)
    vt.compact(spark, src, target_files=1)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert mode == "rebuild"
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_mirror_crash_retry_never_duplicates(spark, tmp_path):
    """Crash between the dst commit and the mirror-state write: the retry
    must detect the committed source version (batch id) and not re-append
    the same delta."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 5), src)
    mirror.mirror_table(spark, src, dst)
    vt.write_table(_df(spark, 5, 8), src)
    mirror.mirror_table(spark, src, dst)
    assert _multiset(spark, dst) == _multiset(spark, src)

    # simulate the crash: roll the state back one sync
    with open(os.path.join(dst, "_mirror_state.json"), "w") as f:
        json.dump({"src_version": 1}, f)

    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (2, "noop")  # replay detected, nothing re-applied
    assert _multiset(spark, dst) == _multiset(spark, src)
    assert mirror.mirror_state(dst) == {"src_version": 2}


def test_mirror_cdc_crash_retry_is_idempotent(spark, tmp_path):
    """Same crash window on the CDC path: the applied source version rides
    in the dst manifest, so the retry is a no-op instead of re-applying
    inserts twice."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 5), src)
    mirror.mirror_table(spark, src, dst)

    upd = spark.createDataFrame([(1, 111), (70, 777)], "id long, double_id long")
    vt.merge_upsert(spark, src, upd, key="id")
    mirror.mirror_table(spark, src, dst, key="id")
    assert _multiset(spark, dst) == _multiset(spark, src)

    with open(os.path.join(dst, "_mirror_state.json"), "w") as f:
        json.dump({"src_version": 1}, f)
    v, mode = mirror.mirror_table(spark, src, dst, key="id")
    assert mode == "noop"
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_cli_mirror_subcommand(capsys, spark, tmp_path):
    from concurrent_etl_go_spark.cli import main

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 4), src)
    assert main(["table", src, "mirror", dst]) == 0
    assert "via rebuild" in capsys.readouterr().out
    vt.write_table(_df(spark, 4, 6), src)
    assert main(["table", src, "mirror", dst, "--key", "id"]) == 0
    assert "via append" in capsys.readouterr().out
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_mirror_crash_with_later_upstream_commits_fast_forwards(
    spark, tmp_path
):
    """Crash after committing src v2 to dst, then src advances to v3:
    the retry must fast-forward past the committed v2 window and apply
    ONLY v3's delta — not re-append v2's rows."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 4), src)                 # v1
    mirror.mirror_table(spark, src, dst)
    vt.write_table(_df(spark, 4, 7), src)                 # v2
    mirror.mirror_table(spark, src, dst)                  # commits v2 delta

    # crash window: state lost the last sync...
    with open(os.path.join(dst, "_mirror_state.json"), "w") as f:
        json.dump({"src_version": 1}, f)
    # ...and the source moves on
    vt.write_table(_df(spark, 7, 9), src)                 # v3

    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (3, "append")
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_mirror_vacuumed_window_with_key_rebuilds(spark, tmp_path):
    """CDC cannot reconstruct a window whose source manifests were
    vacuumed — even with a key the mirror must degrade to rebuild, not
    crash."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 4), src)                 # v1
    mirror.mirror_table(spark, src, dst, key="id")
    vt.write_table(_df(spark, 4, 6), src)                 # v2
    vt.write_table(_df(spark, 6, 8), src)                 # v3
    vt.vacuum(src, keep_versions=1)                       # v1/v2 manifests gone

    v, mode = mirror.mirror_table(spark, src, dst, key="id")
    assert (v, mode) == (3, "rebuild")
    assert _multiset(spark, dst) == _multiset(spark, src)


def test_mirror_batch_ids_disjoint_from_streaming_epochs(spark, tmp_path):
    """A dst that also received streaming exactly-once appends (epoch ids
    >= 0) must not false-noop when a source version number collides with
    an epoch id — mirror ids live in the negative namespace."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 3), src)                 # src v1
    mirror.mirror_table(spark, src, dst)
    vt.write_table(_df(spark, 3, 5), src)                 # src v2

    # a streaming epoch id equal to the pending source version
    files = vt._write_data_files(_df(spark, 100, 101), dst)
    vt.append_prepared(dst, files, batch_id=2, dtypes=_df(spark, 100, 101).dtypes)

    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (2, "append")                     # NOT a false noop
    expect = _multiset(spark, src) + Counter({(100, 200): 1})
    assert _multiset(spark, dst) == expect


def test_mirror_append_preserves_schema_validation(spark, tmp_path):
    """append_prepared now records the schema, so a retyping append to
    the MIRROR still raises SchemaEvolutionError."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 3), src)
    mirror.mirror_table(spark, src, dst)
    vt.write_table(_df(spark, 3, 5), src)
    v, mode = mirror.mirror_table(spark, src, dst)
    assert mode == "append"

    import pytest

    retyped = spark.createDataFrame([("x", 1)], "id string, double_id long")
    with pytest.raises(vt.SchemaEvolutionError):
        vt.write_table(retyped, dst, mode="append")


def test_selective_replica_with_predicate(spark, tmp_path):
    """Filtered mirroring: only even ids replicate; an update moving a
    row out of the predicate deletes it from the replica, and one moving
    a row in makes it arrive."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    pred = "double_id % 4 = 0"  # even ids (double_id = 2*id)

    vt.write_table(_df(spark, 0, 6), src)                 # ids 0..5
    v, mode = mirror.mirror_table(spark, src, dst, key="id", predicate=pred)
    assert mode == "rebuild"
    assert {r.id for r in vt.read_table_version(spark, dst).collect()} == {0, 2, 4}

    # append path honors the predicate
    vt.write_table(_df(spark, 6, 10), src)                # ids 6..9
    v, mode = mirror.mirror_table(spark, src, dst, key="id", predicate=pred)
    assert mode == "append"
    assert {r.id for r in vt.read_table_version(spark, dst).collect()} == {0, 2, 4, 6, 8}

    # CDC path: move id=2 OUT of the predicate (odd double_id) and
    # id=3 IN (double_id divisible by 4)
    upd = spark.createDataFrame([(2, 5), (3, 8)], "id long, double_id long")
    vt.merge_upsert(spark, src, upd, key="id")
    v, mode = mirror.mirror_table(spark, src, dst, key="id", predicate=pred)
    assert mode == "cdc"
    got = {(r.id, r.double_id) for r in vt.read_table_version(spark, dst).collect()}
    assert (2, 5) not in got and (2, 4) not in got      # left the replica
    assert (3, 8) in got                                 # arrived
    assert {i for i, _ in got} == {0, 3, 4, 6, 8}


def test_mirror_crash_recovery_survives_many_interleaved_epochs(
    spark, tmp_path
):
    """A crashed mirror commit must be rediscovered on retry even when
    MANY streaming epochs landed on dst in between — the fast-forward
    scan is bounded by the stated sync, not a fixed manifest depth
    (a fixed window would re-append the same source delta)."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    vt.write_table(_df(spark, 0, 4), src)                 # src v1
    mirror.mirror_table(spark, src, dst)
    vt.write_table(_df(spark, 4, 7), src)                 # src v2
    mirror.mirror_table(spark, src, dst)                  # commits v2 delta

    # crash window: the state write for the v2 sync is lost...
    with open(os.path.join(dst, "_mirror_state.json"), "w") as f:
        json.dump({"src_version": 1}, f)
    # ...and 20 streaming epochs land on dst before the mirror retries
    extra = Counter()
    for epoch in range(20):
        row = _df(spark, 1000 + epoch, 1001 + epoch)
        files = vt._write_data_files(row, dst)
        vt.append_prepared(dst, files, batch_id=epoch, dtypes=row.dtypes)
        extra[(1000 + epoch, 2 * (1000 + epoch))] = 1

    v, mode = mirror.mirror_table(spark, src, dst)
    assert (v, mode) == (2, "noop")                       # NOT re-applied
    assert _multiset(spark, dst) == _multiset(spark, src) + extra


def test_append_prepared_is_idempotent_on_batch_id(spark, tmp_path):
    """Exactly-once lives in append_prepared itself: a second append
    carrying an already-committed batch_id is a no-op returning the
    current snapshot, so two writers replaying the same delta cannot
    duplicate rows even without the caller-side guard."""
    root = str(tmp_path / "tbl")
    df = _df(spark, 0, 5)
    first = vt.append_prepared(
        root, vt._write_data_files(df, root), batch_id=3, dtypes=df.dtypes
    )
    dup_files = vt._write_data_files(df, root)
    again = vt.append_prepared(root, dup_files, batch_id=3, dtypes=df.dtypes)
    assert again.version == first.version
    assert _multiset(spark, root) == Counter(
        {(i, 2 * i): 1 for i in range(5)}
    )
    assert vt.committed_batch_ids(root) == {3}


def test_mirror_converges_under_random_schedules(spark, tmp_path):
    """Property: whatever sequence of upstream shapes lands (append,
    keyed merge, compact, restore), with crash injections (lost state
    writes) and interleaved foreign streaming epochs on the
    destination, every mirror sync converges the replica to the
    source's current rows and never duplicates. Seeded random walk so
    failures reproduce."""
    import random

    rng = random.Random(0xC0FFEE)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    next_id = [0]

    def fresh_rows(n):
        lo = next_id[0]
        next_id[0] += n
        return _df(spark, lo, lo + n)

    vt.write_table(fresh_rows(5), src)
    mirror.mirror_table(spark, src, dst, key="id")
    foreign = Counter()

    for step in range(12):
        op = rng.choice(["append", "merge", "compact", "restore", "noop"])
        if op == "append":
            vt.write_table(fresh_rows(rng.randint(1, 4)), src, mode="append")
        elif op == "merge":
            cur = [r.id for r in vt.read_table_version(spark, src).collect()]
            take = rng.sample(cur, min(3, len(cur)))
            upd = spark.createDataFrame(
                [(i, i * 7) for i in take], "id long, double_id long"
            )
            vt.merge_upsert(spark, src, upd, key="id")
        elif op == "compact":
            vt.compact(spark, src, target_files=2)
        elif op == "restore":
            versions = vt._versions(src)  # noqa: SLF001
            if len(versions) > 1:
                vt.restore_table(src, rng.choice(versions[:-1]))
        # crash injection: lose the last state write sometimes
        if rng.random() < 0.4:
            state = mirror.mirror_state(dst)
            if state.get("src_version", 1) > 1:
                mirror._write_state(  # noqa: SLF001
                    dst, {"src_version": state["src_version"] - 1}
                )
        # foreign streaming epochs on the mixed-writer destination
        if rng.random() < 0.5:
            row = _df(spark, 10_000 + step, 10_001 + step)
            files = vt._write_data_files(row, dst)  # noqa: SLF001
            vt.append_prepared(dst, files, batch_id=step, dtypes=row.dtypes)
            foreign[(10_000 + step, 2 * (10_000 + step))] += 1

        mirror.mirror_table(spark, src, dst, key="id")
        assert _multiset(spark, dst) == _multiset(spark, src) + foreign, (
            f"diverged at step {step} after {op}"
        )
