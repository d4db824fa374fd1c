"""Versioned parquet tables: snapshot isolation + time travel, no jars.

The real lakehouse connectors (``lakehouse.py``) are import-gated on jars
this image does not ship. This module implements the EXECUTABLE core of
what those formats provide — an atomically-committed, versioned manifest
over immutable parquet data files — in pure PySpark + the filesystem, so
the engine has working table management that tests end-to-end here and
the same call sites can swap to Delta/Iceberg when the jars exist.

Layout (all under the table root):

    _manifests/v00000001.json   one JSON manifest per committed version:
                                {"version", "op", "files", "n_files",
                                 "batch_id", "schema"}
    data/<commit-uuid>/part-*.parquet   immutable data files per commit

Concurrency model (the Delta/Iceberg one, scaled down): writers prepare
data files in an unreferenced directory, then commit by creating the
next ``v{N}`` manifest with an atomic create-if-absent. Two concurrent
writers racing to the same N: exactly one wins, the loser gets
``CommitConflictError`` and retries on the new latest — data files are
never mutated, so a failed commit leaves only unreferenced files (see
``vacuum``). Readers resolve a manifest ONCE and then read immutable
files: a snapshot can never observe a half-committed write.

Scale notes: the manifest holds file PATHS, not data — commit cost is
O(files touched), independent of table size. Reads hand Spark the
explicit file list, so partition pruning and predicate pushdown work
exactly as for any parquet scan. At real scale the manifest itself
would shard (Iceberg's manifest lists); the single-JSON form keeps the
semantics identical and this image dependency-free.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflictError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


class SchemaEvolutionError(ValueError):
    """Append schema conflicts with the table's committed schema.

    ADDING columns is legal evolution (old files surface NULL for them);
    CHANGING a column's type is not — parquet readers cannot reconcile
    int64 and string footers for the same name, so the conflict must fail
    at COMMIT time, not as a read error discovered much later."""


@dataclass(frozen=True)
class Snapshot:
    version: int
    op: str
    files: tuple[str, ...]
    #: Streaming epoch that produced this version (None for batch
    #: commits) — the idempotence key for exactly-once streaming appends.
    batch_id: int | None = None


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_manifest_dir(root), f"v{version:08d}.json")


def _versions(root: str) -> list[int]:
    mdir = _manifest_dir(root)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def snapshot(root: str, version: int | None = None) -> Snapshot:
    """Resolve a committed snapshot (latest by default). Reading through
    the returned file list is immune to concurrent commits — files are
    immutable once referenced."""
    versions = _versions(root)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not in {versions} under {root}"
        )
    with open(_manifest_path(root, version)) as f:
        m = json.load(f)
    return Snapshot(m["version"], m["op"], tuple(m["files"]), m.get("batch_id"))


def history(root: str) -> list[Snapshot]:
    return [snapshot(root, v) for v in _versions(root)]


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level changes between two committed snapshots (CDC read):
    every row present in ``to`` but not ``from`` tagged
    ``_change_type='insert'``, every row present in ``from`` but not
    ``to`` tagged ``'delete'`` (an in-place update therefore surfaces as
    a delete + insert pair), multiset semantics (a row appearing twice
    then once yields one delete).

    FILES SHARED BY BOTH MANIFESTS ARE NEVER READ: their rows contribute
    identical multisets to both sides and cancel in the difference, so
    the diff costs O(files changed), not O(table) — after a plain append
    that is exactly the appended files (and a compact, which rewrites
    every file with identical contents, correctly diffs to zero rows at
    full-rewrite cost). Schema evolution is handled by aligning both
    sides on the union of their columns (absent columns read as NULL,
    matching ``read_table_version``'s mergeSchema semantics).
    """
    old_snap = snapshot(root, from_version)
    new_snap = snapshot(root, to_version)
    old_set, new_set = set(old_snap.files), set(new_snap.files)
    old_only = [f for f in old_snap.files if f not in new_set]
    new_only = [f for f in new_snap.files if f not in old_set]

    def _read(files: list[str]) -> DataFrame | None:
        if not files:
            return None
        return spark.read.option("mergeSchema", "true").parquet(*files)

    old_df, new_df = _read(old_only), _read(new_only)
    if old_df is None and new_df is None:
        return (
            read_table_version(spark, root, to_version)
            .withColumn("_change_type", F.lit("insert"))
            .limit(0)
        )
    if old_df is None:
        old_df = new_df.limit(0)
    elif new_df is None:
        new_df = old_df.limit(0)
    # union of columns in first-seen order, each with its concrete type
    # (a bare NULL literal is VOID-typed and would break exceptAll's
    # schema match, so absent columns are cast to the present side's type)
    types = dict(old_df.dtypes)
    types.update({n: t for n, t in new_df.dtypes if n not in types})
    cols = list(types)

    def _aligned(df: DataFrame) -> DataFrame:
        return df.select(
            *[
                F.col(c)
                if c in df.columns
                else F.lit(None).cast(types[c]).alias(c)
                for c in cols
            ]
        )

    old_a, new_a = _aligned(old_df), _aligned(new_df)
    inserts = new_a.exceptAll(old_a).withColumn("_change_type", F.lit("insert"))
    deletes = old_a.exceptAll(new_a).withColumn("_change_type", F.lit("delete"))
    return inserts.unionByName(deletes)


def committed_batch_ids(root: str) -> set[int]:
    """Streaming epochs already durably committed to this table."""
    return {
        s.batch_id for s in history(root) if s.batch_id is not None
    }


def _manifest_schema(root: str, version: int) -> list[list[str]] | None:
    """[[name, spark-simpleString-type], ...] recorded at commit, or None
    for manifests written before schema tracking."""
    with open(_manifest_path(root, version)) as f:
        return json.load(f).get("schema")


def _check_append_schema(root: str, base: int, dtypes: list) -> list[list[str]]:
    """Validate ``dtypes`` against the base version's committed schema and
    return the UNION schema (evolution = prior columns + newly added ones,
    in first-seen order). Raises ``SchemaEvolutionError`` on type
    conflicts."""
    new = [[n, t] for n, t in dtypes]
    prior = _manifest_schema(root, base) if base else None
    if prior is None:
        return new
    prior_types = {n: t for n, t in prior}
    conflicts = [
        (n, prior_types[n], t)
        for n, t in new
        if n in prior_types and prior_types[n] != t
    ]
    if conflicts:
        detail = ", ".join(f"{n}: {a} -> {b}" for n, a, b in conflicts)
        raise SchemaEvolutionError(
            f"append would change column types ({detail}); adding columns "
            "is supported, retyping them is not"
        )
    merged = [list(p) for p in prior]
    seen = set(prior_types)
    for n, t in new:
        if n not in seen:
            merged.append([n, t])
    return merged


def apply_changes(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key: str,
    batch_id: int | None = None,
) -> Snapshot:
    """Apply a ``table_changes``-shaped frame (rows tagged
    ``_change_type`` in {'insert', 'delete'}) to this table as ONE
    committed version — the consumer half of CDC replication: deletes
    remove the matching ``key`` rows, inserts append, and an update's
    delete+insert pair nets to an in-place replace.

    ``key`` must uniquely identify rows (the ``merge_upsert``
    primary-key convention) — the delete is key-based, so deleting one
    of several rows sharing a key would remove them all; raise that
    shape to row-level semantics by choosing a finer key.  Same
    copy-on-write + base-version conflict rules as ``merge_upsert``:
    a concurrent commit fails THIS apply (caller re-reads and retries)
    rather than silently losing rows.

    End-to-end: ``table_changes(src, v1, v2)`` piped into
    ``apply_changes(dst)`` replicates src's v1->v2 transition onto dst —
    the foundation a downstream mirror or a selective (filtered)
    replica builds on.  ``batch_id`` rides into the manifest as the
    idempotence key (``sources/mirror.py`` passes the source version so
    a crash-retry of the same transition is detectable via
    ``committed_batch_ids``).
    """
    base = snapshot(root)
    current = spark.read.option("mergeSchema", "true").parquet(*base.files)
    inserts = changes.where(F.col("_change_type") == "insert").drop(
        "_change_type"
    )
    deleted_keys = (
        changes.where(F.col("_change_type") == "delete")
        .select(key)
        .distinct()
    )
    merged = current.join(deleted_keys, key, "left_anti").unionByName(
        inserts, allowMissingColumns=True
    )
    files = _write_data_files(merged, root)
    return _commit(
        root,
        "merge",
        files,
        base_version=base.version,
        batch_id=batch_id,
        schema=[[n, t] for n, t in merged.dtypes],
    )


def restore_table(root: str, version: int) -> Snapshot:
    """Roll the table back to ``version`` by committing a NEW version
    whose manifest references the restored snapshot's files (op =
    "restore") — history is preserved, nothing is rewritten or deleted,
    and the usual base+1 commit race rules apply.

    This is the fix-forward undo for a bad write: the offending versions
    stay readable for forensics until ``vacuum``, readers of "latest"
    see the restored contents immediately, and because the restore
    reuses the target's immutable files its cost is one manifest write —
    O(1), independent of table size.  NOTE: a restore is not an append;
    incremental consumers (``refresh_rollup``) detect the non-append op
    and recompute rather than double-count.
    """
    target = snapshot(root, version)
    base = snapshot(root)
    return _commit(
        root,
        "restore",
        list(target.files),
        base_version=base.version,
        schema=_manifest_schema(root, version),
    )


def clone_table(root: str, dest_root: str) -> Snapshot:
    """Zero-copy (shallow) clone: a NEW table whose v1 manifest points at
    the SOURCE's current data files.  Nothing is copied — the clone costs
    one manifest write regardless of table size, which is what makes
    dev/test forks of a 100 TB production table practical.

    Divergence is free and safe afterwards: files are immutable and every
    table writes new data under its OWN root, so writes to the clone
    never touch the source (and vice versa).  The one coupling is
    ``vacuum`` on the SOURCE, which cannot see the clone's references —
    the same caveat Delta documents for shallow clones; vacuum the source
    only when its clones are gone or deep-copied.
    """
    if os.path.isdir(_manifest_dir(dest_root)) and _versions(dest_root):
        raise ValueError(f"clone destination already has versions: {dest_root}")
    src = snapshot(root)
    return _commit(
        dest_root,
        "clone",
        list(src.files),
        base_version=0,
        schema=_manifest_schema(root, src.version),
    )


def incremental_scan(
    spark: SparkSession, root: str, since_version: int | None
) -> tuple[DataFrame | None, Snapshot]:
    """Rows APPENDED strictly after ``since_version`` (None = everything),
    or None when the table hasn't advanced — the generic incremental-
    consumer read (``ivm.refresh_rollup`` is one such consumer; a
    micro-batch forwarder is another).

    Validity requires every commit in the window to be a plain append —
    after an overwrite/compact/merge/restore the file-set difference no
    longer means "rows added", so this raises ``ValueError`` and the
    consumer must fall back to a full read of the returned snapshot.
    Cost is O(files added): only the delta files are handed to Spark.
    """
    snap = snapshot(root)
    if since_version is None:
        return (
            spark.read.option("mergeSchema", "true").parquet(*snap.files),
            snap,
        )
    if since_version == snap.version:
        return None, snap
    try:
        prev = set(snapshot(root, since_version).files)
        for v in range(since_version + 1, snap.version + 1):
            op = snapshot(root, v).op
            if op != "append":
                raise ValueError(
                    f"incremental scan invalid across non-append commit "
                    f"v{v} (op={op!r}); re-read the full snapshot"
                )
    except FileNotFoundError as exc:
        # a vacuumed manifest inside the window makes append-only
        # unprovable — same contract violation as a non-append op
        raise ValueError(
            f"incremental scan window [{since_version}, {snap.version}] "
            f"has vacuumed manifests; re-read the full snapshot"
        ) from exc
    new_files = [f for f in snap.files if f not in prev]
    if not new_files:
        return None, snap
    return (
        spark.read.option("mergeSchema", "true").parquet(*new_files),
        snap,
    )


def _commit(
    root: str,
    op: str,
    files: list[str],
    base_version: int,
    batch_id: int | None = None,
    schema: list[list[str]] | None = None,
    stats: dict | None = None,
) -> Snapshot:
    """Atomically publish version ``base_version + 1`` referencing
    ``files``.

    The writer must pass the version its write was BASED ON (0 for a new
    table): claiming exactly base+1 with an atomic create-if-absent
    (O_CREAT|O_EXCL — the POSIX primitive object stores emulate with
    if-none-match puts) makes stale writes fail instead of silently
    winning. This matters for append: its file list includes the base
    snapshot's files, so claiming "whatever the next free version is"
    after a concurrent commit would publish a manifest that DROPS the
    other writer's rows. Losing the race raises ``CommitConflictError``
    with nothing to clean up except unreferenced data files.
    """
    os.makedirs(_manifest_dir(root), exist_ok=True)
    next_v = base_version + 1
    payload = json.dumps(
        {
            "version": next_v,
            "op": op,
            "files": files,
            "n_files": len(files),
            "batch_id": batch_id,
            "schema": schema,
            **({"stats": stats} if stats is not None else {}),
        }
    )
    path = _manifest_path(root, next_v)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise CommitConflictError(
            f"version {next_v} already committed under {root}"
        ) from exc
    with os.fdopen(fd, "w") as f:
        f.write(payload)
    return Snapshot(next_v, op, tuple(files), batch_id)


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    commit_dir = os.path.join(root, "data", uuid.uuid4().hex)
    df.write.parquet(commit_dir)
    return sorted(
        os.path.join(commit_dir, name)
        for name in os.listdir(commit_dir)
        if name.endswith(".parquet")
    )


def write_table(df: DataFrame, root: str, mode: str = "append") -> Snapshot:
    """Commit ``df`` as a new table version.

    ``append`` references previous files + new; ``overwrite`` references
    only the new files (the old version stays readable — that's time
    travel, not deletion).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = _versions(root)
    base = versions[-1] if versions else 0
    if mode == "append":
        # validate BEFORE writing data files: a conflicting append should
        # fail clean, not leave unreferenced files for vacuum
        schema = _check_append_schema(root, base, df.dtypes)
    else:
        schema = [[n, t] for n, t in df.dtypes]
    new_files = _write_data_files(df, root)
    if mode == "append" and base:
        prior = snapshot(root, base).files
        files = list(prior) + new_files
    else:
        files = new_files
    return _commit(root, mode, files, base_version=base, schema=schema)


def append_prepared(
    root: str,
    new_files: list[str],
    batch_id: int | None = None,
    retries: int = 5,
    dtypes: list | None = None,
) -> Snapshot:
    """Append already-written data files, retrying commit races.

    Retry is safe and cheap here (unlike re-running ``write_table``): the
    data files exist once; each attempt only re-resolves the latest
    snapshot and re-attempts the atomic manifest create. ``batch_id``
    rides along as the streaming idempotence key.

    Pass the appended DataFrame's ``dtypes`` to validate/record schema
    evolution like ``write_table`` does; without them the base version's
    schema carries forward unchanged — either way the manifest keeps a
    schema, so later appends never lose ``SchemaEvolutionError``
    validation (a schema-less manifest silently disables the check).

    Exactly-once is enforced HERE, not just by callers: when ``batch_id``
    is set and already appears in ``committed_batch_ids`` — at entry, or
    re-checked after losing a commit race (the race winner may have been
    a concurrent writer committing the SAME batch) — the append is a
    no-op returning the current snapshot. Without the in-loop re-check,
    two concurrent mirrors replaying the same source delta could both
    commit it and duplicate rows.
    """
    for _ in range(retries):
        versions = _versions(root)
        base = versions[-1] if versions else 0
        if batch_id is not None and batch_id in committed_batch_ids(root):
            return snapshot(root, base)
        prior = snapshot(root, base).files if base else ()
        if dtypes is not None:
            schema = _check_append_schema(root, base, dtypes)
        else:
            schema = _manifest_schema(root, base) if base else None
        try:
            return _commit(
                root,
                "append",
                list(prior) + list(new_files),
                base_version=base,
                batch_id=batch_id,
                schema=schema,
            )
        except CommitConflictError:
            continue
    raise CommitConflictError(
        f"append lost {retries} consecutive commit races under {root}"
    )


def read_table_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot (latest by default, or time-travel to ``version``).

    ``mergeSchema`` unions footer schemas across the referenced files, so
    a snapshot whose history includes schema evolution surfaces every
    committed column (files written before a column existed yield NULL
    for it). Homogeneous histories read identically with or without the
    option; the cost is one footer read per file at planning time, which
    the manifest already bounds to the snapshot's file list."""
    snap = snapshot(root, version)
    return spark.read.option("mergeSchema", "true").parquet(*snap.files)


def vacuum(root: str, keep_versions: int = 1) -> list[str]:
    """Delete data files unreferenced by the ``keep_versions`` newest
    manifests (and drop the older manifests). Returns deleted paths.
    The immutable-files + manifest design makes this safe: a reader that
    resolved a retained snapshot never holds a deleted path.
    ``keep_versions`` must be >= 1 — zero would delete every manifest
    (leaving the table unreadable) while the falsy-zero slice kept every
    data file orphaned."""
    if keep_versions < 1:
        raise ValueError(
            f"keep_versions must be >= 1, got {keep_versions} (vacuuming "
            "every version would leave an unreadable table)"
        )
    versions = _versions(root)
    keep = versions[-keep_versions:]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(snapshot(root, v).files)
    deleted = []
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for commit_dir in os.listdir(data_root):
            full = os.path.join(data_root, commit_dir)
            for name in os.listdir(full):
                p = os.path.join(full, name)
                if name.endswith(".parquet") and p not in referenced:
                    os.remove(p)
                    deleted.append(p)
    for v in versions[:-keep_versions] if keep_versions else versions:
        os.remove(_manifest_path(root, v))
    return deleted


def merge_upsert(
    spark: SparkSession, root: str, updates: DataFrame, key: str
) -> Snapshot:
    """MERGE (upsert) into the latest snapshot: update rows whose ``key``
    matches, insert the rest — committed as one new version.

    Copy-on-write read-modify-write: resolve the base snapshot ONCE, anti-
    join its rows against the update keys, union the updates, commit the
    rewrite claiming ``base + 1``. Pinning the base at read time makes a
    concurrent commit fail THIS merge with ``CommitConflictError``
    (retry re-reads) instead of silently overwriting rows the merge never
    saw — the lost-update anomaly plain overwrite would produce.

    At real scale the rewrite narrows to only the files whose key ranges
    intersect the updates (file-level min/max stats — the Delta/Iceberg
    refinement); semantics here are identical with the whole snapshot as
    one "touched file set". The anti-join itself is Spark-side: with
    updates small it broadcasts, never shuffling the big current side.
    """
    base = snapshot(root)
    current = spark.read.parquet(*base.files)
    merged = current.join(
        updates.select(key).distinct(), key, "left_anti"
    ).unionByName(updates)
    files = _write_data_files(merged, root)
    # record the schema so later appends keep SchemaEvolutionError
    # validation (a schema-less manifest would disable the check)
    return _commit(
        root,
        "merge",
        files,
        base_version=base.version,
        schema=[[n, t] for n, t in merged.dtypes],
    )


# --- File skipping via manifest statistics (Delta-style data skipping) ----


def collect_file_stats(paths: list[str], cols: tuple[str, ...]) -> dict:
    """Per-file [min, max] for ``cols`` from the parquet FOOTERS — no data
    read. Cost is O(files), driver-side, paid once at commit; every
    pruned read amortizes it. Columns missing from a footer get no entry
    (readers must treat absent stats as "cannot skip")."""
    import pyarrow.parquet as pq

    stats: dict[str, dict[str, list]] = {}
    for path in paths:
        meta = pq.ParquetFile(path).metadata
        col_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        per_col: dict[str, list] = {}
        for col in cols:
            if col not in col_idx:
                continue
            lo = hi = None
            ok = True
            for rg in range(meta.num_row_groups):
                s = meta.row_group(rg).column(col_idx[col]).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if ok and lo is not None:
                per_col[col] = [lo, hi]
        if per_col:
            stats[path] = per_col
    return stats


def write_table_with_stats(
    df: DataFrame,
    root: str,
    stats_cols: tuple[str, ...],
    mode: str = "append",
) -> Snapshot:
    """``write_table`` + footer min/max stats recorded in the manifest so
    reads can skip files (``read_table_pruned``). Layout the data for
    skippability first — e.g. ``df.repartitionByRange(n, col)`` gives
    files disjoint ranges on ``col``; random layout yields stats that
    never exclude anything (correct, just not faster).

    Records the committed schema exactly like ``write_table`` — a
    stats-bearing commit must not become the manifest that silently
    disables ``SchemaEvolutionError`` validation for every later append
    (``_check_append_schema`` treats a schema-less base as "nothing to
    validate against")."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = _versions(root)
    base = versions[-1] if versions else 0
    if mode == "append":
        # validate BEFORE writing data files, same as write_table
        schema = _check_append_schema(root, base, df.dtypes)
    else:
        schema = [[n, t] for n, t in df.dtypes]
    new_files = _write_data_files(df, root)
    files, stats = list(new_files), collect_file_stats(new_files, stats_cols)
    if mode == "append" and base:
        prior = snapshot(root, base)
        files = list(prior.files) + files
        stats = {**_manifest_stats(root, base), **stats}
    return _commit(
        root, mode, files, base_version=base, schema=schema, stats=stats
    )


def _manifest_stats(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f).get("stats", {})


def read_table_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Read ``col BETWEEN lo AND hi`` skipping files whose manifest stats
    prove they cannot match. Files without stats for ``col`` are always
    read (skipping is an optimization, never a correctness filter), and
    the residual BETWEEN predicate still applies inside kept files — so
    results are identical to an unpruned filtered read, just with fewer
    files opened. This is manifest-level skipping ON TOP of parquet's
    own row-group pruning: at 100 TB it saves the file OPEN + footer
    round-trips, which dominate small-range point lookups."""
    snap = snapshot(root, version)
    stats = _manifest_stats(root, snap.version)
    keep = []
    for path in snap.files:
        s = stats.get(path, {}).get(col)
        if s is None or not (s[1] < lo or s[0] > hi):
            keep.append(path)
    from pyspark.sql import functions as F

    if not keep:
        empty = spark.read.parquet(*snap.files).limit(0)
        return empty
    return spark.read.parquet(*keep).where(F.col(col).between(lo, hi))


def compact(
    spark: SparkSession,
    root: str,
    target_files: int,
    stats_cols: tuple[str, ...] = (),
) -> Snapshot:
    """Rewrite the latest snapshot's many small files into
    ``target_files`` larger ones and commit the result as a new version
    (op="compact") with identical logical contents.

    The small-files problem is the dominant operational failure of
    streaming-append tables: a 1-minute trigger produces 1,440 commits/
    day, and scans pay per-file open + footer + scheduling overhead that
    eventually swamps the data read. Compaction is the fix, and the
    manifest design makes it SAFE under concurrency: the rewrite claims
    base+1 like any commit, so appends landing mid-compaction win or
    lose atomically (loser retries) and readers of older versions are
    untouched — their files are immutable until ``vacuum``. Pass
    ``stats_cols`` to re-derive skipping stats for the compacted layout
    (repartition by range on the stats column first for max effect).
    """
    base = snapshot(root)
    current = spark.read.parquet(*base.files)
    files = _write_data_files(current.repartition(target_files), root)
    stats = collect_file_stats(files, stats_cols) if stats_cols else {}
    os.makedirs(_manifest_dir(root), exist_ok=True)
    payload = json.dumps(
        {
            "version": base.version + 1,
            "op": "compact",
            "files": files,
            "n_files": len(files),
            "batch_id": None,
            "stats": stats,
            # logical contents are identical, so the schema carries over;
            # dropping it would disable append-time evolution validation
            "schema": _manifest_schema(root, base.version),
        }
    )
    path = _manifest_path(root, base.version + 1)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise CommitConflictError(
            f"version {base.version + 1} already committed under {root}"
        ) from exc
    with os.fdopen(fd, "w") as f:
        f.write(payload)
    return Snapshot(base.version + 1, "compact", tuple(files), None)
