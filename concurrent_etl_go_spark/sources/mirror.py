"""One-call table replication over the versioned-table primitives.

``mirror_table(src, dst)`` advances a downstream mirror to the source's
latest snapshot using the CHEAPEST valid mechanism per window:

- append-only source window -> forward just the delta files
  (``incremental_scan``, O(files added));
- non-append window (compact/overwrite/merge/restore upstream) -> CDC
  catch-up (``table_changes`` + ``apply_changes``) when a primary
  ``key`` is provided;
- everything else (first sync, keyless rewrites, windows with vacuumed
  source manifests) -> full overwrite rebuild, which is
  content-idempotent under retry and explicitly priced in the returned
  mode string.

Crash safety: every append/CDC commit carries the NEGATED source version
as its manifest ``batch_id`` (negative = the mirror's namespace, disjoint
from streaming epoch ids, which are >= 0).  On entry the mirror
fast-forwards its state past any source versions already committed to
the destination (scanning destination manifests newest-first until one
at-or-below the stated sync is reached — unbounded interleaved
streaming epochs cannot hide a crashed mirror commit), which makes the
commit-then-crash-then-more-upstream-commits schedule converge without
double-applying.  The append path is additionally idempotent at the
commit layer: ``append_prepared`` skips a ``batch_id`` that is already
committed, so two concurrent mirror runs replaying the SAME source
delta cannot double-append it.

This is the batch shape of a replication daemon: call it on a schedule
(or after each upstream commit notification) and the mirror converges.
At 100 TB the append path moves only new data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.sources import versioned as vt

def _state_path(dst_root: str) -> str:
    return os.path.join(dst_root, "_mirror_state.json")


def mirror_state(dst_root: str) -> dict:
    """{"src_version": int} of the source snapshot the mirror reflects;
    empty before the first sync (corrupt state degrades to a rebuild)."""
    try:
        with open(_state_path(dst_root)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def _write_state(dst_root: str, state: dict) -> None:
    tmp = _state_path(dst_root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(dst_root))


def _applied_src_versions(dst_root: str, since: int) -> set[int]:
    """Source versions > ``since`` already committed to dst (negative
    batch ids in destination manifests).

    Scans newest -> oldest and stops at the first mirror commit whose
    source version is <= ``since``: mirror commits land in increasing
    source-version order, so everything older cannot exceed ``since``.
    No fixed depth — mixed-writer destinations are supported, and any
    number of interleaved streaming epochs (batch_id >= 0) between a
    crashed mirror commit and the retry must not push it out of the scan
    window (a fixed window would re-append the same source delta and
    duplicate rows). A vacuumed (unreadable) manifest also stops the
    scan: vacuum keeps a newest-suffix, so nothing older is readable.
    Cost is O(commits since the last stated sync), not O(history)."""
    try:
        versions = vt._versions(dst_root)  # noqa: SLF001
    except FileNotFoundError:
        return set()
    out: set[int] = set()
    for v in reversed(versions):
        try:
            s = vt.snapshot(dst_root, v)
        except FileNotFoundError:
            break
        if s.batch_id is not None and s.batch_id < 0:
            if -s.batch_id <= since:
                break
            out.add(-s.batch_id)
    return out


def mirror_table(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    key: str | None = None,
    predicate: str | None = None,
) -> tuple[int, str]:
    """Advance ``dst_root`` to ``src_root``'s latest snapshot.

    Returns ``(source_version_reflected, mode)`` with mode one of
    ``noop`` / ``append`` / ``cdc`` / ``rebuild``.  See module docstring
    for the mechanism selection and crash-safety contract.

    ``predicate`` (a SQL boolean expression over the source columns)
    makes this a SELECTIVE replica — only matching rows replicate.  On
    the append path the filter applies to the delta (and pushes down to
    the delta-file scan); on the CDC path it applies to INSERTS only —
    deletes always pass through, so a row UPDATED out of the predicate
    is deleted from the replica, and one updated into it arrives (its
    delete is a key-based no-op).  Use the same predicate on every call:
    changing it between syncs does not retroactively re-filter rows
    already replicated (rebuild with the new predicate to converge).
    """
    state = mirror_state(dst_root)
    since = state.get("src_version")
    snap = vt.snapshot(src_root)

    # crash-retry fast-forward: skip source versions a previous attempt
    # already committed to dst before dying pre-state-write
    if since is not None:
        applied = _applied_src_versions(dst_root, since)
        newer = [v for v in applied if since < v <= snap.version]
        if newer:
            since = max(newer)
    if since == snap.version:
        _write_state(dst_root, {"src_version": snap.version})
        return snap.version, "noop"

    mode = None
    if since is not None:
        try:
            delta, snap = vt.incremental_scan(spark, src_root, since)
            if delta is None:
                _write_state(dst_root, {"src_version": snap.version})
                return snap.version, "noop"
            if predicate is not None:
                delta = delta.where(F.expr(predicate))
            files = vt._write_data_files(delta, dst_root)  # noqa: SLF001
            vt.append_prepared(
                dst_root,
                files,
                batch_id=-snap.version,
                dtypes=delta.dtypes,
            )
            mode = "append"
        except ValueError:
            if key is not None:
                try:
                    changes = vt.table_changes(
                        spark, src_root, since, snap.version
                    )
                    if predicate is not None:
                        # inserts are filtered; deletes always pass so a
                        # row updated out of the predicate leaves the
                        # replica (its key-based delete applies)
                        changes = changes.where(
                            (F.col("_change_type") == "delete")
                            | F.expr(predicate)
                        )
                    vt.apply_changes(
                        spark,
                        dst_root,
                        changes,
                        key=key,
                        batch_id=-snap.version,
                    )
                    mode = "cdc"
                except FileNotFoundError:
                    # the window's source manifests were vacuumed — CDC
                    # cannot reconstruct it; fall through to rebuild
                    mode = None
    if mode is None:
        # first sync, a keyless rewrite, or a vacuumed window: full copy
        # PINNED at the resolved snapshot (reading unpinned "latest"
        # could fold in a concurrent newer commit while state records
        # snap.version, double-applying it next sync). Overwrite is
        # content-idempotent — a crashed retry just redoes it.
        full = vt.read_table_version(spark, src_root, snap.version)
        if predicate is not None:
            full = full.where(F.expr(predicate))
        vt.write_table(full, dst_root, mode="overwrite")
        mode = "rebuild"

    _write_state(dst_root, {"src_version": snap.version})
    return snap.version, mode
