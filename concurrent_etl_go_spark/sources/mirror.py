"""One-call table replication over the versioned-table primitives.

``mirror_table(src, dst)`` advances a downstream mirror to the source's
latest snapshot using the CHEAPEST valid mechanism per window:

- append-only source window -> forward just the delta files
  (``incremental_scan``, O(files added)), committed with the SOURCE
  VERSION as the streaming-style idempotence key so a crash between the
  dst commit and the state write is detected on retry
  (``committed_batch_ids``) instead of double-appending;
- non-append window (compact/overwrite/merge/restore upstream, or
  vacuumed manifests) -> CDC catch-up (``table_changes`` +
  ``apply_changes``) when a primary ``key`` is provided, likewise
  version-keyed for retry safety;
- no usable window (first sync, or no key for a rewritten window) ->
  full overwrite rebuild, which is content-idempotent under retry.

This is the batch shape of a replication daemon: call it on a schedule
(or after each upstream commit notification) and the mirror converges.
At 100 TB the append path moves only new data; rebuilds are the
explicitly-priced fallback, surfaced in the returned mode string.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

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


def mirror_table(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    key: str | None = None,
) -> tuple[int, str]:
    """Advance ``dst_root`` to ``src_root``'s latest snapshot.

    Returns ``(source_version_reflected, mode)`` with mode one of
    ``noop`` / ``append`` / ``cdc`` / ``rebuild``.  See module docstring
    for the mechanism selection and crash-safety contract.
    """
    state = mirror_state(dst_root)
    since = state.get("src_version")
    snap = vt.snapshot(src_root)
    if since == snap.version:
        return snap.version, "noop"

    # crash-retry detection: the previous attempt committed this source
    # version into dst but died before the state write
    committed = (
        vt.committed_batch_ids(dst_root) if os.path.isdir(dst_root) else set()
    )
    if snap.version in committed:
        _write_state(dst_root, {"src_version": snap.version})
        return snap.version, "noop"

    mode = None
    if since is not None:
        try:
            delta, snap = vt.incremental_scan(spark, src_root, since)
            if delta is None:
                _write_state(dst_root, {"src_version": snap.version})
                return snap.version, "noop"
            files = vt._write_data_files(delta, dst_root)  # noqa: SLF001
            vt.append_prepared(dst_root, files, batch_id=snap.version)
            mode = "append"
        except ValueError:
            if key is not None:
                changes = vt.table_changes(
                    spark, src_root, since, snap.version
                )
                vt.apply_changes(
                    spark, dst_root, changes, key=key, batch_id=snap.version
                )
                mode = "cdc"
    if mode is None:
        # first sync, or a rewritten window with no key: full copy.
        # Overwrite is content-idempotent — a crashed retry redoes it.
        full = vt.read_table_version(spark, src_root)
        vt.write_table(full, dst_root, mode="overwrite")
        mode = "rebuild"

    _write_state(dst_root, {"src_version": snap.version})
    return snap.version, mode
