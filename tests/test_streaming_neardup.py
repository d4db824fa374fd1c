"""Streaming near-dup gate == batch match-any-predecessor dedup.

The gate (``streaming/neardup.py``) must produce, for documents arriving
in doc_id order, EXACTLY the flags of the batch rule "doc b is a dup iff
it verifies against some a < b" — which is what
``minhash_lsh_pairs(threshold=0.5)``'s (id_a < id_b) pairs project to.
Proven on the real corpus, under a clean drain AND under kill-restart
(the ledger + per-epoch-overwrite state must make replays idempotent).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.dedup import minhash_lsh_pairs
from concurrent_etl_go_spark.sources.readers import read_table
from concurrent_etl_go_spark.streaming.neardup import (
    gate_decisions,
    neardup_gate_stream,
)
from tests.conftest import SF_SMOKE

THRESHOLD = 0.5
N_FILES = 3


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def batch_flags(spark, docs):
    """The batch twin: dup iff some verified pair has a smaller id."""
    pairs = minhash_lsh_pairs(docs, threshold=THRESHOLD)
    dup_ids = {
        r.id_b for r in pairs.select("id_b").distinct().collect()
    }
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    from concurrent_etl_go_spark.operators.registry import release_caches

    release_caches()
    return {i: (1 if i in dup_ids else 0) for i in all_ids}


def _write_ordered_files(spark, docs, src_dir: str) -> None:
    """Three files, tertiles of the doc_id order, mtimes increasing so
    the file source processes them in arrival(=doc_id) order."""
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [
        ids[len(ids) // 3],
        ids[2 * len(ids) // 3],
    ]
    parts = [
        docs.where(F.col("doc_id") < cuts[0]),
        docs.where(
            (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
        ),
        docs.where(F.col("doc_id") >= cuts[1]),
    ]
    stamped: set[str] = set()
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("append").parquet(src_dir)
        # stamp ONLY this round's new files with a strictly-increasing
        # mtime so the file source processes them in arrival order
        for f in sorted(os.listdir(src_dir)):
            if f.endswith(".parquet") and f not in stamped:
                p = os.path.join(src_dir, f)
                st = os.stat(p)
                os.utime(p, (st.st_atime, 1_700_000_000 + i))
                stamped.add(f)
        time.sleep(0.05)


def _start_gate(spark, src_dir, state, ck):
    schema = spark.read.parquet(src_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return neardup_gate_stream(sdf, state, ck, threshold=THRESHOLD)


def _flags(spark, state) -> dict[int, int]:
    return {
        r.doc_id: r.is_dup
        for r in gate_decisions(spark, state).collect()
    }


def test_gate_clean_drain_equals_batch(
    spark, tmp_path, docs, batch_flags
):
    src = str(tmp_path / "src")
    _write_ordered_files(spark, docs, src)
    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    q = _start_gate(spark, src, state, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _flags(spark, state)
    assert len(got) == len(batch_flags)
    diff = {k for k in batch_flags if got.get(k) != batch_flags[k]}
    assert not diff, f"{len(diff)} flag mismatches, e.g. {sorted(diff)[:5]}"
    # every epoch committed exactly once
    assert len(os.listdir(os.path.join(state, "ledger"))) == N_FILES


def test_gate_kill_restart_equals_batch(
    spark, tmp_path, docs, batch_flags
):
    """Stop after the first epoch, restart from the checkpoint, drain:
    flags still equal the batch rule and no state row is duplicated."""
    src = str(tmp_path / "src")
    _write_ordered_files(spark, docs, src)
    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    ledger = os.path.join(state, "ledger")
    q = _start_gate(spark, src, state, ck)
    try:
        deadline = time.monotonic() + 120
        while (
            not os.path.isdir(ledger) or not os.listdir(ledger)
        ) and time.monotonic() < deadline:
            time.sleep(0.2)
        assert os.path.isdir(ledger) and os.listdir(ledger)
    finally:
        q.stop()
    assert len(os.listdir(ledger)) < N_FILES, "kill came too late"

    q = _start_gate(spark, src, state, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _flags(spark, state)
    assert got == batch_flags
    # the settled fingerprint state holds each doc exactly once
    from concurrent_etl_go_spark.streaming.neardup import (
        _SH_SCHEMA,
        _read_state,
    )

    ids = [r.id for r in _read_state(spark, state, "sh", _SH_SCHEMA).select("id").collect()]
    assert len(ids) == len(set(ids))


def test_gate_partial_commit_replay_not_all_dup(
    spark, tmp_path, docs, batch_flags
):
    """ADVICE r12 (high): crash AFTER an epoch's sh/bands/decisions land
    but BEFORE the ledger marker.  The replay must NOT read the crashed
    attempt's own fingerprints as settled state — self-pairs at
    Jaccard 1.0 would flag every document in the batch as a duplicate."""
    src = str(tmp_path / "src2")
    _write_ordered_files(spark, docs, src)
    state, ck = str(tmp_path / "state2"), str(tmp_path / "ck2")
    q = _start_gate(spark, src, state, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _flags(spark, state) == batch_flags
    # simulate the crash window for the LAST epoch: state directories
    # written, ledger marker and engine commit both missing -> the
    # restarted query replays the epoch with its own stale state on disk
    last = N_FILES - 1
    os.remove(os.path.join(state, "ledger", f"epoch-{last}.done"))
    os.remove(os.path.join(ck, "commits", str(last)))
    crc = os.path.join(ck, "commits", f".{last}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar
        os.remove(crc)
    q = _start_gate(spark, src, state, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _flags(spark, state) == batch_flags, (
        "replay after partial commit changed decisions (self-pair bug)"
    )


def test_gate_replayed_epoch_is_idempotent(spark, tmp_path, docs):
    """Deleting the checkpoint (full replay) with the ledger intact must
    leave decisions and state untouched."""
    import shutil

    sub = docs.limit(50)
    src = str(tmp_path / "src1")
    sub.coalesce(1).write.parquet(src)
    state, ck = str(tmp_path / "state1"), str(tmp_path / "ck1")
    q = _start_gate(spark, src, state, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    before = _flags(spark, state)
    mtimes = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_mtime
        for d, _, fs in os.walk(os.path.join(state, "decisions"))
        for f in fs
    }
    shutil.rmtree(ck)
    q = _start_gate(spark, src, state, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _flags(spark, state) == before
    after = {
        os.path.join(d, f): os.stat(os.path.join(d, f)).st_mtime
        for d, _, fs in os.walk(os.path.join(state, "decisions"))
        for f in fs
    }
    assert after == mtimes, "ledger-committed epoch re-ran its writes"
