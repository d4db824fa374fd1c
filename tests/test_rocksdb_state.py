"""RocksDB state-store provider under the stateful sessionizer
(VERDICT r13 §Next #5 — the one 100 TB streaming lever not yet
exercised).

Streaming state at 100 TB outgrows executor heap; SURVEY §7.5 names the
RocksDB provider (bundled with Spark since 3.2, local-disk state with an
in-memory cache) as the scale path.  The session factory wires it via
``SPARK_GRAFT_ROCKSDB_STATE=1`` or ``enable_rocksdb_state``; this test
proves the engine's stateful sessionizer produces IDENTICAL results
under the RocksDB provider as under the default HDFS-backed provider,
and that RocksDB was genuinely engaged (provider conf + rocksdb custom
metrics in the query progress).

Gated the same way as tests/test_kafka_gated.py: if the rocksdbjni
native bundle is absent from the Spark distribution (some minimal
installs strip it), the test SKIPS loudly instead of failing.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from concurrent_etl_go_spark.session import ROCKSDB_PROVIDER
from concurrent_etl_go_spark.sources.readers import read_table
from concurrent_etl_go_spark.streaming import sessionize_stateful
from tests.conftest import SF_SMOKE


def _rocksdb_available() -> bool:
    import pyspark

    jars = os.path.join(pyspark.__path__[0], "jars")
    return bool(glob.glob(os.path.join(jars, "rocksdbjni-*.jar")))


requires_rocksdb = pytest.mark.skipif(
    not _rocksdb_available(),
    reason=(
        "rocksdbjni jar not bundled with this Spark distribution — "
        "RocksDB state-store test skipped (set up a full Spark install "
        "or add the jar via SPARK_GRAFT_EXTRA_JARS to exercise it)"
    ),
)


@requires_rocksdb
def test_sessionizer_under_rocksdb_matches_batch(spark, tmp_path):
    """Same streaming==batch equality the HDFS-provider tests prove,
    but with state held in RocksDB: 3 interleaved micro-batches of the
    sf0.001 events table, final per-user session state equals the batch
    gaps-and-islands sessionization user for user."""
    from tests.test_streaming_sessions import _batch_summary, _final_state

    ev = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id"
    )
    d = str(tmp_path / "rocksstream")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).select(
            "user_id", "ts"
        ).coalesce(1).write.mode("append").parquet(d)

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        sdf = (
            spark.readStream.schema(ev.select("user_id", "ts").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        q = (
            sessionize_stateful(sdf)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("t_sess_rocksdb")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            progress = q.lastProgress
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    got = _final_state(spark.sql("SELECT * FROM t_sess_rocksdb"))
    want = _batch_summary(ev)
    assert got == want
    assert got and any(v[0] > 1 for v in got.values()), (
        "non-degenerate: some user must have >1 session"
    )

    # prove RocksDB was genuinely engaged, not silently fallen back:
    # the RocksDB provider reports rocksdb* custom metrics per stateful
    # operator in the streaming progress
    ops = (progress or {}).get("stateOperators") or []
    assert ops, "expected a stateful operator in the progress"
    custom = ops[0].get("customMetrics") or {}
    rocks_keys = [k for k in custom if k.lower().startswith("rocksdb")]
    assert rocks_keys, (
        f"no rocksdb custom metrics in progress — provider not engaged? "
        f"metrics: {sorted(custom)}"
    )
    # and the on-disk state layout is RocksDB's (zip snapshots /
    # changelogs, not the HDFS provider's .delta files)
    state_files = glob.glob(
        str(tmp_path / "ckpt" / "state" / "**" / "*"), recursive=True
    )
    assert not any(f.endswith(".delta") for f in state_files), (
        "HDFS-provider .delta files present — RocksDB not used"
    )
