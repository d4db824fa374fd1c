"""SparkSession factory tuned for the engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
same configuration is cluster-safe: AQE handles partition coalescing and
skew joins at scale, the session timezone is pinned to UTC so timestamp
semantics are stable across drivers/executors (and match the DuckDB oracle),
and Arrow is enabled for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "concurrent-etl-go-spark"

#: Bundled with Spark since 3.2 — no extra jar needed. RocksDB keeps
#: streaming state on local disk with an in-memory cache, so stateful
#: queries (applyInPandasWithState, streaming dedup, session windows)
#: survive state far larger than executor heap — the 100 TB-scale choice.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state(spark: SparkSession) -> None:
    """Switch streaming state to the RocksDB provider for queries started
    after this call (the provider is read at query start). Also settable
    at session build time via ``SPARK_GRAFT_ROCKSDB_STATE=1``."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults favor Catalyst doing the work: AQE on (runtime partition
    coalescing, skew-join splitting, dynamic join strategy), UTC session
    timezone, Arrow transfer for Pandas interchange.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Let AQE re-plan the output partitioning of persisted plans:
        # cached subtrees otherwise pin their pre-AQE partition count
        # (default false), so every scoped_persist'd dimension-scale
        # frame kept one partition per core and every downstream stage
        # over it launched that many tasks for microseconds of work —
        # measured 1.7 s/round -> ~0.4 s/round on the PPR kernel at
        # sf0.1.  Size-adaptive, not core-count-tuned: AQE's coalescing
        # (parallelismFirst default) still keeps parallelism for
        # anything above its 1 MB minimum partition size, so real data
        # keeps real parallelism at any scale.  (A/B note, round 15:
        # coalescePartitions.parallelismFirst=false was measured 1.4x
        # WORSE across the heavy bench subset — byte-targeted 64 MB
        # coalescing serializes compute-dense explode stages whose
        # bytes-per-CPU-second are tiny — so it stays at default.)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Kafka (or any connector) jar escape hatch: point at local jar
    # path(s) and the real connector loads without a network fetch —
    # e.g. SPARK_GRAFT_EXTRA_JARS=/opt/jars/spark-sql-kafka-0-10_2.13-4.0.0.jar
    # (comma-separated).  The probe in streaming.kafka_stream then
    # passes and tests/test_kafka_gated.py's real-connector test
    # un-skips.
    extra_jars = os.environ.get("SPARK_GRAFT_EXTRA_JARS", "")
    if extra_jars:
        builder = builder.config("spark.jars", extra_jars)
    if os.environ.get("SPARK_GRAFT_ROCKSDB_STATE", "").lower() in ("1", "true"):
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
