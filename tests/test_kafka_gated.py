"""Kafka connector gate + one-file-drop escape hatch (VERDICT r12 §8).

The sandbox has no Kafka jar and no network, so ``kafka_stream`` is
gated behind a loud ``MissingConnectorError``.  These tests pin both
sides of the gate:

- WITHOUT the jar: the error is raised and names the exact package to
  add — a user is one ``SPARK_GRAFT_EXTRA_JARS=/path/to/jar`` away
  (see ``session.get_spark``).
- WITH the jar (skipped here, runs wherever the jar is dropped): the
  real connector's readStream frame carries the exact wire schema the
  engine's pipelines are written against, so everything tested via
  ``kafka_wire_stream`` runs unchanged on real Kafka.
"""

from __future__ import annotations

import pytest

from concurrent_etl_go_spark.sources.lakehouse import MissingConnectorError
from concurrent_etl_go_spark.streaming.pipelines import (
    kafka_stream,
    kafka_wire_stream,
)

#: The Kafka source's fixed wire columns (Spark structured streaming
#: Kafka integration, public API).
_WIRE_COLS = {"key", "value", "topic", "partition", "offset", "timestamp"}


def _kafka_class_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def test_kafka_gate_is_loud_and_names_the_package(spark):
    if _kafka_class_present(spark):
        pytest.skip("kafka jar present — gate not applicable here")
    with pytest.raises(MissingConnectorError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events")


def test_kafka_real_connector_wire_schema(spark):
    """Runs only where the connector jar is on the classpath (drop a
    local jar and set SPARK_GRAFT_EXTRA_JARS).  ``load()`` does not
    contact a broker — the Kafka source's schema is static — so this
    verifies the real connector emits the wire shape the engine's
    pipelines (and ``kafka_wire_stream`` tests) are written against."""
    if not _kafka_class_present(spark):
        pytest.skip(
            "kafka connector jar not on classpath; set "
            "SPARK_GRAFT_EXTRA_JARS=/path/to/spark-sql-kafka jar to enable"
        )
    df = kafka_stream(spark, "localhost:9092", "events")
    assert _WIRE_COLS <= set(df.columns)


def test_wire_double_matches_kafka_wire_columns(spark):
    """The test double must present exactly the wire columns, so code
    proven against it cannot depend on anything real Kafka lacks."""
    df = kafka_wire_stream(spark, rows_per_batch=10)
    assert set(df.columns) == _WIRE_COLS
