"""Lakehouse connectors (Delta / Iceberg / Hudi) — import-gated stubs.

The v1 image ships none of the lakehouse jars (SURVEY §"Sources & sinks"),
so these connectors probe for their packages and fail loudly with the
exact dependency needed rather than at some later executor stack trace.
The read/write signatures are final; only the jar is missing.

For the table-management semantics themselves — versioned snapshots,
atomic commits, time travel, vacuum — see ``sources/versioned.py``: a
dependency-free implementation of the same manifest-over-immutable-files
design that runs and tests end-to-end in this image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class MissingConnectorError(ImportError):
    """Raised when a lakehouse format's jars are not on the classpath."""


def _probe(spark: SparkSession, fmt: str, package_hint: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            {
                "delta": "org.apache.spark.sql.delta.DeltaLog",
                "iceberg": "org.apache.iceberg.Table",
                "hudi": "org.apache.hudi.DataSourceReadOptions",
            }[fmt]
        )
    except Exception as exc:
        raise MissingConnectorError(
            f"{fmt} support requires its runtime jar on the Spark classpath "
            f"(spark.jars.packages={package_hint}); not present in this "
            "environment"
        ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _probe(spark, "delta", "io.delta:delta-spark_2.13:<version>")
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _probe(spark, "iceberg", "org.apache.iceberg:iceberg-spark-runtime-<ver>")
    return spark.read.format("iceberg").load(table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    _probe(spark, "hudi", "org.apache.hudi:hudi-spark-bundle_2.13:<version>")
    return spark.read.format("hudi").load(path)


_AVRO_HINT = (
    "avro support requires the external module jar on the Spark classpath "
    "(spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark-version>); "
    "not present in this environment"
)


def _raise_if_avro_missing(exc: Exception) -> None:
    """Map Spark's 'Failed to find data source: avro' analysis error to
    the loud connector error (some avro CLASSES ship inside Spark even
    when the data-source module jar is absent, so a classpath probe alone
    is not a reliable presence test — the source lookup is)."""
    if "Failed to find data source" in str(exc):
        raise MissingConnectorError(_AVRO_HINT) from exc
    raise exc


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — the standard row-oriented wire/landing format next to
    the columnar lake formats (built-in-but-external since Spark 2.4, so
    absence fails loudly like the table formats above)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # noqa: BLE001 — re-raise unless it's absence
        _raise_if_avro_missing(exc)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:  # noqa: BLE001 — re-raise unless it's absence
        _raise_if_avro_missing(exc)
