"""Source readers — lazy, splittable, explicit-schema.

The reference eagerly materializes its whole CSV input in driver memory
(``r.ReadAll()``, reference etl/main.go:408) — the canonical anti-pattern at
100 TB. Every reader here is a lazy Spark scan: splittable, predicate- and
projection-pushdown-capable, never driver-materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import AnalysisException

from concurrent_etl_go_spark import schemas

#: Per-path cache of parquet-footer timestamp[ns] column names.  Almost
#: every table has bigint columns, so without this every query build pays
#: a driver-side pyarrow footer read per table.  Keyed by path only: the
#: testdata is immutable within a process lifetime (the driver regenerates
#: it only between rounds, i.e. between processes).
_NS_COLS_CACHE: dict[str, frozenset[str]] = {}


def _footer_ns_cols(path: str) -> frozenset[str]:
    """timestamp[ns] columns per the parquet footer, memoized by path."""
    cols = _NS_COLS_CACHE.get(path)
    if cols is None:
        import pyarrow.parquet as pq

        cols = frozenset(
            f.name for f in pq.read_schema(path) if str(f.type) == "timestamp[ns]"
        )
        _NS_COLS_CACHE[path] = cols
    return cols


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one shared analytics parquet table (TESTDATA.md).

    Handles TIMESTAMP(NANOS) parquet columns, which Spark rejects by
    default: on PARQUET_TYPE_ILLEGAL the read retries with
    ``nanosAsLong`` and converts the raw nanosecond longs to microsecond
    timestamps with integer division (a double division would lose
    precision: epoch-nanos exceed the 53-bit double mantissa). Truncation
    to microseconds matches how DuckDB/Arrow read the same files.
    """
    # The engine's timestamp semantics are UTC everywhere (window alignment,
    # epoch extraction, literal parsing, Arrow conversion). Pin it here so
    # results don't depend on the caller's session timezone.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except AnalysisException as exc:
        if "PARQUET_TYPE_ILLEGAL" not in str(exc):
            raise
        # Session-level knob; deliberately left set — it only changes how
        # nanos-parquet is read, which always needs the conversion below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)

    # Columns that are timestamp[ns] in the footer surface as bigint under
    # nanosAsLong (including on the first attempt once the conf is set) —
    # always reconcile against the footer, not just on the retry path.
    long_cols = {n for n, t in df.dtypes if t == "bigint"}
    if long_cols:
        for c in _footer_ns_cols(path) & long_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))

    # tz-naive parquet timestamps (timestamp[us/ms] without isAdjustedToUTC)
    # surface as TIMESTAMP_NTZ. The engine's contract is TIMESTAMP (ltz)
    # under the UTC-pinned session everywhere — the type the nanos path
    # above produces, and the one epoch/interval functions (unix_micros,
    # casts to double) accept. With the session at UTC this cast is a pure
    # reinterpretation: same wall-clock, same epoch value.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=schemas.TABLES) -> None:
    """Register the shared tables as temp views for ``spark.sql`` queries."""
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_binary_files(
    spark: SparkSession,
    path: str,
    pattern: str = "*",
    recursive: bool = False,
) -> DataFrame:
    """Raw-file ingestion for multimodal pipelines: every matching file
    becomes one row ``(path, modificationTime, length, content)`` via
    Spark's built-in ``binaryFile`` source — the standard front door for
    media sitting as loose objects (images, audio, video) rather than
    rows in a columnar table.

    Feeds directly into the decode pipeline:
    ``read_binary_files(...)`` -> ``llm.multimodal.with_media_meta`` ->
    ``extract_features`` (Arrow-batched mapInPandas).  At scale the
    source parallelizes by file and prunes on ``pathGlobFilter`` at
    listing time; content bytes only move for matched files.  Column
    pruning applies too: a query selecting only ``path``/``length``
    never reads file contents.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    pattern: str = "*",
    whole_files: bool = True,
) -> DataFrame:
    """Raw text-file ingestion for corpus pipelines: with
    ``whole_files=True`` (default) every matching file becomes ONE row
    ``(path, text)`` — the loose-object front door for documents, the
    text twin of ``read_binary_files`` — otherwise one row per LINE
    (``(path, text)``), the log-file shape.

    Output feeds the documents-pipeline operators directly (text_stats /
    quality / dedup take any (id, text) frame).  Scale: parallelizes by
    file (whole-file mode makes one task per file — fine for documents,
    wrong for a single giant file), glob-prunes at listing time, and
    carries the path for lineage/doc-id derivation.
    """
    df = (
        spark.read.option("pathGlobFilter", pattern)
        .text(path, wholetext=whole_files)
        .select(F.col("value").alias("text"))
        .withColumn("path", F.input_file_name())
    )
    return df.select("path", "text")


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
) -> DataFrame:
    """XML scan (native since Spark 4 — no spark-xml jar needed): one row
    per ``row_tag`` element.  Pass an explicit ``schema`` DDL string in
    production — schema inference costs a full extra pass over the data,
    exactly like the CSV/JSON readers."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.xml(path)


def read_appliances_csv(spark: SparkSession, path: str) -> DataFrame:
    """Scan the reference's headerless positional appliance CSV.

    Parity with reference etl/main.go:400-425 (scan S1, malformed-row filter
    S2, positional projection S3): rows with fewer than 2 fields are dropped;
    extra fields beyond the first two are ignored.

    Implemented as a permissive CSV read followed by a null filter — the
    filter is a Catalyst predicate, so malformed-row handling costs nothing
    extra at scale (no Python in the loop).
    """
    raw = (
        spark.read.schema("ip string, hostname string")
        .option("mode", "PERMISSIVE")
        .option("enforceSchema", "true")
        .csv(path)
    )
    # <2 fields => hostname is null (reference drops these, etl/main.go:414-417)
    return raw.where(F.col("ip").isNotNull() & F.col("hostname").isNotNull())


def read_cpu_stats_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a cpu_stats CSV keeping numerics as strings (FIXTURES.md A2).

    Mirrors the reference's wire format (etl/main.go:32-41): the cast to
    double happens downstream with zero-on-failure semantics.
    """
    return spark.read.schema(schemas.CPU_STATS).option("header", "true").csv(path)
