"""Tests for the UDF registration surface and file sinks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from concurrent_etl_go_spark.functions.udfs import (
    register_pandas_udf,
    register_python_udf,
)
from concurrent_etl_go_spark.sinks.files import (
    write_csv,
    write_json_gzip,
    write_parquet,
)
from concurrent_etl_go_spark.sources.readers import read_table
from tests.conftest import SF_SMOKE


def test_pandas_udf_registration_dataframe_and_sql(spark):
    def softcap(s: pd.Series) -> pd.Series:
        return s.clip(upper=100.0)

    udf = register_pandas_udf(spark, "softcap", softcap, "double")
    events = read_table(spark, SF_SMOKE, "events")
    via_df = events.select(udf("value").alias("v")).agg(F.max("v")).collect()[0][0]
    events.createOrReplaceTempView("events")
    via_sql = spark.sql("SELECT MAX(softcap(value)) FROM events").collect()[0][0]
    assert via_df == via_sql <= 100.0


def test_python_udf_registration(spark):
    register_python_udf(spark, "shout", lambda s: (s or "") + "!", "string")
    docs = read_table(spark, SF_SMOKE, "documents").limit(5)
    docs.createOrReplaceTempView("docs5")
    rows = spark.sql("SELECT shout(lang) AS l FROM docs5").collect()
    assert all(r.l.endswith("!") for r in rows)


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    events = read_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(events, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # partition pruning: reading one partition scans only that directory
    one = spark.read.parquet(out).where(F.col("event_type") == "click")
    expected = events.where(F.col("event_type") == "click").count()
    assert one.count() == expected
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_csv_and_json_gzip_roundtrip(spark, tmp_path):
    nation = read_table(spark, SF_SMOKE, "nation")
    csv_out = str(tmp_path / "nation_csv")
    write_csv(nation, csv_out)
    back_csv = spark.read.option("header", "true").schema(nation.schema).csv(csv_out)
    assert back_csv.count() == 25

    json_out = str(tmp_path / "nation_json")
    write_json_gzip(nation, json_out)
    back_json = spark.read.schema(nation.schema).json(json_out)
    assert back_json.count() == 25
    import glob

    assert glob.glob(f"{json_out}/*.json.gz"), "expected gzip json part files"


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round-trip (builtin format, no external jar): values survive,
    partition pruning and predicate pushdown reach the ORC scan just as
    they do for parquet."""
    from concurrent_etl_go_spark.sinks.files import write_orc

    events = read_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_orc")
    write_orc(events, out, partition_by=["event_type"])
    back = spark.read.orc(out)
    assert back.count() == events.count()

    one = back.where((F.col("event_type") == "click") & (F.col("value") > 50))
    expected = events.where(
        (F.col("event_type") == "click") & (F.col("value") > 50)
    ).count()
    assert one.count() == expected
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert "PushedFilters: [" in plan and "value" in plan.split("PushedFilters")[1][:120]


def test_pandas_udaf_in_dataframe_and_sql(spark):
    """Grouped-agg pandas UDAF works in agg() and SQL GROUP BY."""
    import pandas as pd

    from concurrent_etl_go_spark.functions.udfs import register_pandas_udaf

    def mean_sq(v: pd.Series) -> float:
        return float((v**2).mean())

    udaf = register_pandas_udaf(spark, "mean_sq", mean_sq, "double")
    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (2, 3.0)], "k int, v double"
    )
    got = {r.k: r.m for r in df.groupBy("k").agg(udaf("v").alias("m")).collect()}
    assert got == {1: 10.0, 2: 9.0}
    df.createOrReplaceTempView("udaf_t")
    got_sql = {
        r.k: r.m
        for r in spark.sql(
            "SELECT k, mean_sq(v) AS m FROM udaf_t GROUP BY k"
        ).collect()
    }
    assert got_sql == got


def test_udtf_registered_and_callable_from_sql(spark):
    """A UDTF yields multiple rows per input and is callable as a SQL
    table source."""
    from concurrent_etl_go_spark.functions.udfs import register_udtf

    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield (i, w)

    register_udtf(spark, "split_words", SplitWords, "pos int, word string")
    rows = spark.sql("SELECT * FROM split_words('a b c')").collect()
    assert [(r.pos, r.word) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_binary_file_ingestion_feeds_multimodal_decode(spark, tmp_path):
    """The loose-object front door: media files on disk -> binaryFile
    rows -> typed metadata -> REAL stdlib decode via mapInPandas, with
    exact pixel/sample stats. Also pins glob pruning (non-matching files
    never enter the frame)."""
    import struct
    import wave

    from concurrent_etl_go_spark.llm.multimodal import (
        extract_features,
        with_media_meta,
    )
    from concurrent_etl_go_spark.sources.readers import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    # two P5 grayscale images with known pixels
    for name, px in (("a.pgm", [0, 100, 200, 255]), ("b.pgm", [10, 20, 30, 40])):
        (media / name).write_bytes(b"P5\n2 2\n255\n" + bytes(px))
    # one WAV (mono 16-bit, 4 known samples) and one decoy the glob skips
    with wave.open(str(media / "c.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 0, 1000, -1000, 500))
    (media / "notes.txt").write_bytes(b"not media")

    imgs = read_binary_files(spark, str(media), pattern="*.pgm")
    assert imgs.count() == 2
    assert {c for c in imgs.columns} >= {"path", "length", "content"}

    # FEATURE_SCHEMA keys rows by a LONG doc_id (the documents-table
    # convention): derive one from the filename
    named = imgs.select(
        F.when(F.col("path").endswith("a.pgm"), F.lit(1))
        .otherwise(F.lit(2))
        .cast("long")
        .alias("doc_id"),
        "content",
    )
    feats = extract_features(
        with_media_meta(named, "content", "image/x-portable-graymap"),
        binary_col="content",
    )
    rows = {r.doc_id: r.feature for r in feats.collect()}
    # decode_auto_features returns [width, height, mean, std]
    assert rows[1][0:2] == [2.0, 2.0]
    assert rows[1][2] == (0 + 100 + 200 + 255) / 4.0
    assert rows[2][2] == 25.0

    # the WAV ingests through the same pipeline with a different glob
    wavs = read_binary_files(spark, str(media), pattern="*.wav")
    assert wavs.count() == 1
    wf = extract_features(
        with_media_meta(
            wavs.select(F.lit(3).cast("long").alias("doc_id"), "content"),
            "content",
            "audio/wav",
        ),
        binary_col="content",
    ).collect()[0].feature
    assert wf, "WAV decode produced features"

    # column pruning: selecting only path/length must not read contents
    plan = (
        read_binary_files(spark, str(media), pattern="*.pgm")
        .select("path", "length")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "content" not in plan.split("ReadSchema")[-1]


def test_text_corpus_ingestion_feeds_text_pipeline(spark, tmp_path):
    """Loose text files -> (path, text) rows -> the documents-pipeline
    operators; whole-file vs per-line modes, glob pruning."""
    from concurrent_etl_go_spark.sources.readers import read_text_corpus

    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.txt").write_text("the quick brown fox\njumps over the dog")
    (docs / "b.txt").write_text("hello corpus world")
    (docs / "skip.md").write_text("not ingested")

    whole = read_text_corpus(spark, str(docs), pattern="*.txt")
    rows = {r.path.split("/")[-1]: r.text for r in whole.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert "jumps over the dog" in rows["a.txt"]  # newline kept in-file

    # the frame drops straight into a text-analysis shape
    stats = whole.select(
        F.col("path"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    got = {r.path.split("/")[-1]: r.n_tokens for r in stats.collect()}
    assert got == {"a.txt": 8, "b.txt": 3}

    lines = read_text_corpus(
        spark, str(docs), pattern="a.txt", whole_files=False
    )
    assert lines.count() == 2  # one row per line in line mode


def test_avro_is_import_gated_with_loud_error(spark, tmp_path):
    """No spark-avro jar ships in this image: the helpers must raise
    MissingConnectorError naming the package, like the lakehouse stubs."""
    import pytest

    from concurrent_etl_go_spark.sources.lakehouse import (
        MissingConnectorError,
        read_avro,
        write_avro,
    )

    with pytest.raises(MissingConnectorError) as exc:
        read_avro(spark, str(tmp_path / "nope.avro"))
    assert "spark-avro" in str(exc.value)
    with pytest.raises(MissingConnectorError):
        write_avro(spark.range(3), str(tmp_path / "out.avro"))


def test_xml_roundtrip_native(spark, tmp_path):
    """Spark 4 ships XML natively (no spark-xml jar): write a slice of
    the shared nation table out as XML and read it back identically,
    with an explicit schema (no inference pass)."""
    from concurrent_etl_go_spark.sources.readers import read_xml

    out = str(tmp_path / "xml")
    nation = read_table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name"
    )
    nation.write.mode("overwrite").option("rowTag", "nation").xml(out)

    back = read_xml(
        spark, out, row_tag="nation",
        schema="n_nationkey long, n_name string",
    )
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == \
        sorted((r.n_nationkey, r.n_name) for r in nation.collect())
