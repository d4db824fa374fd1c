"""Multimodal column support: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct alongside. Content-addressing (sha256), hash-dedup, and the Spark
plumbing for decode/feature-extraction (schemas, batch iteration,
partitioning) are real and tested; the actual media decoding is stubbed —
the image/audio libraries are not available in this environment — behind
``decode_fn`` hooks that raise ``NotImplementedError`` unless a
deterministic fake is injected.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

# Metadata struct carried next to every binary payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def content_hash(binary_col: Column | str) -> Column:
    c = F.col(binary_col) if isinstance(binary_col, str) else binary_col
    return F.sha2(c, 256)


def with_media_meta(
    df: DataFrame, binary_col: str, media_type: str
) -> DataFrame:
    """Attach the typed metadata struct computed from the payload itself."""
    b = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(b).cast("long").alias("n_bytes"),
            content_hash(b).alias("content_sha256"),
        ),
    )


def _default_decode(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; inject a decode_fn (tests use a deterministic fake)"
    )


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], list[float]] = _default_decode,
) -> DataFrame:
    """Decode/feature-extract binary payloads via ``mapInPandas``.

    The Spark plumbing is the real deliverable here: Arrow-batched
    iteration, explicit output schema, no driver materialization. The
    decode itself is the injected ``decode_fn`` (stubbed by default).
    """
    meta_type = F.col("media_meta.media_type")
    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        meta_type.alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col(binary_col).alias("payload"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            features = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": features,
                }
            )

    return prepared.mapInPandas(batches, FEATURE_SCHEMA)


@query(
    "multimodal_hash_dedup",
    oracle="""
    SELECT sha256(text) AS content_sha256, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies, MIN(length(text)) AS n_bytes
    FROM documents GROUP BY 1
    """,
)
def multimodal_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup of binary payloads (documents' text bytes stand in
    for media payloads — ASCII, so byte length == char length)."""
    docs = read_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    with_meta = with_media_meta(payloads, "payload", media_type="text/plain")
    return with_meta.groupBy(
        F.col("media_meta.content_sha256").alias("content_sha256")
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("media_meta.n_bytes").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# Media transform ops (decode / resize / frame-sample)
#
# The Spark-side plumbing (schemas, Arrow batching, partition-parallel
# execution) is real; the media math itself is stubbed behind injectable
# callables because no image/audio libraries exist in this environment.
# --------------------------------------------------------------------------

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_frames_sampled", T.IntegerType(), True),
    ]
)


def _stub(name: str):
    def fn(*_args, **_kwargs):
        raise NotImplementedError(
            f"{name} requires media libraries not present in this "
            "environment; inject an implementation"
        )

    return fn


def decode_image(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, int, list[float]]] = _stub("decode_image"),
) -> DataFrame:
    """binary -> (width, height, pixel array) via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decoder(p) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "pixels": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, IMAGE_SCHEMA)


def resize_image(
    images: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[list[float], int, int, int, int], list[float]] = _stub(
        "resize_image"
    ),
) -> DataFrame:
    """(pixels, w, h) -> resized pixel array; output schema fixed to the
    target dims so downstream operators can rely on the shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                resizer(px, w, h, target_w, target_h)
                for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "pixels": resized,
                }
            )

    return images.mapInPandas(batches, IMAGE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    prober: Callable[[bytes], int] = _stub("sample_frames"),
) -> DataFrame:
    """video binary -> deterministic every-Nth frame index sample; the
    prober returns the container's frame count (stubbed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counts = [prober(p) for p in pdf[binary_col]]
            idx = [list(range(0, c, every_n)) for c in counts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "frame_idx": idx,
                    "n_frames_sampled": [len(i) for i in idx],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, FRAMES_SCHEMA)
