"""Embedding compression: per-vector int8 scalar quantization.

The storage/serving step of a vector pipeline (IVF/SQ-style): each
float32 embedding becomes (scale, int8 codes) at 4x compression, with
distance computed against reconstructed values. Expressed entirely with
JVM-side higher-order functions (``transform``/``aggregate``) — no UDF,
no shuffle: quantization is a per-row expression, embarrassingly
parallel at any corpus size.

Cross-engine determinism notes (why this is oracle-checkable at all):
float32 -> double widening is exact in both engines; max / divide are
IEEE-identical; both Spark ``round`` and DuckDB ``round`` use
half-away-from-zero; zero vectors are guarded with a CASE so no
NaN/inf enters the compare; the two double outputs are ROUND-quantized
(registry convention) so summation-order noise cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "embeddings_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127
                 AS scale
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           ROUND(scale, 6) AS scale_r,
           CAST(CASE WHEN scale = 0 THEN 0 ELSE list_sum(
               list_transform(v, x -> CAST(round(x / scale) AS BIGINT))
           ) END AS BIGINT) AS sum_codes,
           ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE list_sum(
               list_transform(v,
                   x -> (x - CAST(round(x / scale) AS BIGINT) * scale)
                        * (x - CAST(round(x / scale) AS BIGINT) * scale))
           ) END, 4) AS recon_err
    FROM s
    """,
)
def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization per embedding: codes =
    round(x / scale) with scale = max|x| / 127, summarized as scalar
    columns (code sum + squared reconstruction error) so the oracle
    compare avoids array-typed columns, like ``similarity_centroids``.

    Scale: pure per-row Catalyst expressions over one scan — the shape
    that quantizes a 100 TB embedding table in a single map-only pass.
    The real pipeline writes (vec_id, scale, codes) back to parquet;
    this query verifies the arithmetic end-to-end.
    """
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def xd(x: Column) -> Column:
        return x.cast("double")

    v = F.transform("embedding", xd)
    with_scale = emb.select(
        "vec_id",
        v.alias("v"),
        (F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))) / 127)
        .alias("scale"),
    )
    code = lambda x: F.round(x / F.col("scale")).cast("long")  # noqa: E731
    resid = lambda x: x - code(x) * F.col("scale")  # noqa: E731
    zero = F.col("scale") == 0
    return with_scale.select(
        "vec_id",
        F.size("v").cast("long").alias("n_dims"),
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.when(zero, F.lit(0))
        .otherwise(
            F.aggregate(
                "v", F.lit(0).cast("long"), lambda acc, x: acc + code(x)
            )
        )
        .cast("long")
        .alias("sum_codes"),
        F.round(
            F.when(zero, F.lit(0.0)).otherwise(
                F.aggregate(
                    "v",
                    F.lit(0.0),
                    lambda acc, x: acc + resid(x) * resid(x),
                )
            ),
            4,
        ).alias("recon_err"),
    )


#: Norm-histogram constants: the ivfpq2 integer quantization scale and
#: the squared-norm bucket width.  Shared verbatim with the oracle.
NORM_QUANT_SCALE = 1024
NORM_BUCKET_WIDTH = 1_000_000


@query(
    "embeddings_norm_histogram",
    oracle=f"""
    WITH iv AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * {NORM_QUANT_SCALE}) AS BIGINT)
              for x in embedding] AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id,
             list_sum([v[i] * v[i] for i in range(1, 65)]) AS sq
      FROM iv
    )
    SELECT CAST(sq // {NORM_BUCKET_WIDTH} AS BIGINT) AS bucket,
           COUNT(*) AS n_vectors,
           CAST(MIN(sq) AS BIGINT) AS min_sq,
           CAST(MAX(sq) AS BIGINT) AS max_sq
    FROM n GROUP BY 1
    """,
)
def embeddings_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of embedding magnitudes: integer-quantized squared
    L2 norms (the ``llm/ivfpq2.py`` floor(x*1024) rule — exact IEEE
    widen/multiply, then pure integer squares) bucketed into a
    fixed-width histogram — the sanity profile a vector-pipeline owner
    reads before choosing a normalization or quantization scheme
    (near-zero vectors, outlier magnitudes, bimodality).

    Scale: map-only norm computation (per-row higher-order function,
    no shuffle) into a <= ~20-bucket hash agg.  All-integer output:
    bit-exact across engines, no float discipline needed — unlike a
    double-norm histogram, whose bucket edges would sit on libm
    boundaries."""
    iv = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"cast(floor(cast(x as double) * {NORM_QUANT_SCALE}) as bigint))"
        ).alias("v"),
    )
    n = iv.select(
        F.expr(
            "aggregate(transform(v, e -> e * e), 0L, (acc, x) -> acc + x)"
        ).alias("sq")
    )
    return n.groupBy(
        F.expr(f"sq div {NORM_BUCKET_WIDTH}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("sq").cast("long").alias("min_sq"),
        F.max("sq").cast("long").alias("max_sq"),
    )
