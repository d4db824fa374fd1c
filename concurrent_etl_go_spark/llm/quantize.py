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
