"""Embedding post-processing: "All-but-the-Top" dominant-direction
removal (Mu & Viswanath 2018, public literature) on the integer
lattice — the standard fix for anisotropic sentence embeddings, run as
a corpus-level transform before similarity search.

Composition: the direction comes from the hash-proven power-iteration
kernel (``llm/pca.py``), so this query is the first CHAIN of two
iterative kernels under one oracle: the unrolled PCA chain feeds a
projection/removal stage, all bit-exact.

Integer algebra per vector x (quantized ``floor(e*1024)``), with v the
e6-lattice direction:

* ``proj = sum_i x_i v_i``          (int64: |x| <= 2^10, |v| <= 1e6,
                                     64 terms -> < 2^47)
* ``denom = sum_i v_i^2``           (int64, <= 64e12)
* ``u_i = floor(proj * v_i / denom)`` — the removed component, via the
  portable signed floor-division idiom (``kmeans2._FDIV``; the 128-bit
  product widens to DECIMAL(38,0)/HUGEINT first)
* ``r_i = x_i - u_i``; emit ``resid_norm2 = sum r_i^2`` next to the
  original ``norm2`` — the anisotropy-removal readout (how much of
  each vector lived in the dominant direction).

Scale: the direction is d rows (broadcast); projection/removal is one
map-side pass over the exploded corpus + a vec-keyed hash agg — the
same shape as ``embeddings_centroid_drift``.  Reference parity: no
embedding surface in the reference (etl/main.go); extends SURVEY.md
§2.B's similarity family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.ivfpq2 import _int_vectors
from concurrent_etl_go_spark.llm.pca import _ROUNDS, _pca_chain_sql, top_component
from concurrent_etl_go_spark.operators.registry import query, scoped_persist


@query(
    "embeddings_remove_top_component",
    oracle=f"""
    WITH {_pca_chain_sql()},
    vdir AS MATERIALIZED (
      SELECT i, w FROM x{_ROUNDS}
    ),
    denom AS MATERIALIZED (
      SELECT CAST(SUM(w * w) AS BIGINT) AS dn FROM vdir
    ),
    proj AS MATERIALIZED (
      SELECT c.vec_id,
             CAST(SUM(c.val * v.w) AS BIGINT) AS p,
             CAST(SUM(c.val * c.val) AS BIGINT) AS norm2
      FROM comps c JOIN vdir v ON v.i = c.i
      GROUP BY c.vec_id
    ),
    removed AS MATERIALIZED (
      SELECT c.vec_id,
             c.val - CAST((s - ((s % dn + dn) % dn)) // dn AS BIGINT)
               AS r
      FROM (SELECT c0.vec_id, c0.val,
                   CAST(p.p AS HUGEINT) * v.w AS s, d.dn AS dn
            FROM comps c0
            JOIN vdir v ON v.i = c0.i
            JOIN proj p ON p.vec_id = c0.vec_id
            CROSS JOIN denom d) c
    )
    SELECT p.vec_id, p.p AS proj_dot, p.norm2,
           CAST(SUM(r.r * r.r) AS BIGINT) AS resid_norm2
    FROM proj p JOIN removed r ON r.vec_id = p.vec_id
    GROUP BY p.vec_id, p.p, p.norm2
    """,
)
def embeddings_remove_top_component(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per vector: its projection onto the corpus's dominant direction
    (``proj_dot``), its squared norm before (``norm2``) and after
    (``resid_norm2``) removing that direction — the All-but-the-Top
    post-processing readout, every value an exact int64 (see module
    note for the signed floor-division lattice convention).

    Scale: module note — broadcast d-row direction, one exploded-corpus
    pass, vec-keyed hash aggs."""
    iv = scoped_persist(_int_vectors(spark, sf_dir))
    comps = scoped_persist(
        iv.select(
            "vec_id", F.posexplode("v").alias("i0", "val")
        ).select("vec_id", (F.col("i0") + 1).alias("i"), "val")
    )
    vdir = top_component(spark, sf_dir).select(
        F.col("dim").alias("i"), F.col("weight_e6").alias("w")
    )
    vdir = scoped_persist(vdir)
    denom = vdir.agg(F.sum(F.col("w") * F.col("w")).cast("long").alias("dn"))
    proj = scoped_persist(
        comps.join(F.broadcast(vdir), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("val") * F.col("w")).cast("long").alias("p"),
            F.sum(F.col("val") * F.col("val")).cast("long").alias("norm2"),
        )
    )
    removed = (
        comps.join(F.broadcast(vdir), "i")
        .join(proj.select("vec_id", "p"), "vec_id")
        .crossJoin(F.broadcast(denom))
        .select(
            "vec_id",
            F.expr("CAST(p AS DECIMAL(38,0)) * w").alias("s"),
            "dn",
            "val",
        )
        .select(
            "vec_id",
            (
                F.col("val")
                - F.expr(
                    "CAST((s - ((s % dn + dn) % dn)) div dn AS BIGINT)"
                )
            ).alias("r"),
        )
    )
    resid = removed.groupBy("vec_id").agg(
        F.sum(F.col("r") * F.col("r")).cast("long").alias("resid_norm2")
    )
    return proj.join(resid, "vec_id").select(
        "vec_id",
        F.col("p").alias("proj_dot"),
        "norm2",
        "resid_norm2",
    )
