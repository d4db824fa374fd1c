"""Deterministic negative sampling for contrastive training pairs.

Embedding-model training (retrieval, dedup scorers, CLIP-style towers)
needs (anchor, negative) pairs at corpus scale. Random sampling with an
RNG is irreproducible across retries and engines; the standard fix is
HASH-based sampling — candidate ids derive from ``md5(anchor_id # j)``,
so every engine, every retry, and every partition layout produces the
same pairs (same portable-hash trick as ``llm/datasets.py`` splits).

Label-collision rejection keeps only candidates whose label differs from
the anchor's (and that aren't the anchor itself), i.e. rejection sampling
with a deterministic proposal: some anchors end up with fewer than
``NEG_CANDIDATES`` negatives, which both engines agree on exactly.

Scale: candidates are |anchors| x NEG_CANDIDATES narrow rows; the label
fetch is one equi-join on the candidate id against the (id, label)
projection — shuffle-partitioned on the id, no skew (md5 spreads ids
uniformly), no driver participation. At 100 TB this is a map + one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Deterministic candidate draws per anchor (pre-rejection).
NEG_CANDIDATES = 4

#: DuckDB twin of bucket = md5("{id}#{j}")[:8] as int % n (the Spark side
#: builds the identical expression in-plan below). 8 hex chars (32 bits)
#: keeps the modulo meaningful up to 4B vectors.
_SQL_BUCKET = (
    "(('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || '#' || "
    "CAST(j.j AS VARCHAR)), 1, 8))::BIGINT % n.n_vecs)"
)


@query(
    "sample_negatives",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
    cand AS (
      SELECT e.vec_id, e.label, CAST(j.j AS BIGINT) AS j,
             {_SQL_BUCKET} AS neg_id
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range({NEG_CANDIDATES})) AS j) j
      CROSS JOIN n
    )
    SELECT c.vec_id, c.j, c.neg_id, e2.label AS neg_label
    FROM cand c JOIN embeddings e2 ON e2.vec_id = c.neg_id
    WHERE e2.label <> c.label AND c.neg_id <> c.vec_id
    """,
)
def sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-derived negatives per anchor vector, label-mismatch verified.

    Emits (vec_id, j, neg_id, neg_label) — one row per surviving
    candidate draw. Draw j of anchor a proposes
    ``md5(f"{{a}}#{{j}}")[:8] % n_vecs`` and survives iff the proposed
    vector exists, has a different label, and is not the anchor.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    ids = emb.select("vec_id", "label")
    n = ids.agg(F.count(F.lit(1)).alias("n_vecs"))
    cand = (
        ids.select(
            "vec_id",
            "label",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(NEG_CANDIDATES - 1))
            ).alias("j"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            "label",
            "j",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "#",
                                F.col("vec_id").cast("string"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_vecs")
            ).alias("neg_id"),
        )
    )
    negs = ids.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    return (
        cand.join(negs, "neg_id")
        .where(
            (F.col("neg_label") != F.col("label"))
            & (F.col("neg_id") != F.col("vec_id"))
        )
        .select("vec_id", "j", "neg_id", "neg_label")
    )
