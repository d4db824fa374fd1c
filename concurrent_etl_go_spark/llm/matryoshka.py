"""Matryoshka (nested-prefix) retrieval — the MRL coarse-to-fine ANN
funnel under the driver's hash compare.

Matryoshka representation learning (Kusupati et al. 2022, public
literature) trains embeddings whose PREFIX dimensions are themselves a
valid lower-dimensional embedding, so retrieval can scan a cheap prefix
(here the first ``_PREFIX`` of ``_DIM`` dims), keep a shortlist, and
re-rank only that shortlist at full dimension — the same
build-cheap/refine-exact cascade as IVF-PQ's ADC + re-rank, but with NO
learned index at all: the "index" is just a narrower column read.

Portability: the ``llm/ivfpq2.py`` integer rule (``floor(x * 1024)``,
exact IEEE widen+multiply, unambiguous floor) makes both the prefix and
the full squared-L2 distances plain integer sums; every shortlist
decision and final rank is tie-broken by (distance, vec_id), so the
driver hash pins the whole cascade bit-for-bit.

Scale: the prefix pass reads ``_PREFIX/_DIM`` of the vector bytes per
row (a column-prune the parquet reader realizes when prefixes are
stored as their own column, as an MRL serving layout would) and keeps a
``_SHORTLIST``-sized TakeOrdered — never a global sort; only the
shortlist joins back to full vectors.  The query vector rides along as
a broadcast one-row frame — no ``.collect()`` anywhere.

Reference parity: no ANN surface exists in the reference (etl/main.go);
extends SURVEY.md §2.B's similarity family beside ``llm/ivfpq2.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.ivfpq2 import _d2_sql, _int_vectors
from concurrent_etl_go_spark.operators.registry import query

_DIM = 64
_PREFIX = 16
_SHORTLIST = 40
_TOP_K = 10
_QUERY_ID = 0


def _dd_prefix_d2(a: str, b: str, lo: int, hi: int) -> str:
    """DuckDB integer squared-L2 over 1-based elements lo..hi."""
    return (
        f"list_sum([({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
        f"for i in range({lo}, {hi + 1})])"
    )


@query(
    "similarity_matryoshka_topk",
    oracle=f"""
    WITH iv AS MATERIALIZED (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)
              for x in embedding] AS v
      FROM embeddings
    ),
    q AS MATERIALIZED (SELECT v AS qv FROM iv WHERE vec_id = {_QUERY_ID}),
    pref AS MATERIALIZED (
      SELECT a.vec_id,
             CAST({_dd_prefix_d2('a.v', 'q.qv', 1, _PREFIX)} AS BIGINT)
               AS d2_prefix
      FROM iv a CROSS JOIN q
    ),
    short AS MATERIALIZED (
      SELECT vec_id, d2_prefix FROM pref
      ORDER BY d2_prefix, vec_id LIMIT {_SHORTLIST}
    ),
    rr AS (
      SELECT s.vec_id, s.d2_prefix,
             CAST({_dd_prefix_d2('a.v', 'q.qv', 1, _DIM)} AS BIGINT)
               AS d2_full
      FROM short s
      JOIN iv a ON a.vec_id = s.vec_id
      CROSS JOIN q
    )
    SELECT CAST(row_number() OVER (ORDER BY d2_full, vec_id) AS BIGINT)
             AS rank,
           vec_id, d2_prefix, d2_full
    FROM rr ORDER BY d2_full, vec_id LIMIT {_TOP_K}
    """,
)
def similarity_matryoshka_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MRL coarse-to-fine top-k for the fixed query vector: scan the
    ``_PREFIX``-dim prefix distance, shortlist the best ``_SHORTLIST``
    by (prefix distance, vec_id), re-rank the shortlist at full
    ``_DIM`` dims, return the top ``_TOP_K`` with ranks and BOTH
    distances — every funnel decision pinned by the driver hash.  The
    prefix/full distance pair also makes the funnel's recall behavior
    auditable from the result itself (a candidate whose d2_prefix is
    small but d2_full is large is exactly the MRL approximation
    error)."""
    iv = _int_vectors(spark, sf_dir)
    q = iv.where(F.col("vec_id") == _QUERY_ID).select(
        F.col("v").alias("qv")
    )
    pref = iv.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.expr(_d2_sql(f"slice(v, 1, {_PREFIX})", f"slice(qv, 1, {_PREFIX})"))
        .alias("d2_prefix"),
    )
    short = pref.orderBy("d2_prefix", "vec_id").limit(_SHORTLIST)
    rr = (
        short.join(iv, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "d2_prefix",
            F.expr(_d2_sql("v", "qv")).alias("d2_full"),
        )
    )
    w = Window.orderBy("d2_full", "vec_id")
    return (
        rr.select(
            F.row_number().over(w).cast("long").alias("rank"),
            "vec_id",
            "d2_prefix",
            "d2_full",
        )
        .orderBy("d2_full", "vec_id")
        .limit(_TOP_K)
    )
