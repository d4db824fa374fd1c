"""Distinctive-terms corpus diff — log-odds with an informative
Dirichlet prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words",
public literature), per VERDICT r8 item 6.

The "what changed in my crawl" report: split the corpus into two
halves, and for every term compute the prior-smoothed log-odds-ratio
delta and its z-score

    delta_w = ln((y_aw + a_w) / (n_a + a_0 - y_aw - a_w))
            - ln((y_bw + a_w) / (n_b + a_0 - y_bw - a_w))
    z_w     = delta_w / sqrt(1/(y_aw + a_w) + 1/(y_bw + a_w))

with the FULL corpus counts as the informative prior (a_w = y_w,
a_0 = total tokens) — the standard background-prior choice.  Raw
frequency diffs overweight common words; pure log-ratios overweight
rare ones; the prior-smoothed z-score is the estimator the
computational-social-science literature settled on.

Exactness discipline (SURVEY §7.6): the halves derive from the
portable md5 bucket (rule 6 — never row order or RNG); every z input
is an INTEGER count and the z expression is ONE shared SQL text
evaluated verbatim by both engines (rule 2 — identical IEEE tree,
``ln``/``sqrt`` being the pinned-sequence libm calls the proven BM25
queries already rely on); ranking is on the ROUNDED score with a term
tie-break (rule 3); ``+ 0.0`` canonicalizes signed zero.

Scale: two hash-aggs over the exploded token stream (term counts per
half and overall), a broadcast-sized term dictionary join, and a
top-N TakeOrdered per side — the ``text_tfidf`` shape with one extra
conditional sum; no per-document state, no windows over the corpus.

Reference parity: no text surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.datasets import _SQL_BUCKET, hash_bucket
from concurrent_etl_go_spark.llm.text import tokenized_docs
from concurrent_etl_go_spark.operators.registry import query

_MIN_COUNT = 5  # overall-count floor: below it the z-score is noise
_TOP = 15  # distinctive terms emitted per side

#: The z-score as ONE shared SQL text over integer columns
#: (y_a, y_b, n_a, n_b, prior, prior0) — evaluated verbatim by both
#: engines.  The ``1.0 *`` widenings are exact (counts < 2^53).
_Z_SQL = (
    "(ln((1.0 * (y_a + prior)) / (1.0 * (n_a + prior0 - y_a - prior)))"
    " - ln((1.0 * (y_b + prior)) / (1.0 * (n_b + prior0 - y_b - prior))))"
    " / sqrt(1.0 / (y_a + prior) + 1.0 / (y_b + prior))"
)


@query(
    "text_distinctive_terms",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT unnest(string_split(text, ' ')) AS term,
             CASE WHEN {_SQL_BUCKET} < 50 THEN 0 ELSE 1 END AS half
      FROM documents
    ),
    counts AS MATERIALIZED (
      SELECT term,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS y_a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS y_b,
             COUNT(*) AS prior
      FROM tok GROUP BY 1
      HAVING COUNT(*) >= {_MIN_COUNT}
    ),
    totals AS MATERIALIZED (
      SELECT SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_b,
             COUNT(*) AS prior0
      FROM tok
    ),
    scored AS MATERIALIZED (
      SELECT term,
             CAST(y_a AS BIGINT) AS y_a, CAST(y_b AS BIGINT) AS y_b,
             ROUND({_Z_SQL}, 4) + 0.0 AS z_score
      FROM counts CROSS JOIN totals
    ),
    top_a AS (
      SELECT 'a' AS side, term, y_a, y_b, z_score,
             CAST(row_number() OVER (ORDER BY z_score DESC, term)
                  AS BIGINT) AS drank
      FROM scored ORDER BY z_score DESC, term LIMIT {_TOP}
    ),
    top_b AS (
      SELECT 'b' AS side, term, y_a, y_b, z_score,
             CAST(row_number() OVER (ORDER BY z_score ASC, term)
                  AS BIGINT) AS drank
      FROM scored ORDER BY z_score ASC, term LIMIT {_TOP}
    )
    SELECT * FROM top_a UNION ALL SELECT * FROM top_b
    """,
)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``_TOP`` most distinctive terms of each md5-half of the
    corpus by prior-smoothed log-odds z-score: side 'a' rows are the
    terms most over-represented in half A (largest z), side 'b' the
    most over-represented in half B (smallest z), each with both raw
    counts and the rounded score — the diff report a corpus owner reads
    after a re-crawl or pipeline change."""
    docs = tokenized_docs(spark, sf_dir)
    tok = docs.select(
        F.explode("toks").alias("term"),
        F.when(hash_bucket("doc_id") < 50, F.lit(0))
        .otherwise(F.lit(1))
        .alias("half"),
    )
    counts = (
        tok.groupBy("term")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("y_a"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("y_b"),
            F.count(F.lit(1)).alias("prior"),
        )
        .where(F.col("prior") >= _MIN_COUNT)
    )
    totals = tok.agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n_b"),
        F.count(F.lit(1)).alias("prior0"),
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.col("y_a").cast("long").alias("y_a"),
        F.col("y_b").cast("long").alias("y_b"),
        F.expr(f"ROUND({_Z_SQL}, 4) + 0.0").alias("z_score"),
    )
    from concurrent_etl_go_spark.operators.registry import scoped_persist

    scored = scoped_persist(scored)

    def _side(tag: str, order: list) -> DataFrame:
        # the top-_TOP frame is tiny, so the single-partition rank
        # window runs over <= _TOP rows — the LIMIT did the pruning
        w = Window.orderBy(*order)
        return (
            scored.orderBy(*order)
            .limit(_TOP)
            .select(
                F.lit(tag).alias("side"),
                "term",
                "y_a",
                "y_b",
                "z_score",
                F.row_number().over(w).cast("long").alias("drank"),
            )
        )

    top_a = _side("a", [F.desc("z_score"), F.col("term")])
    top_b = _side("b", [F.asc("z_score"), F.col("term")])
    return top_a.unionByName(top_b)
