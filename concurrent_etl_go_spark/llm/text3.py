"""Corpus-distribution analytics, part 3: Jensen-Shannon divergence of
each language subcorpus against the rest, and Simpson lexical diversity
per language.

* ``text_js_divergence`` — JSD(P_lang || P_rest) in nats (Lin 1991,
  public literature): the symmetric, bounded [0, ln 2] divergence a
  corpus-mixing pipeline reads to decide "which subcorpus is most
  unlike the others" before reweighting (``corpus_mix_rebalance``'s
  diagnostic counterpart).  KL alone is asymmetric and infinite on
  unseen terms; JSD's mixture midpoint makes every term finite.
* ``text_simpson_diversity`` — Simpson's D = sum n_i(n_i-1) / (N(N-1))
  per language (the repeat-rate): EXACT integer parts-per-million, plus
  the inverse-Simpson effective vocabulary size in thousandths — the
  complement to Shannon ``profile_column_entropy`` that needs no
  transcendental at all.

Exactness (SURVEY §7.6): all distributions are INTEGER term counts;
JSD's per-term contribution is ONE shared expression (pinned ln, the
``text_distinctive_terms`` idiom) with zero-count branches pinned by
identical CASE guards; the cross-language term sum carries ~1e-14
jitter absorbed by ROUND(4) + 0.0.  Simpson is pure 128-bit integer
floor division — no float at all.

Scale: one exploded-token hash agg to (lang, term), a term-dictionary
agg, and a |langs| x |vocab| broadcast expansion (languages are a
5-value dimension); per-language sums shuffle on the lang key.
Reference parity: no text surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.text import tokenized_docs
from concurrent_etl_go_spark.operators.registry import query

#: Shared JSD fragments over integer columns (c_l, c_t, n_l, n_t):
#: p = lang-side term probability, q = rest-side.  The ``1.0 *``
#: widenings are exact (counts < 2^53).
_P = "(1.0 * c_l / n_l)"
_Q = "(1.0 * (c_t - c_l) / (n_t - n_l))"
_JS_TERM = (
    f"0.5 * (CASE WHEN c_l = 0 THEN 0.0 ELSE"
    f" {_P} * ln(2.0 * {_P} / ({_P} + {_Q})) END)"
    f" + 0.5 * (CASE WHEN c_t - c_l = 0 THEN 0.0 ELSE"
    f" {_Q} * ln(2.0 * {_Q} / ({_P} + {_Q})) END)"
)


@query(
    "text_js_divergence",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    lt AS MATERIALIZED (
      SELECT lang, term, COUNT(*) AS c_l FROM tok GROUP BY 1, 2
    ),
    t AS MATERIALIZED (
      SELECT term, COUNT(*) AS c_t FROM tok GROUP BY 1
    ),
    langs AS MATERIALIZED (
      SELECT lang, COUNT(*) AS n_l FROM tok GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n_t FROM tok),
    grid AS MATERIALIZED (
      SELECT g.lang, g.n_l, t.term, t.c_t, tt.n_t,
             COALESCE(lt.c_l, 0) AS c_l
      FROM langs g
      CROSS JOIN t
      CROSS JOIN tot tt
      LEFT JOIN lt ON lt.lang = g.lang AND lt.term = t.term
    )
    SELECT lang,
           CAST(n_l AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c_l > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_terms,
           ROUND(SUM({_JS_TERM}), 4) + 0.0 AS jsd_nats
    FROM grid
    GROUP BY lang, n_l
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: token count, vocabulary size, and the
    Jensen-Shannon divergence (nats) between that language's term
    distribution and the REST of the corpus — computed over the full
    |langs| x |vocab| grid so terms unseen on either side contribute
    their finite mixture term (the CASE-pinned branches).

    Scale: the grid is a broadcast expansion of the vocabulary by the
    5-value language dimension — linear in vocab, never in documents;
    the heavy shuffles are the two token hash-aggs every text query
    pays."""
    tok = tokenized_docs(spark, sf_dir).select(
        "lang", F.explode("toks").alias("term")
    )
    lt = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c_l"))
    t = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    langs = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    tot = tok.agg(F.count(F.lit(1)).alias("n_t"))
    grid = (
        F.broadcast(langs)
        .crossJoin(t)
        .crossJoin(F.broadcast(tot))
        .join(lt, ["lang", "term"], "left")
        .select(
            "lang",
            "n_l",
            "term",
            "c_t",
            "n_t",
            F.coalesce(F.col("c_l"), F.lit(0)).alias("c_l"),
        )
    )
    return grid.groupBy("lang", "n_l").agg(
        F.sum(F.when(F.col("c_l") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_terms"),
        (F.round(F.sum(F.expr(_JS_TERM)), 4) + F.lit(0.0)).alias(
            "jsd_nats"
        ),
    ).select(
        "lang",
        F.col("n_l").cast("long").alias("n_tokens"),
        "n_terms",
        "jsd_nats",
    )


@query(
    "text_simpson_diversity",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    lt AS MATERIALIZED (
      SELECT lang, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ),
    agg AS (
      SELECT lang,
             SUM(c) AS n,
             SUM(CAST(c AS HUGEINT) * (c - 1)) AS num,
             COUNT(*) AS vocab
      FROM lt GROUP BY 1
    )
    SELECT lang,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           CAST(1000000 * num // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
             AS simpson_ppm,
           CASE WHEN num = 0 THEN 0 ELSE
             CAST(CAST(n AS HUGEINT) * (n - 1) * 1000 // num AS BIGINT) END
             AS inv_simpson_milli
    FROM agg
    """,
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson lexical diversity per language: the probability (ppm)
    that two tokens drawn without replacement are the SAME term, and
    its inverse — the effective number of equally-common terms, in
    thousandths.  Everything is exact 128-bit integer arithmetic
    (sum of c·(c−1) over the term dictionary), so the driver hash needs
    no float discipline at all.

    Scale: one (lang, term) hash agg then a lang-keyed fold of three
    integer accumulators; the 128-bit products clear int64 at
    trillion-token scale without overflow."""
    tok = tokenized_docs(spark, sf_dir).select(
        "lang", F.explode("toks").alias("term")
    )
    lt = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    big = "DECIMAL(38,0)"
    agg = lt.groupBy("lang").agg(
        F.sum("c").alias("n"),
        F.sum(F.expr(f"CAST(c AS {big}) * (c - 1)")).alias("num"),
        F.count(F.lit(1)).alias("vocab"),
    )
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.expr(
            f"CAST(1000000 * num div (CAST(n AS {big}) * (n - 1))"
            " AS BIGINT)"
        ).alias("simpson_ppm"),
        F.expr(
            "CASE WHEN num = 0 THEN 0 ELSE "
            f"CAST(CAST(n AS {big}) * (n - 1) * 1000 div num AS BIGINT) END"
        ).alias("inv_simpson_milli"),
    )


_PMI_DF_MIN = 25  # dictionary floor: content terms only
_PMI_TOP_TERMS = 100  # df-ranked dictionary cap (bounds per-doc pairs)
_PMI_MIN_CO = 5  # minimum co-document count for a pair
_PMI_TOP = 20  # pairs emitted


@query(
    "text_pmi_pairs",
    oracle=f"""
    WITH dt AS MATERIALIZED (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    df AS MATERIALIZED (
      SELECT term, COUNT(*) AS c FROM dt GROUP BY 1
      HAVING COUNT(*) >= {_PMI_DF_MIN}
    ),
    dict AS MATERIALIZED (
      SELECT term, c FROM df ORDER BY c DESC, term LIMIT {_PMI_TOP_TERMS}
    ),
    dtd AS MATERIALIZED (
      SELECT dt.doc_id, dt.term, d.c FROM dt JOIN dict d USING (term)
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dt),
    co AS MATERIALIZED (
      SELECT a.term AS term_a, b.term AS term_b,
             a.c AS c_a, b.c AS c_b, COUNT(*) AS c_ab
      FROM dtd a JOIN dtd b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= {_PMI_MIN_CO}
    )
    SELECT term_a, term_b,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           CAST(c_ab AS BIGINT) AS c_ab,
           ROUND(ln(1.0 * c_ab * n.n_docs / (1.0 * c_a * c_b)), 4) + 0.0
             AS pmi,
           CAST(row_number() OVER (
             ORDER BY ROUND(ln(1.0 * c_ab * n.n_docs
                               / (1.0 * c_a * c_b)), 4) DESC,
                      term_a, term_b) AS BIGINT) AS pmi_rank
    FROM co CROSS JOIN n
    ORDER BY pmi DESC, term_a, term_b LIMIT {_PMI_TOP}
    """,
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information (Church & Hanks
    1990, public literature): document-level co-occurrence of the
    ``_PMI_TOP_TERMS`` most-frequent content terms,
    ``pmi = ln(N·c_ab / (c_a·c_b))`` — the association score behind
    phrase mining and tokenizer-merge diagnostics.  Each pair's PMI is
    ONE deterministic ln over an integer ratio (no sums — no jitter at
    all); ranking is on the ROUNDED score with term tie-breaks.

    Scale: the df-capped dictionary bounds the per-document pair
    expansion at C(100, 2); candidates join on the doc key and
    aggregate on the (term, term) pair key — the basket-lift shuffle
    shape over a vocabulary-bounded block."""
    dt = (
        tokenized_docs(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("term"))
        .distinct()
    )
    df_ = dt.groupBy("term").agg(F.count(F.lit(1)).alias("c")).where(
        F.col("c") >= _PMI_DF_MIN
    )
    dic = df_.orderBy(F.desc("c"), "term").limit(_PMI_TOP_TERMS)
    dtd = dt.join(F.broadcast(dic), "term")
    n = dt.agg(F.countDistinct("doc_id").alias("n_docs"))
    a = dtd.select(
        "doc_id", F.col("term").alias("term_a"), F.col("c").alias("c_a")
    )
    b = dtd.select(
        "doc_id", F.col("term").alias("term_b"), F.col("c").alias("c_b")
    )
    co = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "c_a", "c_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _PMI_MIN_CO)
    )
    pmi = "ln(1.0 * c_ab * n_docs / (1.0 * c_a * c_b))"
    scored = co.crossJoin(F.broadcast(n)).select(
        "term_a",
        "term_b",
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        F.col("c_ab").cast("long").alias("c_ab"),
        F.expr(f"ROUND({pmi}, 4) + 0.0").alias("pmi"),
    )
    w = Window.orderBy(F.desc("pmi"), "term_a", "term_b")
    return (
        scored.withColumn("pmi_rank", F.row_number().over(w).cast("long"))
        .orderBy(F.desc("pmi"), "term_a", "term_b")
        .limit(_PMI_TOP)
    )
