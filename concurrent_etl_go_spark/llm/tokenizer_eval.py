"""Tokenizer and corpus-mix evaluation — the pre-training readouts a
data team signs off before committing a tokenizer and a sampling mix.

* FERTILITY (subwords per word) per language: the standard tokenizer
  quality metric (Rust et al. 2021, public literature) — a language
  whose fertility is 2x another's pays 2x the context budget for the
  same text.  Computed with the engine's frozen BPE merge chain
  (``text2.BPE_MERGES``), so it measures the exact tokenizer the
  pipeline applies.
* TEMPERATURE-SCALED MIX WEIGHTS: the multilingual sampling recipe
  ``w_l ~ (n_l/N)^tau`` (tau = 0.7; Conneau & Lample 2019, public
  literature) that upsamples low-resource languages.  The ``pow`` lands
  on the integer lattice immediately (ROUND to 1e-9 micro-units — the
  ROUND-FIRST rule for engine-dependent libm ulps), so the
  normalization is an exact integer ratio.
* BIGRAM ENTROPY RATE per language: the conditional entropy
  H(next | current) of the word-bigram model in integer micro-nats
  (each ``ln`` pinned with ROUND then scaled — the SPRT micro-nat
  convention; FLOAT sums across bigrams would be order-dependent).

Scale: fertility/entropy are one explode + hash-agg pipelines (pair
counts carry map-side partials); the mix table is |langs| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.text import tokens
from concurrent_etl_go_spark.llm.text2 import BPE_MERGES
from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: Sampling temperature as a shared <=15-digit literal.
MIX_TAU = "0.7"


def _merged_sql(var: str) -> str:
    out = var
    for a, b in BPE_MERGES:
        out = f"replace({out}, '{a} {b}', '{a}{b}')"
    return out


@query(
    "dataset_tokenizer_fertility",
    oracle=f"""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    c AS (
      SELECT lang, word,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s
      FROM w WHERE word <> ''
    ),
    m AS (
      SELECT lang, word,
             len(string_split({_merged_sql('s')}, ' ')) AS n_sub
      FROM c
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars,
           CAST(SUM(n_sub) * 10000 // COUNT(*) AS BIGINT)
             AS fertility_bp,
           CAST(SUM(len(word)) * 10000 // SUM(n_sub) AS BIGINT)
             AS chars_per_subword_bp
    FROM m GROUP BY lang
    """,
)
def dataset_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per language under the frozen BPE merges:
    subwords-per-word and chars-per-subword in floor basis points.
    High fertility flags languages the vocabulary underserves — the
    number that decides whether a tokenizer ships.

    Scale: the merge chain is per-row string arithmetic in codegen
    (the ``text_bpe_apply`` plan); one (lang)-keyed hash agg rides the
    only exchange."""
    words = read_table(spark, sf_dir, "documents").select(
        "lang", F.explode(tokens("text")).alias("word")
    ).where(F.col("word") != "")
    s = F.trim(F.regexp_replace("word", "(.)", "$1 "))
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
    m = words.select(
        "lang",
        "word",
        F.size(F.split(s, " ")).alias("n_sub"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("n_sub").cast("long").alias("n_subwords"),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
        F.expr(
            "CAST(SUM(n_sub) * 10000 div COUNT(*) AS BIGINT)"
        ).alias("fertility_bp"),
        F.expr(
            "CAST(SUM(length(word)) * 10000 div SUM(n_sub) AS BIGINT)"
        ).alias("chars_per_subword_bp"),
    )


@query(
    "dataset_mix_temperature_weights",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_tokens) AS total FROM t),
    q AS (
      SELECT lang, n_tokens,
             CAST(ROUND(pow(CAST(n_tokens AS DOUBLE) / tot.total,
                            {MIX_TAU}) * 1000000000, 0) AS BIGINT)
               AS q_e9
      FROM t CROSS JOIN tot
    ),
    qs AS (SELECT SUM(q_e9) AS qsum FROM q)
    SELECT q.lang, q.n_tokens,
           CAST(q.n_tokens * 10000 // tot.total AS BIGINT)
             AS natural_share_bp,
           CAST(q.q_e9 * 10000 // qs.qsum AS BIGINT) AS mix_weight_bp,
           CAST(CAST(q.q_e9 AS HUGEINT) * tot.total * 10000
                // (qs.qsum * q.n_tokens) AS BIGINT)
             AS upsample_e4
    FROM q CROSS JOIN tot CROSS JOIN qs
    """,
)
def dataset_mix_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled language sampling mix (tau = 0.7): natural
    token share, the (n_l/N)^tau mix weight, and the per-language
    upsample factor (mix weight over natural share, x1e4) — the table
    a multilingual pretraining job samples from.  The ``pow`` result
    is pinned to integer 1e-9 units immediately (libm vs JVM ``pow``
    can differ an ulp — the ROUND-FIRST rule), making the
    normalization an exact integer ratio; the upsample cross-product
    widens to HUGEINT/DECIMAL.

    Scale: one fact scan to |langs| rows; everything after is
    constant-size."""
    t = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("n_tokens")
        )
    )
    t = scoped_persist(t)
    tot = t.agg(F.sum("n_tokens").alias("total"))
    q = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        "total",
        F.expr(
            f"CAST(ROUND(pow(CAST(n_tokens AS DOUBLE) / total,"
            f" {MIX_TAU}) * 1000000000, 0) AS BIGINT)"
        ).alias("q_e9"),
    )
    qs = q.agg(F.sum("q_e9").alias("qsum"))
    return q.crossJoin(F.broadcast(qs)).select(
        "lang",
        "n_tokens",
        F.expr("CAST(n_tokens * 10000 div total AS BIGINT)").alias(
            "natural_share_bp"
        ),
        F.expr("CAST(q_e9 * 10000 div qsum AS BIGINT)").alias(
            "mix_weight_bp"
        ),
        F.expr(
            "CAST(CAST(q_e9 AS DECIMAL(38,0)) * total * 10000"
            " div (CAST(qsum AS DECIMAL(38,0)) * n_tokens) AS BIGINT)"
        ).alias("upsample_e4"),
    )


@query(
    "text_bigram_entropy_rate",
    oracle="""
    WITH w AS (
      SELECT lang, doc_id, string_split(text, ' ') AS toks
      FROM documents
    ),
    big AS (
      SELECT lang, toks[i] AS cur, toks[i + 1] AS nxt
      FROM w, UNNEST(range(1, greatest(len(toks), 1))) AS t(i)
    ),
    pair AS (
      SELECT lang, cur, nxt, CAST(COUNT(*) AS BIGINT) AS c_cn
      FROM big GROUP BY 1, 2, 3
    ),
    ctx AS (
      SELECT lang, cur, CAST(SUM(c_cn) AS BIGINT) AS c_c
      FROM pair GROUP BY 1, 2
    ),
    terms AS (
      SELECT p.lang,
             p.c_cn,
             CAST(ROUND(ln(CAST(p.c_cn AS DOUBLE) / x.c_c) * 1000000,
                        0) AS BIGINT) AS lnp_e6
      FROM pair p JOIN ctx x ON x.lang = p.lang AND x.cur = p.cur
    )
    SELECT lang,
           CAST(SUM(c_cn) AS BIGINT) AS n_bigrams,
           CAST(-SUM(c_cn * lnp_e6) // SUM(c_cn) AS BIGINT)
             AS entropy_micro_nats
    FROM terms GROUP BY lang
    """,
)
def text_bigram_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word-bigram conditional entropy H(next | current) per language,
    in integer micro-nats: each bigram's ``ln(c(cur,next)/c(cur))`` is
    pinned to the 1e-6 lattice FIRST (the micro-nat/ROUND-first rule —
    engine ``ln`` ulps must not reach a float sum), then the
    count-weighted integer total floor-divides by the bigram count.
    Low entropy rate = repetitive/templated text; the corpus-level
    cousin of ``text_repetition``'s per-doc signal, and the quantity a
    unigram-vs-bigram perplexity comparison starts from.

    Scale: one explode to bigrams -> two hash aggs (pair then context,
    both map-side-combined) -> a broadcast-sized join of pair counts to
    context totals per language."""
    w = read_table(spark, sf_dir, "documents").select(
        "lang", tokens("text").alias("toks")
    )
    big = w.select(
        "lang",
        F.explode(
            # Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
            # guard short docs explicitly
            F.expr(
                "CASE WHEN size(toks) < 2 THEN"
                " CAST(array() AS array<struct<cur:string,nxt:string>>)"
                " ELSE transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS cur,"
                " element_at(toks, i + 1) AS nxt)) END"
            )
        ).alias("b"),
    ).select("lang", "b.cur", "b.nxt")
    pair = big.groupBy("lang", "cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("c_cn")
    )
    pair = scoped_persist(pair)
    ctx = pair.groupBy("lang", "cur").agg(
        F.sum("c_cn").cast("long").alias("c_c")
    )
    terms = pair.join(ctx, ["lang", "cur"]).select(
        "lang",
        "c_cn",
        F.expr(
            "CAST(ROUND(ln(CAST(c_cn AS DOUBLE) / c_c) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("lnp_e6"),
    )
    return terms.groupBy("lang").agg(
        F.sum("c_cn").cast("long").alias("n_bigrams"),
        F.expr(
            "CAST(-SUM(c_cn * lnp_e6) div SUM(c_cn) AS BIGINT)"
        ).alias("entropy_micro_nats"),
    )
