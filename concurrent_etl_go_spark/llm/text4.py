"""Corpus-distribution analytics, part 4: mutual information between
document dimensions, RAKE keyword extraction, and the cross-document
n-gram novelty curve.

* ``text_mutual_information`` — MI(lang; source) in nats (Shannon/
  Cover & Thomas, public literature): the "is my corpus mix
  confounded" diagnostic — high MI means language and source are
  entangled and a per-source rebalance will shift the language mix.
  One row per OBSERVED joint cell (zero cells contribute exactly 0 to
  MI) with its PMI and MI contribution, plus the corpus total.
* ``text_rake_keywords`` — RAKE (Rose, Engel, Cramer & Cowley 2010,
  public literature): split each document into candidate phrases at
  stopwords, score every word by degree/frequency where degree sums
  the lengths of the phrases containing it.  The classic cheap
  keyword extractor a curation pipeline runs corpus-wide.
* ``text_novelty_curve`` — per (source, doc-order decile): the share
  of 3-gram shingles FIRST SEEN in that decile — the marginal-novelty
  curve that tells a pretraining pipeline when a source stops
  contributing new content (the shingle-level complement of
  ``text_vocab_growth``'s unigram curve).

Exactness: counts are integers; PMI/MI floats are single shared-text
trees over ``CAST(x AS DOUBLE)`` int64 inputs (explicit casts, not the
``1.0 *`` widening — decimal-literal multiplication types the tree as
DECIMAL in Spark).  The corpus-total MI would be an order-dependent
float sum, so each cell's contribution is FLOOR'd to integer
nano-nats FIRST — floor of a bit-identical double is bit-identical —
and the total is an exact integer SUM (order-independent by
construction).  RAKE and novelty emit pure integer floor-divided
ratios.

Scale: MI is a 100-cell hash agg; RAKE is one posexplode + per-doc
bounded windows + a word-keyed agg; novelty is a shingle-keyed agg
(the same shuffle class as the dedup family).  Reference parity: no
text surface exists in the reference (etl/main.go); extends
SURVEY.md §2.B's text-analysis family beside ``llm/text3.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.text import EN_STOPWORDS
from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

# --------------------------------------------------------------------------
# mutual information lang x source
# --------------------------------------------------------------------------

#: Shared float fragments over exact int64 columns (n_ij, r, c, n).
#: ``ln`` is NOT ulp-identical across engines (JVM Math.log vs libm),
#: so the PMI is pinned to the 1e-4 grid FIRST (the proven JSD/log-odds
#: idiom); every downstream value is then a bit-identical function of
#: that shared double, so the FLOOR is deterministic.
_PMI_RAW = "ln((CAST(n_ij AS DOUBLE) * n) / (CAST(r AS DOUBLE) * c))"
_PMI = f"(ROUND({_PMI_RAW}, 4) + 0.0)"
_MI_CONTRIB = f"(CAST(n_ij AS DOUBLE) / n) * {_PMI}"
#: Integer nano-nats: FLOOR of the bit-identical contribution double.
_MI_E9 = f"CAST(FLOOR(({_MI_CONTRIB}) * 1000000000.0) AS BIGINT)"


@query(
    "text_mutual_information",
    oracle=f"""
    WITH cells AS MATERIALIZED (
      SELECT lang, source, COUNT(*) AS n_ij
      FROM documents GROUP BY 1, 2
    ),
    marg AS MATERIALIZED (
      SELECT lang, source, n_ij,
             SUM(n_ij) OVER (PARTITION BY lang) AS r,
             SUM(n_ij) OVER (PARTITION BY source) AS c,
             SUM(n_ij) OVER () AS n
      FROM cells
    ),
    contrib AS MATERIALIZED (
      SELECT lang, source,
             CAST(n_ij AS BIGINT) AS n_ij,
             CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
             CAST(n AS BIGINT) AS n
      FROM marg
    ),
    scored AS MATERIALIZED (
      SELECT lang, source, n_ij, r, c, n,
             {_PMI} AS pmi,
             {_MI_E9} AS contrib_e9
      FROM contrib
    ),
    tot AS (SELECT CAST(SUM(contrib_e9) AS BIGINT) AS mi_e9 FROM scored)
    SELECT lang, source, n_ij, r, c, n, pmi, contrib_e9, mi_e9
    FROM scored CROSS JOIN tot
    """,
)
def text_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source: one
    row per observed joint cell with its exact counts, PMI (unrounded
    shared tree), floor-integer contribution in nano-nats, and the
    exact-integer corpus MI total (order-independent because floor
    happens per cell BEFORE the sum)."""
    docs = read_table(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    marg = cells.select(
        "lang",
        "source",
        "n_ij",
        F.sum("n_ij").over(Window.partitionBy("lang")).alias("r"),
        F.sum("n_ij").over(Window.partitionBy("source")).alias("c"),
        F.sum("n_ij").over(Window.partitionBy()).alias("n"),
    )
    contrib = marg.select(
        "lang",
        "source",
        F.col("n_ij").cast("long").alias("n_ij"),
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        F.col("n").cast("long").alias("n"),
    )
    scored = scoped_persist(
        contrib.select(
            "lang",
            "source",
            "n_ij",
            "r",
            "c",
            "n",
            F.expr(_PMI).alias("pmi"),
            F.expr(_MI_E9).alias("contrib_e9"),
        )
    )
    tot = scored.agg(F.sum("contrib_e9").cast("long").alias("mi_e9"))
    return scored.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "n_ij", "r", "c", "n", "pmi", "contrib_e9",
        "mi_e9",
    )


# --------------------------------------------------------------------------
# RAKE keyword scores
# --------------------------------------------------------------------------

_RAKE_TOP = 25
_RAKE_MIN_FREQ = 3
_STOP_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, lower(unnest(string_split(text, ' '))) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    marked AS MATERIALIZED (
      SELECT doc_id, tok, pos,
             CASE WHEN tok IN ({_STOP_SQL}) THEN 1 ELSE 0 END AS stop,
             SUM(CASE WHEN tok IN ({_STOP_SQL}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM toks
    ),
    phrase_words AS MATERIALIZED (
      SELECT doc_id, sid, tok,
             COUNT(*) OVER (PARTITION BY doc_id, sid) AS phrase_len
      FROM marked WHERE stop = 0 AND tok <> ''
    ),
    words AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(phrase_len) AS BIGINT) AS degree
      FROM phrase_words GROUP BY 1
    )
    SELECT word, freq, degree,
           CAST(degree * 1000000 // freq AS BIGINT) AS score_e6,
           (CAST(degree AS DOUBLE) / freq) + 0.0 AS score
    FROM words
    WHERE freq >= {_RAKE_MIN_FREQ}
    ORDER BY score_e6 DESC, word LIMIT {_RAKE_TOP}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scores over the corpus: documents split into
    candidate phrases at stopwords (gaps-and-islands on the token
    stream — the island id is the running stopword count), each word
    scored degree/frequency where degree sums the token lengths of the
    phrases it appears in.  Top {_RAKE_TOP} words with freq >=
    {_RAKE_MIN_FREQ}, ties broken by word.

    Scale: posexplode -> per-DOC bounded windows (docs are <=100
    tokens) -> one word-keyed hash agg; no corpus-sized window."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok0"),
    ).select("doc_id", "pos", F.lower("tok0").alias("tok"))
    stop = F.col("tok").isin(*EN_STOPWORDS).cast("int")
    wd = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = toks.select(
        "doc_id",
        "tok",
        "pos",
        stop.alias("stop"),
        F.sum(stop).over(wd).alias("sid"),
    )
    pw = marked.where((F.col("stop") == 0) & (F.col("tok") != "")).select(
        "doc_id",
        "sid",
        "tok",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id", "sid"))
        .alias("phrase_len"),
    )
    words = pw.groupBy(F.col("tok").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("phrase_len").cast("long").alias("degree"),
    )
    return (
        words.where(F.col("freq") >= _RAKE_MIN_FREQ)
        .select(
            "word",
            "freq",
            "degree",
            F.expr("CAST(degree * 1000000 div freq AS BIGINT)").alias(
                "score_e6"
            ),
            F.expr("(CAST(degree AS DOUBLE) / freq) + 0.0").alias("score"),
        )
        .orderBy(F.desc("score_e6"), "word")
        .limit(_RAKE_TOP)
    )


# --------------------------------------------------------------------------
# n-gram novelty curve per source
# --------------------------------------------------------------------------

_NOV_N = 3  # shingle width
_NOV_BUCKETS = 10


@query(
    "text_novelty_curve",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, source, string_split(text, ' ') AS toks
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, source, shingle
      FROM (
        SELECT doc_id, source,
               unnest([array_to_string(toks[i:i + {_NOV_N - 1}], ' ')
                       for i in range(1, len(toks) - {_NOV_N - 2})])
                 AS shingle
        FROM base
      )
    ),
    ranks AS MATERIALIZED (
      SELECT doc_id, source,
             CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                   - 1) * {_NOV_BUCKETS} //
                  COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS decile
      FROM base
    ),
    pairs AS MATERIALIZED (
      SELECT sh.source, r.decile, sh.shingle, sh.doc_id
      FROM sh JOIN ranks r ON sh.doc_id = r.doc_id
    ),
    firsts AS MATERIALIZED (
      SELECT source, shingle, MIN(doc_id) AS owner
      FROM pairs GROUP BY 1, 2
    ),
    novel AS (
      SELECT p.source, p.decile, COUNT(*) AS novel
      FROM firsts f JOIN pairs p
        ON f.source = p.source AND f.shingle = p.shingle
           AND f.owner = p.doc_id
      GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, decile, COUNT(*) AS pairs
      FROM pairs GROUP BY 1, 2
    )
    SELECT t.source, t.decile, CAST(t.pairs AS BIGINT) AS pairs,
           CAST(COALESCE(n.novel, 0) AS BIGINT) AS novel,
           CAST(COALESCE(n.novel, 0) * 1000000 // t.pairs AS BIGINT)
             AS novelty_e6
    FROM totals t LEFT JOIN novel n
      ON t.source = n.source AND t.decile = n.decile
    """,
)
def text_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty curve per source: documents are bucketed into
    {_NOV_BUCKETS} doc-id-order deciles, every doc contributes its
    DISTINCT {_NOV_N}-gram shingles, and each decile reports how many
    of its shingle occurrences are the source's FIRST sighting (the
    shingle's min doc_id falls in that decile).  A flattening curve
    means the source has stopped contributing new content.

    Scale: the shingle-keyed agg is the dedup-family shuffle; the
    per-source rank window is doc-count sized (bounded per group)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    base = docs.select("doc_id", "source", F.split("text", " ").alias("toks"))
    sh = (
        base.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    # sequence(1, 0) DESCENDS in Spark — guard short docs
                    f"CASE WHEN size(toks) < {_NOV_N} THEN array()"
                    f" ELSE transform(sequence(1, size(toks)"
                    f" - {_NOV_N - 1}), i -> concat_ws(' ', "
                    + ", ".join(
                        f"element_at(toks, i + {j})" for j in range(_NOV_N)
                    )
                    + ")) END"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    ranks = base.select(
        "doc_id",
        "source",
        F.expr(
            f"CAST((ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)"
            f" - 1) * {_NOV_BUCKETS} div"
            f" COUNT(*) OVER (PARTITION BY source) AS BIGINT)"
        ).alias("decile"),
    )
    pairs = scoped_persist(
        sh.join(ranks.select("doc_id", "decile"), "doc_id").select(
            "source", "decile", "shingle", "doc_id"
        )
    )
    firsts = pairs.groupBy(
        F.col("source").alias("f_source"),
        F.col("shingle").alias("f_shingle"),
    ).agg(F.min("doc_id").alias("owner"))
    novel = (
        firsts.join(
            pairs,
            (F.col("f_source") == F.col("source"))
            & (F.col("f_shingle") == F.col("shingle"))
            & (F.col("owner") == F.col("doc_id")),
        )
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).alias("novel"))
    )
    totals = pairs.groupBy("source", "decile").agg(
        F.count(F.lit(1)).alias("pairs")
    )
    return (
        totals.join(novel, ["source", "decile"], "left")
        .select(
            "source",
            "decile",
            F.col("pairs").cast("long").alias("pairs"),
            F.coalesce("novel", F.lit(0)).cast("long").alias("novel"),
            F.expr(
                "CAST(COALESCE(novel, 0) * 1000000 div pairs AS BIGINT)"
            ).alias("novelty_e6"),
        )
    )
