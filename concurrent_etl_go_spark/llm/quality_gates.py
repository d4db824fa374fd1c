"""Rule-based corpus quality gates and lexical-diversity profiles —
the Gopher filtering rules and MATTR-style type-token curves a
pretraining pipeline applies before tokenization (Rae et al. 2021
"Scaling Language Models: ... Gopher" §A1.1; Covington & McFall 2010
MATTR — public literature), plus duplicate-cluster-balanced sampling
(the "each near-dup cluster contributes ~one survivor worth of
probability mass" mix rule used alongside dedup).

Cross-engine exactness: token counts, rule flags, e4 ratios and hash
buckets are exact integers computed by identical expressions in both
dialects (the ``hash_bucket`` md5 idiom for sampling; floor division
everywhere).  No float exists in any emitted column.

Scale: every query is one documents scan with per-doc token explodes
bounded by document length, followed by source-grain hash aggs —
map-heavy, shuffle-light, the shape that survives 100 TB.  Reference
parity: the reference (etl/main.go) has no text surface; extends
SURVEY.md §2.B's text/dataset-assembly families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: Gopher-style rule thresholds (integer lattice; the word-count and
#: mean-word-length bounds follow Rae et al. §A1.1, adapted to this
#: corpus's 10-99-word documents so each rule discriminates here).
_MIN_WORDS = 50
_MAX_WORDS = 100_000
_MIN_MEAN_LEN_E2 = 300  # mean word length >= 3.00 chars
_MAX_MEAN_LEN_E2 = 1000  # mean word length <= 10.00 chars
_MIN_STOPWORDS = 2  # distinct stopwords present
_MAX_TOP_WORD_E4 = 2000  # most frequent word <= 20% of tokens
_STOPWORDS = ("the", "a", "of", "to", "and", "in")

_SW_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    per_tok AS MATERIALIZED (
      SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2, 3
    ),
    per_doc AS MATERIALIZED (
      SELECT doc_id, source,
             CAST(SUM(tf) AS BIGINT) AS n_words,
             CAST(SUM(tf * len(tok)) * 100 // SUM(tf) AS BIGINT)
               AS mean_len_e2,
             CAST(COUNT(*) FILTER (WHERE tok IN {_SW_SQL}) AS BIGINT)
               AS n_stop,
             CAST(MAX(tf) * 10000 // SUM(tf) AS BIGINT) AS top_word_e4
      FROM per_tok GROUP BY 1, 2
    ),
    flagged AS (
      SELECT source,
             CASE WHEN n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
                  THEN 1 ELSE 0 END AS r_words,
             CASE WHEN mean_len_e2 BETWEEN {_MIN_MEAN_LEN_E2}
                  AND {_MAX_MEAN_LEN_E2} THEN 1 ELSE 0 END AS r_meanlen,
             CASE WHEN n_stop >= {_MIN_STOPWORDS} THEN 1 ELSE 0 END
               AS r_stop,
             CASE WHEN top_word_e4 <= {_MAX_TOP_WORD_E4} THEN 1 ELSE 0
               END AS r_rep
      FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(r_words) AS BIGINT) AS pass_word_count,
           CAST(SUM(r_meanlen) AS BIGINT) AS pass_mean_len,
           CAST(SUM(r_stop) AS BIGINT) AS pass_stopwords,
           CAST(SUM(r_rep) AS BIGINT) AS pass_repetition,
           CAST(SUM(r_words * r_meanlen * r_stop * r_rep) AS BIGINT)
             AS pass_all,
           CAST(SUM(r_words * r_meanlen * r_stop * r_rep) * 10000
                // COUNT(*) AS BIGINT) AS pass_all_e4
    FROM flagged GROUP BY source
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate, reported per source feed:
    four rules — word count in [{_MIN_WORDS}, {_MAX_WORDS}], mean word
    length in [3, 10] chars (x100 lattice), >= {_MIN_STOPWORDS} distinct
    stopwords present, most-frequent-word share <= 20% (x1e4) — with
    per-rule pass counts and the all-rules survivor rate.  The per-rule
    breakdown is the dashboard a curation team actually reads: it shows
    WHICH rule is responsible for a feed's rejections.

    Scale: one documents scan, token-explode bounded by doc length,
    (doc, token) and doc-grain hash aggs, then a |sources|-row report."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("tok"),
    )
    per_tok = tok.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    sw = list(_STOPWORDS)
    per_doc = per_tok.groupBy("doc_id", "source").agg(
        F.sum("tf").cast("long").alias("n_words"),
        F.expr(
            "CAST(SUM(tf * length(tok)) * 100 div SUM(tf) AS BIGINT)"
        ).alias("mean_len_e2"),
        F.sum(F.when(F.col("tok").isin(sw), 1).otherwise(0))
        .cast("long")
        .alias("n_stop"),
        F.expr("CAST(MAX(tf) * 10000 div SUM(tf) AS BIGINT)").alias(
            "top_word_e4"
        ),
    )
    flagged = per_doc.select(
        "source",
        F.when(
            F.col("n_words").between(_MIN_WORDS, _MAX_WORDS), 1
        ).otherwise(0).alias("r_words"),
        F.when(
            F.col("mean_len_e2").between(
                _MIN_MEAN_LEN_E2, _MAX_MEAN_LEN_E2
            ),
            1,
        ).otherwise(0).alias("r_meanlen"),
        F.when(F.col("n_stop") >= _MIN_STOPWORDS, 1)
        .otherwise(0)
        .alias("r_stop"),
        F.when(F.col("top_word_e4") <= _MAX_TOP_WORD_E4, 1)
        .otherwise(0)
        .alias("r_rep"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("r_words").cast("long").alias("pass_word_count"),
        F.sum("r_meanlen").cast("long").alias("pass_mean_len"),
        F.sum("r_stop").cast("long").alias("pass_stopwords"),
        F.sum("r_rep").cast("long").alias("pass_repetition"),
        F.sum(
            F.col("r_words")
            * F.col("r_meanlen")
            * F.col("r_stop")
            * F.col("r_rep")
        )
        .cast("long")
        .alias("pass_all"),
        F.expr(
            "CAST(SUM(r_words * r_meanlen * r_stop * r_rep) * 10000"
            " div COUNT(*) AS BIGINT)"
        ).alias("pass_all_e4"),
    )


_TTR_PREFIXES = (10, 25, 50)


@query(
    "text_ttr_prefix_profile",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source, u.tok AS tok, u.pos AS pos
      FROM documents,
           UNNEST(list_transform(string_split(text, ' '),
                  (x, i) -> struct_pack(tok := x, pos := i))) AS t(u)
    ),
    firsts AS MATERIALIZED (
      SELECT doc_id, source, pos,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY doc_id, tok
                                          ORDER BY pos) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM tok
    ),
    per_doc AS MATERIALIZED (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             {", ".join(
                 f"CAST(SUM(CASE WHEN pos <= {p} THEN is_first ELSE 0 END)"
                 f" * 10000 // LEAST(CAST(COUNT(*) AS BIGINT), {p})"
                 f" AS BIGINT) AS ttr{p}_e4"
                 for p in _TTR_PREFIXES
             )}
      FROM firsts GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           {", ".join(
               f"CAST(SUM(ttr{p}_e4) // COUNT(*) AS BIGINT)"
               f" AS avg_ttr{p}_e4"
               for p in _TTR_PREFIXES
           )}
    FROM per_doc GROUP BY source
    """,
)
def text_ttr_prefix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio at fixed prefix lengths (10/25/50 tokens) per
    source feed — the windowed TTR family (MATTR) that measures lexical
    diversity WITHOUT the document-length bias of the raw TTR: each
    prefix compares distinct types seen by position p against
    min(p, doc length), x1e4, floor-averaged per source.  Feeds whose
    early tokens repeat (template boilerplate) score low at p=10
    before the full-document ratio can hide it.

    Scale: token explode with position, one (doc, tok) first-occurrence
    window bounded by doc length, doc- then source-grain hash aggs."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).select("doc_id", "source", "tok", (F.col("pos0") + 1).alias("pos"))
    w = Window.partitionBy("doc_id", "tok").orderBy("pos")
    firsts = tok.select(
        "doc_id",
        "source",
        "pos",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_tok")] + [
        F.expr(
            f"CAST(SUM(CASE WHEN pos <= {p} THEN is_first ELSE 0 END)"
            f" * 10000 div LEAST(CAST(COUNT(*) AS BIGINT), {p})"
            f" AS BIGINT)"
        ).alias(f"ttr{p}_e4")
        for p in _TTR_PREFIXES
    ]
    per_doc = firsts.groupBy("doc_id", "source").agg(*aggs)
    out_aggs = [F.count(F.lit(1)).cast("long").alias("docs")] + [
        F.expr(f"CAST(SUM(ttr{p}_e4) div COUNT(*) AS BIGINT)").alias(
            f"avg_ttr{p}_e4"
        )
        for p in _TTR_PREFIXES
    ]
    return per_doc.groupBy("source").agg(*out_aggs)


#: Waterfill mix: temperature for source weights, budget as a fraction
#: of the corpus, and the number of unrolled redistribution rounds.
_WF_TAU = 0.7
_WF_BUDGET_PCT = 40  # budget = 40% of total docs
_WF_ROUNDS = 2


def _wf_oracle() -> str:
    steps = [
        f"""a0 AS MATERIALIZED (
        SELECT source, avail, q_e9,
               LEAST(avail, CAST(b.budget * q_e9 // qs.qsum AS BIGINT))
                 AS alloc
        FROM q CROSS JOIN b CROSS JOIN qs
    )"""
    ]
    for k in range(1, _WF_ROUNDS + 1):
        p = k - 1
        steps.append(
            f"""left{k} AS MATERIALIZED (
        SELECT b.budget - SUM(alloc) AS leftover FROM a{p} CROSS JOIN b
        GROUP BY b.budget
    ),
    qs{k} AS MATERIALIZED (
        SELECT COALESCE(SUM(q_e9) FILTER (WHERE alloc < avail), 0)
                 AS qsum_open
        FROM a{p}
    ),
    a{k} AS MATERIALIZED (
        SELECT a.source, a.avail, a.q_e9,
               CASE WHEN a.alloc < a.avail AND s.qsum_open > 0
                    THEN LEAST(a.avail,
                         a.alloc + CAST(l.leftover * a.q_e9
                                        // s.qsum_open AS BIGINT))
                    ELSE a.alloc END AS alloc
        FROM a{p} a CROSS JOIN left{k} l CROSS JOIN qs{k} s
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH t AS MATERIALIZED (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    tot AS MATERIALIZED (SELECT SUM(avail) AS total FROM t),
    b AS MATERIALIZED (
      SELECT CAST(total * {_WF_BUDGET_PCT} // 100 AS BIGINT) AS budget
      FROM tot
    ),
    q AS MATERIALIZED (
      SELECT source, avail,
             CAST(ROUND(pow(CAST(avail AS DOUBLE) / tot.total,
                            {_WF_TAU}) * 1000000000, 0) AS BIGINT)
               AS q_e9
      FROM t CROSS JOIN tot
    ),
    qs AS MATERIALIZED (SELECT SUM(q_e9) AS qsum FROM q),
    {chain}
    SELECT a.source, a.avail,
           CAST(a.q_e9 * 10000 // qs.qsum AS BIGINT) AS target_share_bp,
           CAST(a.alloc AS BIGINT) AS alloc,
           CASE WHEN a.alloc >= a.avail THEN 1 ELSE 0 END AS capped,
           CAST(a.alloc * 10000 // a.avail AS BIGINT) AS fill_e4
    FROM a{_WF_ROUNDS} a CROSS JOIN qs
    """


@query("dataset_mix_waterfill", oracle=_wf_oracle())
def dataset_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained sampling-mix waterfill: allocate a document
    budget ({_WF_BUDGET_PCT}% of the corpus) across source feeds
    proportionally to temperature-scaled weights ``(share)^tau``
    (tau = {_WF_TAU}, the ``dataset_mix_temperature_weights`` pinning
    convention), CAPPED at each feed's availability, with
    ``_WF_ROUNDS`` unrolled redistribution rounds pushing the capped
    feeds' unused budget back onto the open feeds — the allocation a
    mix planner actually runs when small feeds can't satisfy their
    temperature share.  All integer: counts, e9-pinned weights, floor
    divisions; both dialects execute the identical rounds.

    Scale: one documents scan to |sources| rows; every round is
    constant-size arithmetic over that table."""
    t = scoped_persist(
        read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("avail"))
    )
    tot = t.agg(F.sum("avail").alias("total"))
    budget = tot.select(
        F.expr(
            f"CAST(total * {_WF_BUDGET_PCT} div 100 AS BIGINT)"
        ).alias("budget")
    )
    q = t.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        F.expr(
            f"CAST(ROUND(pow(CAST(avail AS DOUBLE) / total,"
            f" {_WF_TAU}) * 1000000000, 0) AS BIGINT)"
        ).alias("q_e9"),
    )
    qs = q.agg(F.sum("q_e9").alias("qsum"))
    a = (
        q.crossJoin(F.broadcast(budget))
        .crossJoin(F.broadcast(qs))
        .select(
            "source",
            "avail",
            "q_e9",
            F.expr(
                "LEAST(avail, CAST(budget * q_e9 div qsum AS BIGINT))"
            ).alias("alloc"),
        )
    )
    for _ in range(_WF_ROUNDS):
        a = scoped_persist(a)
        leftover = a.crossJoin(F.broadcast(budget)).agg(
            (F.first("budget") - F.sum("alloc")).alias("leftover")
        )
        qsum_open = a.agg(
            F.coalesce(
                F.sum(F.when(F.col("alloc") < F.col("avail"), F.col("q_e9"))),
                F.lit(0),
            ).alias("qsum_open")
        )
        a = (
            a.crossJoin(F.broadcast(leftover))
            .crossJoin(F.broadcast(qsum_open))
            .select(
                "source",
                "avail",
                "q_e9",
                F.expr(
                    "CASE WHEN alloc < avail AND qsum_open > 0"
                    " THEN LEAST(avail, alloc + CAST(leftover * q_e9"
                    " div qsum_open AS BIGINT))"
                    " ELSE alloc END"
                ).alias("alloc"),
            )
        )
    return a.crossJoin(F.broadcast(qs)).select(
        "source",
        "avail",
        F.expr("CAST(q_e9 * 10000 div qsum AS BIGINT)").alias(
            "target_share_bp"
        ),
        F.col("alloc").cast("long").alias("alloc"),
        F.when(F.col("alloc") >= F.col("avail"), 1)
        .otherwise(0)
        .alias("capped"),
        F.expr("CAST(alloc * 10000 div avail AS BIGINT)").alias(
            "fill_e4"
        ),
    )


@query(
    "dataset_cluster_balanced_sample",
    oracle="""
    WITH clus AS MATERIALIZED (
      SELECT doc_id, source, md5(text) AS ckey
      FROM documents
    ),
    sized AS MATERIALIZED (
      SELECT doc_id, source, ckey,
             CAST(COUNT(*) OVER (PARTITION BY ckey) AS BIGINT) AS csize
      FROM clus
    ),
    decided AS (
      SELECT source, csize,
             CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        ::BIGINT % 10000) * csize < 10000
                  THEN 1 ELSE 0 END AS keep
      FROM sized
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS in_dup_clusters,
           CAST(SUM(keep) AS BIGINT) AS sampled,
           CAST(SUM(keep) * 10000 // COUNT(*) AS BIGINT) AS sample_e4
    FROM decided GROUP BY source
    """,
)
def dataset_cluster_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-cluster-balanced sampling report: each exact-dup
    cluster (md5 of the text) contributes ~one document's worth of
    probability mass — a member of a size-``s`` cluster is kept with
    probability 1/s via the deterministic md5 bucket (``keep iff
    bucket_1e4 * s < 1e4``), so over-replicated content cannot dominate
    the training mix even before hard dedup runs.  Per source: docs,
    members of non-trivial clusters, kept count and rate (x1e4).

    Scale: one documents scan, a cluster-key hash count (window over
    cluster-sized partitions — clusters are small by construction),
    map-side keep decisions, source-grain report."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    sized = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("ckey"),
    ).withColumn(
        "csize",
        F.count(F.lit(1))
        .over(Window.partitionBy("ckey"))
        .cast("long"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 10000
    )
    decided = sized.select(
        "source",
        "csize",
        F.when(bucket * F.col("csize") < 10000, 1).otherwise(0).alias(
            "keep"
        ),
    )
    return decided.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum(F.when(F.col("csize") > 1, 1).otherwise(0))
        .cast("long")
        .alias("in_dup_clusters"),
        F.sum("keep").cast("long").alias("sampled"),
        F.expr("CAST(SUM(keep) * 10000 div COUNT(*) AS BIGINT)").alias(
            "sample_e4"
        ),
    )
