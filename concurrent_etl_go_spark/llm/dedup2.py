"""Containment dedup: the asymmetric near-duplicate signal.

Jaccard (``dedup_ngram_jaccard``) misses the most common real-world
duplication shape: document A embedded inside a larger B (quote +
commentary, article + boilerplate frame, v1 + v2-with-additions).
Jaccard(A, B) is small because B's extra content inflates the union,
but containment(A, B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
is ~1. Curation pipelines drop the CONTAINED side (A) and keep the
superset document.

This is the blocked-exact oracle twin (same role as
``dedup_ngram_jaccard`` -> ``dedup_minhash_lsh``): at 100 TB the
candidate pairs come from the same MinHash-LSH bucket join, and only
candidates get the exact containment verify — the MinHash estimator for
containment is the public "containment MinHash" construction (Broder's
resemblance/containment estimates from the same sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.text import tokens
from concurrent_etl_go_spark.sources.readers import read_table

CONTAINMENT_THRESHOLD = 0.8
_K = 3  # shingle width


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, distinct 3-token shingles) per document.  The
    scan is spread across cores before the CPU-heavy shingle transform
    (single-row-group parquet otherwise tokenizes on one task)."""
    from concurrent_etl_go_spark.operators.lib import parallelize_narrow_scan

    docs = parallelize_narrow_scan(
        read_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        ),
        "doc_id",
    ).select("doc_id", "lang", tokens("text").alias("w"))
    idx = F.when(
        F.size("w") >= _K, F.sequence(F.lit(1), F.size("w") - (_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at("w", i),
                F.element_at("w", i + 1),
                F.element_at("w", i + 2),
            ),
        )
    )
    return docs.select("doc_id", "lang", sh.alias("shingles"))


@query(
    "dedup_containment",
    scale_class="oracle_twin",  # blocked all-pairs; LSH candidates scale
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, lang,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   for i in range(1, greatest(len(w) - 2, 0) + 1)]) AS shingles
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
    SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(a.shingles), 4) AS containment
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE len(a.shingles) > 0
      AND len(b.shingles) > len(a.shingles)
      AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(a.shingles) >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs: (contained, container) where the
    smaller document's shingles are >= {t} contained in a strictly
    larger document's set, lang-blocked.

    The size asymmetry (|B| > |A|) halves the pair space and encodes
    the drop-the-contained-side decision; strictly-larger (not >=)
    keeps equal-size near-identical pairs in the symmetric Jaccard
    query where they belong.
    """
    sh = _shingle_sets(spark, sf_dir)
    a = sh.select(
        F.col("doc_id").alias("contained_id"),
        "lang",
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("container_id"),
        "lang",
        F.col("shingles").alias("sh_b"),
    )
    pairs = a.join(b, "lang").where(
        (F.col("contained_id") != F.col("container_id"))
        & (F.size("sh_a") > 0)
        & (F.size("sh_b") > F.size("sh_a"))
    )
    containment = F.size(F.array_intersect("sh_a", "sh_b")) / F.size("sh_a")
    return (
        pairs.where(containment >= CONTAINMENT_THRESHOLD)
        .select(
            "contained_id",
            "container_id",
            F.round(containment, 4).alias("containment"),
        )
    )


@query(
    "dedup_url_canonical",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'HTTPS://Docs.Example.COM:443/' || source || '?utm_campaign='
                 || doc_id || '&lang=' || lang || '#sec' AS url
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             lower(regexp_replace(regexp_extract(
                 regexp_replace(url, '#.*$', ''), '^[A-Za-z]+://[^/]+'),
                 ':443$', ''))
             || regexp_extract(regexp_replace(url, '#.*$', ''),
                 '^[A-Za-z]+://[^/]+(/[^?]*)', 1)
             || CASE WHEN len(list_sort(list_filter(string_split(
                      regexp_extract(regexp_replace(url, '#.*$', ''),
                          '\\?(.*)$', 1), '&'),
                      p -> NOT starts_with(p, 'utm_') AND p <> ''))) > 0
                 THEN '?' || array_to_string(list_sort(list_filter(
                      string_split(regexp_extract(
                          regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1),
                          '&'),
                      p -> NOT starts_with(p, 'utm_') AND p <> '')), '&')
                 ELSE '' END AS canonical_url
      FROM u
    )
    SELECT canonical_url, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_variants
    FROM c GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: collapse tracking-parameter variants of the same
    page onto one canonical URL and keep the lowest doc_id — the crawl
    frontier's first dedup gate (before any content is even fetched).
    The synthesized URLs differ per document ONLY in ``utm_campaign``
    and the fragment, so canonicalization (via the same
    ``canonicalize_url`` the normalizer query uses) genuinely merges
    them: one survivor per (source, lang) page.

    Scale: per-row string expressions + one hash aggregation on the
    canonical key — identical shape to ``dedup_exact``, applied to URLs.
    """
    from concurrent_etl_go_spark.operators.scalars2 import canonicalize_url

    docs = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Docs.Example.COM:443/"),
        F.col("source"),
        F.lit("?utm_campaign="),
        F.col("doc_id").cast("string"),
        F.lit("&lang="),
        F.col("lang"),
        F.lit("#sec"),
    )
    c = docs.select(
        "doc_id", canonicalize_url(url).alias("canonical_url")
    )
    return c.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )


#: Prefix-filter parameters: the exact-Jaccard gate in basis points and
#: its fraction form for the prefix-length rule.
_PF_T_BP = 5000
_PF_T = 0.5

#: Shared oracle fragment: per-document DISTINCT shingle tables in long
#: form (one row per (doc_id, shingle)), plus per-doc set sizes.
_PF_ORACLE_BASE = """
    tokd AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     for i in range(1, greatest(len(w) - 2, 0) + 1)])
               AS tok
      FROM tokd
    ),
    sz AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    )
"""


@query(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH {_PF_ORACLE_BASE},
    inter AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - n_inter AS BIGINT) AS n_union,
           CAST(n_inter * 10000 // (sa.n + sb.n - n_inter) AS BIGINT)
             AS j_bp
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE n_inter * 10000 >= {_PF_T_BP} * (sa.n + sb.n - n_inter)
    """,
)
def dedup_prefix_filter_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT shingle-Jaccard near-dup pairs via prefix filtering
    (AllPairs / PPJoin family — Bayardo et al. 2007, Xiao et al. 2008,
    public literature): the middle path the dedup family lacked —
    ``dedup_ngram_jaccard`` is the blocked all-pairs oracle twin and
    ``dedup_minhash_lsh`` trades recall for scale, while prefix
    filtering is BOTH exact and sub-quadratic.

    The theorem: under one global canonical token order, two sets with
    Jaccard >= t share >= ceil(t * |s|) tokens (J = o/(|a|+|b|-o) >= t
    implies o >= t * max(|a|, |b|)), so by pigeonhole they must collide
    inside each set's first |s| - ceil(t * |s|) + 1 tokens.  Ordering
    by ASCENDING document frequency (rarest first, shingle-text
    tie-break) makes those prefix tokens the rarest ones, so the
    candidate join fans out over the SHORTEST postings lists.
    Candidates then get the exact intersection verify; the output gate
    is the all-integer cross-multiplied comparison
    ``n_inter * 10000 >= t_bp * n_union`` — no float anywhere.

    The ORACLE is the plain all-pairs shared-token join: the driver
    hash proves the prefix filter LOSES NOTHING (exactness of the
    optimization, not just of one run).

    Scale: df ranking is one shingle-keyed hash agg; prefixes explode
    in place (|prefix| <= (1-t)|s| + 1 rows per doc); the candidate
    join is bounded by sum(df^2) over PREFIX tokens only — the rare
    end of the Zipf curve (``text_zipf_profile`` measures exactly that
    tail); verify touches candidates only, via two narrow-key joins.
    Round 11 adds PPJoin's LENGTH and POSITIONAL filters on the
    collision rows (the escalation path round 8 documented): both are
    integer inequalities evaluated inside the join before the
    distinct, both provably lossless (a qualifying pair passes the
    bound on every collision row), so the verify join sees strictly
    fewer pairs while the driver hash against the all-pairs oracle
    stays bit-identical.  Measured on the builder decade corpora
    (localdata, the BENCH_SF1 generator): distinct candidate pairs
    414,612 -> 314,584 (-24.1%) at sf0.1 and 946,337 -> 714,601
    (-24.5%) at sf1 — the cut ratio HOLDS across the decade, so the
    verify join's input shrinks by the same constant factor at any
    scale.

    Round-16 A/B notes (interleaved same-session runs at sf0.1, 5 each):
    the round-15 ``parallelize_narrow_scan`` repartition before the
    shingle transform measured neutral-to-worse here (median 5.29 s
    with vs 4.52 s without; mins 4.06 vs 3.93) — this query's cost is
    post-shuffle (the prefix self-join + candidate verify), so the
    extra exchange buys nothing — and is removed (the driver-flagged
    r15 regression resolves with it).  Also measured and rejected for
    the verify step: per-doc shingle-ARRAY intersection (fat string
    arrays through the join exchanges: 8-10 s vs 3.7 s), carrying the
    set sizes through the exploded verify rows (widens the pairs x
    tokens shuffle: 7.6 s min), and a per-pair min-positional-bound
    candidate gate (lossless but cut only 30 of 308k pairs).  The
    committed exploded verify + broadcast count joins is the measured
    optimum of the four shapes."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).select("doc_id", tokens("text").alias("w"))
    idx = F.when(
        F.size("w") >= _K, F.sequence(F.lit(1), F.size("w") - (_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh_long = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        idx,
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at("w", i),
                            F.element_at("w", i + 1),
                            F.element_at("w", i + 2),
                        ),
                    )
                )
            ).alias("tok"),
        )
    )
    from concurrent_etl_go_spark.operators.registry import scoped_persist

    sh_long = scoped_persist(sh_long)
    sz = sh_long.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_rank = sh_long.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    from pyspark.sql import Window

    # canonical position of each token within its document: ascending
    # (df, tok) — rarest first, deterministic tie-break
    w_doc = Window.partitionBy("doc_id").orderBy("df", "tok")
    pos = (
        sh_long.join(df_rank, "tok")
        .withColumn("pos", F.row_number().over(w_doc))
        .join(sz, "doc_id")
    )
    prefix = pos.where(
        F.col("pos")
        <= F.col("n") - F.ceil(F.col("n") * F.lit(_PF_T)) + 1
    ).select("doc_id", "tok", "pos", "n")
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin pruning on the collision rows, BEFORE the distinct and the
    # verify joins (both all-integer, both provably lossless):
    # - LENGTH filter: J >= t forces min(na,nb) >= t * max(na,nb).
    # - POSITIONAL filter: a common token at positions (pa, pb) bounds
    #   the overlap by min(pa-1, pb-1) + 1 + min(na-pa, nb-pb) (common
    #   tokens precede it in both sets or follow it in both); J >= t
    #   needs o * (10000 + t_bp) >= t_bp * (na + nb).  Every bound
    #   dominates the true overlap, so a qualifying pair passes on ALL
    #   its collision rows and can never be lost — the driver hash
    #   against the all-pairs oracle proves exactly that.
    o_req = F.lit(10000 + _PF_T_BP)
    ubound = (
        F.least(F.col("a.pos") - 1, F.col("b.pos") - 1)
        + 1
        + F.least(
            F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
        )
    )
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.lit(10000) * F.least(F.col("a.n"), F.col("b.n"))
                >= F.lit(_PF_T_BP) * F.greatest(F.col("a.n"), F.col("b.n"))
            )
            & (ubound * o_req >= F.lit(_PF_T_BP) * (F.col("a.n") + F.col("b.n"))),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    sa = sh_long.select(F.col("doc_id").alias("id_a"), "tok")
    sb = sh_long.select(F.col("doc_id").alias("id_b"), "tok")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    zb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    scored = (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .where(
            F.col("n_inter") * 10000 >= F.lit(_PF_T_BP) * F.col("n_union")
        )
    )
    return scored.select(
        "id_a",
        "id_b",
        "n_inter",
        "n_union",
        F.expr("n_inter * 10000 div n_union").alias("j_bp"),
    )
