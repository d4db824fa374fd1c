"""Corpus-statistics operators for training-data curation, part 2:
token-rarity scoring (the integer-exact stand-in for LM-perplexity
filtering, CCNet-style — Wenzek et al. 2020), per-token burstiness
(Church & Gale 1995 — variance-to-mean of per-document counts), and a
Bloom-prefilter calibration for decontamination (Bloom 1970; the
broadcast-bits refinement of ``corpus_decontaminate``'s shingle join).

Cross-engine exactness: document frequencies, conditional sums, the
md5-derived Bloom bit positions and every emitted ratio live on integer
lattices (e4/e6 floor quotients, cleared-denominator variance
cancellations) — no float exists in any emitted column.

Scale:

* rarity/burstiness are one tokenized-documents scan -> token-keyed
  hash aggs (vocabulary-sized frames downstream);
* the Bloom calibration's bit-set is BOUNDED BY THE FILTER SIZE
  (``<= 2 * |eval shingles|`` distinct positions, never corpus-scale),
  so at 100 TB the bits broadcast and the contamination pre-screen is
  one map-side membership check per training shingle — the shuffle-free
  shape that motivates Bloom prefilters in production dedup, with the
  realized false-positive rate hash-pinned per source here.

Reference parity: the reference (etl/main.go) has no text surface;
extends SURVEY.md §2.B's text/dedup families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.datasets import _SQL_BUCKET, hash_bucket
from concurrent_etl_go_spark.llm.text import tokenized_docs
from concurrent_etl_go_spark.operators.registry import query, scoped_persist

#: Bloom geometry: positions in [0, _BLOOM_M) from two independent md5
#: substrings (k = 2 hash functions).  At sf0.01 the eval split sets
#: ~2.5k of 131k bits -> load factor ~2%, realized FPR ~0.04% — sized
#: so both sides of the calibration are non-degenerate at test scale.
_BLOOM_M = 131072


def _bloom_h1(col) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % _BLOOM_M
    )


def _bloom_h2(col) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long")
        % _BLOOM_M
    )


#: DuckDB twins of the two position hashes (same md5 nibbles).
_SQL_H1 = f"(('0x' || substr(md5(shingle), 1, 8))::BIGINT % {_BLOOM_M})"
_SQL_H2 = f"(('0x' || substr(md5(shingle), 9, 8))::BIGINT % {_BLOOM_M})"


@query(
    "text_rarity_score",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, source, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2, 3
    ),
    df AS MATERIALIZED (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT t.doc_id, t.source,
           CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(t.tf * d.df) * 10000
                // (SUM(t.tf) * (SELECT n_docs FROM nd)) AS BIGINT)
             AS mean_df_e4
    FROM tf t JOIN df d USING (tok)
    GROUP BY 1, 2
    """,
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-rarity score: the token-frequency-weighted
    mean CORPUS document frequency of a document's tokens, as a
    fraction of the corpus on the e4 lattice.  Low scores mark
    rare-vocabulary documents — the integer-exact proxy for the
    LM-perplexity filter CCNet applies (a document of common,
    well-distributed tokens scores high exactly where a unigram LM
    assigns it low perplexity), with none of the transcendental float
    risk an actual log-likelihood would carry cross-engine.

    Scale: one tokenized scan -> (doc, token) counts; the df table is
    vocabulary-sized and re-joins token-keyed (map-side after AQE
    broadcasts it); output is one row per document."""
    docs = tokenized_docs(spark, sf_dir)
    tf = (
        docs.select(
            "doc_id", "source", F.explode("toks").alias("tok")
        )
        .groupBy("doc_id", "source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    tf = scoped_persist(tf)
    df = tf.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    n_docs = docs.count()
    return (
        tf.join(df, "tok")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.expr(
                f"SUM(tf * df) * 10000 div (SUM(tf) * {n_docs})"
            )
            .cast("long")
            .alias("mean_df_e4"),
        )
    )


@query(
    "text_burstiness",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    comp AS (
      SELECT tok,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM tf GROUP BY 1
    )
    SELECT tok, df, s1 AS total_count,
           CAST(((SELECT n FROM nd) * s2 - s1 * s1) * 10000
                // ((SELECT n FROM nd) * s1) AS BIGINT) AS vmr_e4
    FROM comp
    WHERE df >= 100
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token burstiness (Church & Gale): the variance-to-mean ratio
    of per-document counts OVER ALL documents (absent docs count 0 —
    they enter through the cleared-denominator algebra, never through a
    dense zero-filled table).  With per-doc counts c over D documents,
    ``VMR = (D*S2 - S1^2) / (D*S1)`` exactly — a Poisson-scattered
    token sits at VMR ~= 1, topical/bursty tokens run higher.  The
    cancellation runs in DECIMAL(38,0)/HUGEINT (the round-11 beta
    lesson, mirroring finance5): at larger sf a frequent token's
    ``D*S2`` / ``S1^2`` / ``*10000`` rescale would overflow int64 and
    die under ANSI mode.  Emitted
    on the e4 lattice; tokens in fewer than 100 docs are dropped (their
    VMR is df-noise, and the threshold keeps the output
    vocabulary-bounded).

    Scale: one tokenized scan -> (doc, token) counts -> token-keyed
    hash agg; no shuffle ever carries more than the (doc, token)
    count table."""
    docs = tokenized_docs(spark, sf_dir)
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = docs.count()
    comp = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return comp.where(F.col("df") >= 100).select(
        "tok",
        "df",
        F.col("s1").alias("total_count"),
        F.expr(
            f"(CAST({n} AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)"
            f" * 10000 div (CAST({n} AS DECIMAL(38,0)) * s1)"
        )
        .cast("long")
        .alias("vmr_e4"),
    )


@query(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, source, {_SQL_BUCKET} AS bucket,
             string_split(text, ' ') AS w
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT doc_id, source, bucket,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, greatest(len(w) - 2, 0) + 1)])) AS shingle
      FROM toks
    ),
    ev AS MATERIALIZED (
      SELECT DISTINCT shingle FROM sh WHERE bucket >= 95
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT b FROM (
        SELECT {_SQL_H1} AS b FROM ev
        UNION ALL SELECT {_SQL_H2} AS b FROM ev
      )
    ),
    tr AS MATERIALIZED (
      SELECT source, shingle,
             CASE WHEN {_SQL_H1} IN (SELECT b FROM bits)
                   AND {_SQL_H2} IN (SELECT b FROM bits)
                  THEN 1 ELSE 0 END AS bloom_pos,
             CASE WHEN shingle IN (SELECT shingle FROM ev)
                  THEN 1 ELSE 0 END AS member
      FROM sh WHERE bucket < 95
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(bloom_pos) AS BIGINT) AS bloom_hits,
           CAST(SUM(member) AS BIGINT) AS exact_hits,
           CAST(SUM(bloom_pos) - SUM(member) AS BIGINT) AS false_pos,
           CAST(CASE WHEN COUNT(*) = SUM(member) THEN NULL
                ELSE (SUM(bloom_pos) - SUM(member)) * 1000000
                     // (COUNT(*) - SUM(member)) END AS BIGINT) AS fpr_e6
    FROM tr GROUP BY source
    """,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefilter calibration for decontamination: build a Bloom
    filter (m = {m}, k = 2 md5-derived hashes) over the eval split's
    distinct 3-token shingles, pre-screen every TRAINING shingle
    against it, and hash-pin the realized per-source false-positive
    rate against exact membership.

    This is the 100 TB refinement of ``corpus_decontaminate``: the
    filter's set-bit table is bounded by 2*|eval shingles| regardless
    of corpus size, so it broadcasts where the exact shingle set may
    not, and the exact join then runs only over the bloom-positive
    survivors (here both paths are computed to MEASURE the proxy's
    error, exactly like ``dedup_minhash_calibration`` measures the LSH
    S-curve; ``sketch_bloom_membership`` in operators/sketches2.py
    hash-proves the bloom MEMBERSHIP algebra itself over a key column —
    this query applies it to the decontamination shingle domain and
    emits the per-source error rates, and
    ``corpus_decontaminate_bloom`` below deploys it as the lossless
    production pre-filter).  A shingle is bloom-positive iff BOTH its
    bit positions are set — the standard k=2 conjunction.

    Everything is integer: md5-nibble bit positions, conditional sums,
    one e6-lattice FPR quotient over the true negatives.

    Scale: eval bits broadcast; the training side is one scan with two
    map-side membership joins; output is source-grain."""
    from concurrent_etl_go_spark.llm.dedup import shingles_from_tokens

    docs = tokenized_docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        "source",
        hash_bucket("doc_id").alias("bucket"),
        F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"),
    )
    sh = scoped_persist(sh)
    ev = sh.where(F.col("bucket") >= 95).select("shingle").distinct()
    ev = scoped_persist(ev)
    bits = (
        ev.select(_bloom_h1(F.col("shingle")).alias("b"))
        .unionByName(ev.select(_bloom_h2(F.col("shingle")).alias("b")))
        .distinct()
    )
    tr = sh.where(F.col("bucket") < 95).select(
        "source",
        "shingle",
        _bloom_h1(F.col("shingle")).alias("h1"),
        _bloom_h2(F.col("shingle")).alias("h2"),
    )
    b1 = bits.withColumnRenamed("b", "h1").withColumn("f1", F.lit(1))
    b2 = bits.withColumnRenamed("b", "h2").withColumn("f2", F.lit(1))
    evm = ev.withColumn("fm", F.lit(1))
    flagged = (
        tr.join(F.broadcast(b1), "h1", "left")
        .join(F.broadcast(b2), "h2", "left")
        .join(evm, "shingle", "left")
        .select(
            "source",
            F.when(
                F.col("f1").isNotNull() & F.col("f2").isNotNull(), 1
            )
            .otherwise(0)
            .alias("bloom_pos"),
            F.when(F.col("fm").isNotNull(), 1).otherwise(0).alias("member"),
        )
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("bloom_pos").cast("long").alias("bloom_hits"),
        F.sum("member").cast("long").alias("exact_hits"),
        (F.sum("bloom_pos") - F.sum("member"))
        .cast("long")
        .alias("false_pos"),
        # NULL when every training shingle is a member (no negatives to
        # rate — degenerate only on a fully-contaminated corpus, but a
        # zero denominator THROWS under Spark 4 ANSI mode)
        F.expr(
            "CASE WHEN COUNT(*) = SUM(member) THEN NULL "
            "ELSE (SUM(bloom_pos) - SUM(member)) * 1000000 div "
            "(COUNT(*) - SUM(member)) END"
        )
        .cast("long")
        .alias("fpr_e6"),
    )


dedup_bloom_prefilter.__doc__ = dedup_bloom_prefilter.__doc__.format(
    m=_BLOOM_M
)


#: Count-Min geometry: d = 2 hash rows x w = 1024 counters.  Sized so
#: the sf0.01 corpus (vocab ~40, ~300k token occurrences) realizes
#: visible-but-small overestimates — the property the calibration
#: hash-pins.
_CMS_W = 1024

_SQL_CH1 = f"(('0x' || substr(md5(tok), 1, 8))::BIGINT % {_CMS_W})"
_SQL_CH2 = f"(('0x' || substr(md5(tok), 9, 8))::BIGINT % {_CMS_W})"


def _cms_h(col, offset: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col), 1 + offset, 8), 16, 10).cast("long")
        % _CMS_W
    )


@query(
    "sketch_count_min_calibration",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count,
             {_SQL_CH1} AS h1, {_SQL_CH2} AS h2
      FROM tok GROUP BY 1
    ),
    row1 AS MATERIALIZED (
      SELECT h1 AS cell, CAST(SUM(exact_count) AS BIGINT) AS c
      FROM tf GROUP BY 1
    ),
    row2 AS MATERIALIZED (
      SELECT h2 AS cell, CAST(SUM(exact_count) AS BIGINT) AS c
      FROM tf GROUP BY 1
    )
    SELECT t.tok, t.exact_count,
           CAST(LEAST(r1.c, r2.c) AS BIGINT) AS cms_estimate,
           CAST(LEAST(r1.c, r2.c) - t.exact_count AS BIGINT)
             AS overestimate
    FROM tf t
    JOIN row1 r1 ON r1.cell = t.h1
    JOIN row2 r2 ON r2.cell = t.h2
    """,
)
def sketch_count_min_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch calibration (Cormode & Muthukrishnan 2005):
    build the d=2 x w={w} counter array over the corpus's token stream
    (each row's counter = the total count of tokens hashing to that
    cell), read back every token's CMS estimate ``min(row1[h1],
    row2[h2])``, and hash-pin the per-token OVERESTIMATE against the
    exact count.  Complements ``text_countmin_portable``
    (operators/sketches2.py), which hash-proves the ESTIMATOR itself
    (build + min-over-rows readback at d=4 x w=256): this query emits
    what that one deliberately doesn't — the error against ground
    truth, at a deliberately tighter geometry (d=2, wider rows) so the
    realized collisions are visible and measurable, the
    ``dedup_minhash_calibration`` convention.  CMS never
    underestimates — ``overestimate >= 0`` is the structural
    invariant — and the collision-driven error profile this query
    freezes is exactly what a heavy-hitter pipeline needs to size
    (d, w) before trusting the sketch at 100 TB, where the counter
    array (d*w integers) is broadcastable state and exact per-token
    counts are a corpus-scale shuffle.

    All integers: md5-derived cells, counter sums, one LEAST.

    Scale: token-keyed hash agg -> two w-bounded counter tables that
    broadcast back onto the vocabulary — the corpus is scanned once."""
    docs = tokenized_docs(spark, sf_dir)
    tf = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .select(
            "tok",
            "exact_count",
            _cms_h(F.col("tok"), 0).alias("h1"),
            _cms_h(F.col("tok"), 8).alias("h2"),
        )
    )
    tf = scoped_persist(tf)
    row1 = tf.groupBy(F.col("h1").alias("cell")).agg(
        F.sum("exact_count").cast("long").alias("c1")
    )
    row2 = tf.groupBy(F.col("h2").alias("cell")).agg(
        F.sum("exact_count").cast("long").alias("c2")
    )
    est = F.least(F.col("c1"), F.col("c2"))
    return (
        tf.join(F.broadcast(row1), tf["h1"] == row1["cell"])
        .drop("cell")
        .join(F.broadcast(row2), tf["h2"] == row2["cell"])
        .select(
            "tok",
            "exact_count",
            est.cast("long").alias("cms_estimate"),
            (est - F.col("exact_count")).cast("long").alias("overestimate"),
        )
    )


sketch_count_min_calibration.__doc__ = (
    sketch_count_min_calibration.__doc__.format(w=_CMS_W)
)


@query(
    "corpus_decontaminate_bloom",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_BUCKET} AS bucket, string_split(text, ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id, bucket,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, greatest(len(w) - 2, 0) + 1)])) AS shingle
      FROM toks
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE bucket >= 95),
    tr AS (SELECT doc_id, shingle FROM sh WHERE bucket < 95)
    SELECT tr.doc_id, COUNT(*) AS n_shared
    FROM tr JOIN ev USING (shingle)
    GROUP BY 1
    """,
)
def corpus_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corpus_decontaminate`` routed through the Bloom pre-screen —
    and hash-proven IDENTICAL to the exact path (the oracle is the
    exact join's SQL verbatim): training shingles first pass the k=2
    membership conjunction against the broadcast bit-set, and only the
    bloom-positive survivors reach the exact shingle join.  Bloom
    filters have NO false negatives, so prefilter + exact verify is
    lossless by construction — this query pins that claim with a value
    hash, the ``dedup_prefix_filter_jaccard`` convention (a
    sub-quadratic plan proven against its exhaustive twin).

    Scale: this is the shape that wins at 100 TB — the bit-set is
    bounded by the filter geometry (``<= 2 * |eval shingles|`` rows)
    and broadcasts where the raw eval shingle set may not; the exact
    join then shuffles only the bloom-positive sliver (contamination-
    sized + the measured ~0.1% false-positive sliver,
    ``dedup_bloom_prefilter``), never the corpus."""
    from concurrent_etl_go_spark.llm.dedup import shingles_from_tokens

    docs = tokenized_docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        hash_bucket("doc_id").alias("bucket"),
        F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"),
    )
    sh = scoped_persist(sh)
    ev = sh.where(F.col("bucket") >= 95).select("shingle").distinct()
    ev = scoped_persist(ev)
    bits = (
        ev.select(_bloom_h1(F.col("shingle")).alias("b"))
        .unionByName(ev.select(_bloom_h2(F.col("shingle")).alias("b")))
        .distinct()
    )
    tr = sh.where(F.col("bucket") < 95)
    b1 = bits.withColumnRenamed("b", "h1")
    b2 = bits.withColumnRenamed("b", "h2")
    prefiltered = (
        tr.withColumn("h1", _bloom_h1(F.col("shingle")))
        .withColumn("h2", _bloom_h2(F.col("shingle")))
        .join(F.broadcast(b1), "h1", "left_semi")
        .join(F.broadcast(b2), "h2", "left_semi")
    )
    return (
        prefiltered.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _leakage_split_oracle() -> str:
    """Chains dedup3's hash-proven signature/banding/closure oracle with
    the md5 split bucket ON THE COMPONENT LABEL.  dedup3's fragments are
    module constants, so the chain resolves eagerly at import."""
    from concurrent_etl_go_spark.llm.dedup3 import (
        _ORACLE_BANDS,
        _ORACLE_SIGS,
    )

    bucket = (
        "(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 4))::BIGINT"
        " % 100)"
    )
    return (
        "WITH RECURSIVE"
        + _ORACLE_SIGS.lstrip().removeprefix("WITH")
        + _ORACLE_BANDS
        + f"""
    , sym AS (
      SELECT id_a AS s, id_b AS d FROM cand
      UNION
      SELECT id_b AS s, id_a AS d FROM cand
    ),
    reach(node, lbl) AS (
      SELECT DISTINCT s, s FROM sym
      UNION
      SELECT e.d, r.lbl FROM reach r JOIN sym e ON e.s = r.node
    ),
    comp AS (
      SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
    ),
    labeled AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, component,
           CAST({bucket} AS BIGINT) AS bucket,
           CASE WHEN {bucket} < 80 THEN 'train'
                WHEN {bucket} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM labeled
    """
    )


@query("dataset_leakage_safe_split", oracle=_leakage_split_oracle())
def dataset_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: the 80/10/10 md5-bucket
    split of ``split_train_val_test``, but keyed on each document's
    near-dup COMPONENT label instead of its own id — so every member of
    a duplicate cluster lands in the same split and near-verbatim
    copies can never straddle the train/test boundary (the
    cross-split-leakage hole ``dataset_dedup_cross_split`` measures;
    this operator closes it by construction).  Chains two hash-proven
    kernels: ``dedup_survivor_portable``'s signature -> banding ->
    connected-components closure, then the ``hash_bucket`` md5 idiom on
    the component label.

    Scale: identical to the dedup funnel (map-side signatures,
    band-keyed join, O(log diameter) component rounds) plus one
    map-side bucket expression.  Stability under corpus growth: with
    monotone doc ids (new documents get larger ids, the usual
    ingestion contract) a new duplicate of an existing cluster keeps
    the cluster's min-id label and therefore its split; the one event
    that CAN move documents is a bridge document merging two clusters
    (their union takes the smaller label) — which is precisely when
    re-splitting is correct, because the merged cluster must not
    straddle the boundary either."""
    from concurrent_etl_go_spark.llm.dedup3 import _candidate_labels
    from concurrent_etl_go_spark.sources.readers import read_table

    labels = _candidate_labels(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    joined = docs.join(labels, docs["doc_id"] == labels["id"], "left")
    component = F.coalesce(F.col("component"), F.col("doc_id"))
    bucket = hash_bucket(component)
    return joined.select(
        "doc_id",
        component.alias("component"),
        bucket.cast("long").alias("bucket"),
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
