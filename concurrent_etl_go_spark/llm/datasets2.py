"""Corpus maintenance, batch 2: epoch shuffling, incremental dedup, and
unigram-LM quality scoring.

Three operations a recurring pretraining-data pipeline runs every cycle:

- ``dataset_epoch_shuffle``: the per-epoch deterministic global shuffle.
  Training wants a different document order every epoch, reproducible
  across restarts and engines — so the order IS a hash: sorting by
  ``md5(epoch # doc_id)`` is a seeded permutation, and taking the hash
  modulo the shard count places each document in its epoch-specific
  shard. Changing the epoch literal re-permutes everything with zero
  state.
- ``corpus_dedup_incremental``: dedup the NEW batch against the already-
  ingested corpus without re-deduplicating the corpus itself — the
  incremental shape that keeps daily ingestion O(|batch|) instead of
  O(|corpus|).
- ``text_unigram_nll``: per-document negative log-likelihood under the
  corpus' own unigram language model — the cheap perplexity proxy used
  for quality filtering (CCNet-style: unusually high NLL = gibberish,
  unusually low = boilerplate; both tails get reviewed).

Everything is Catalyst expressions over the portable md5 hash (same
trick as ``llm/datasets.py``), so all three are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.datasets import hash_bucket
from concurrent_etl_go_spark.llm.dedup import normalize_text
from concurrent_etl_go_spark.llm.text import tokenized_docs, tokens
from concurrent_etl_go_spark.sources.readers import read_table

#: Epoch seed + shard fan-out for the registry entry.
SHUFFLE_EPOCH = 7
SHUFFLE_SHARDS = 8

#: Batch split for the incremental-dedup entry: documents hash-bucketed
#: >= this value play the "incoming batch", the rest the settled corpus
#: (same 100-bucket md5 split as llm/datasets.py).
INCOMING_BUCKET = 90

_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100)"
_SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', "
    "'g'), ' +', ' ', 'g'))"
)


@query(
    "dataset_epoch_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('{SHUFFLE_EPOCH}#' ||
                 CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hkey
      FROM documents
    )
    SELECT doc_id,
           CAST({SHUFFLE_EPOCH} AS BIGINT) AS epoch,
           (hkey % {SHUFFLE_SHARDS}) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY hkey % {SHUFFLE_SHARDS}
               ORDER BY hkey, doc_id
           ) AS BIGINT) AS pos
    FROM h
    """,
)
def dataset_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: assign every document a shard and a
    position within the shard for epoch ``SHUFFLE_EPOCH``.

    Scale: exactly the shape a real epoch shuffle needs — one hash
    expression per row, one exchange on the shard key, one per-shard
    sort (Spark turns the row_number window into sort-within-partitions
    after the hash-partition on shard). Nothing global: no total order,
    no driver participation, shards stream out independently. The
    doc_id tie-break makes the permutation total even on the
    astronomically-rare 32-bit hash collision.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    hkey = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.lit(str(SHUFFLE_EPOCH)), F.col("doc_id").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    h = docs.select("doc_id", hkey.alias("hkey")).withColumn(
        "shard", F.col("hkey") % SHUFFLE_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    return h.select(
        "doc_id",
        F.lit(SHUFFLE_EPOCH).cast("long").alias("epoch"),
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


@query(
    "corpus_dedup_incremental",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_SQL_NORM} AS norm_text,
             {_SQL_BUCKET} AS bucket
      FROM documents
    ),
    corpus_fp AS (
      SELECT DISTINCT md5(norm_text) AS fp FROM b
      WHERE bucket < {INCOMING_BUCKET}
    ),
    incoming AS (
      SELECT md5(norm_text) AS fp, MIN(doc_id) AS keep_doc_id,
             COUNT(*) AS n_in_batch
      FROM b WHERE bucket >= {INCOMING_BUCKET}
      GROUP BY 1
    )
    SELECT i.keep_doc_id, i.fp, i.n_in_batch
    FROM incoming i ANTI JOIN corpus_fp c ON i.fp = c.fp
    """,
)
def corpus_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch against the settled corpus: survivors are
    batch documents (lowest doc_id per normalized fingerprint) whose
    fingerprint does not already exist in the corpus.

    Scale: the whole point is what this does NOT do — re-scan or re-group
    the settled corpus. At 100 TB ``corpus_fp`` is a maintained
    fingerprint index (itself the output of prior runs, appended each
    cycle via the versioned table); each run is one groupBy over the
    BATCH plus one anti-join of |batch| fingerprints against the index,
    shuffle-partitioned on the fingerprint with no skew (md5 keys).
    Here the index side is derived in-plan from the corpus partition so
    the oracle can check the whole contract end to end.
    """
    docs = read_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id",
        normalize_text("text").alias("norm_text"),
        hash_bucket("doc_id").alias("bucket"),
    ).withColumn("fp", F.md5("norm_text"))
    corpus_fp = (
        b.where(F.col("bucket") < INCOMING_BUCKET).select("fp").distinct()
    )
    incoming = (
        b.where(F.col("bucket") >= INCOMING_BUCKET)
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_in_batch"),
        )
    )
    return incoming.join(corpus_fp, "fp", "left_anti").select(
        "keep_doc_id", "fp", "n_in_batch"
    )


@query(
    "text_unigram_nll",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    cnt AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    per AS (
      SELECT t.doc_id, SUM(ln(cnt.c / tot.n)) AS ll, COUNT(*) AS dl
      FROM tok t JOIN cnt USING (term) CROSS JOIN tot
      GROUP BY 1
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS n_tokens,
           ROUND(-ll / dl, 4) AS nll
    FROM per
    """,
)
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus unigram
    LM — the cheap perplexity proxy for quality filtering. High NLL =
    tokens the corpus finds surprising (noise, gibberish, wrong
    language); low NLL = wall-to-wall stopwords/boilerplate.

    Scale: the unigram "model" is the term-count dictionary — Zipf-
    bounded, so it broadcasts (same shape as ``text_tfidf``'s df side);
    scoring is one explode + dictionary join + per-doc agg. The summation
    follows the registry's ROUND(x, 4)-both-sides convention for
    cross-engine float stability.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    tok = docs.select("doc_id", F.explode("toks").alias("term"))
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    per = (
        tok.join(F.broadcast(cnt), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.log(F.col("c") / F.col("n"))).alias("ll"),
            F.count(F.lit(1)).alias("dl"),
        )
    )
    return per.select(
        "doc_id",
        F.col("dl").cast("long").alias("n_tokens"),
        F.round(-F.col("ll") / F.col("dl"), 4).alias("nll"),
    )


KFOLD_K = 5


@query(
    "dataset_kfold_assign",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             (('0x' || substr(md5('fold#' || CAST(doc_id AS VARCHAR)), 1, 8))
                 ::BIGINT % {KFOLD_K}) AS fold,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT fold, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(AVG(n_tokens), 4) AS avg_tokens
    FROM f GROUP BY fold
    """,
)
def dataset_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment with per-fold size stats — the
    cross-validation counterpart of ``split_train_val_test`` (same
    portable-hash bucketing: fold membership survives retries, engine
    swaps, and repartitioning). The stats row per fold is the balance
    check run before training on the split.

    Scale: one hash expression per row + one tiny groupBy over k folds
    (map-side combined). The per-document fold column itself is the same
    expression applied as a filter, no materialization needed.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.lit("fold"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % KFOLD_K
    )
    f = docs.select(
        fold.alias("fold"), F.size("toks").cast("long").alias("n_tokens")
    )
    return f.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@query(
    "dataset_dedup_cross_split",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
    ),
    s AS (
      SELECT doc_id, text,
             CASE WHEN {_SQL_BUCKET} < 80 THEN 'train'
                  WHEN {_SQL_BUCKET} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM aug
    ),
    x AS (
      SELECT md5(text) AS text_md5,
             COUNT(*) FILTER (WHERE split = 'train') AS n_train,
             COUNT(*) FILTER (WHERE split = 'val') AS n_val,
             COUNT(*) FILTER (WHERE split = 'test') AS n_test,
             MIN(doc_id) AS first_doc
      FROM s GROUP BY text
    )
    SELECT text_md5, n_train, n_val, n_test, first_doc
    FROM x WHERE n_train > 0 AND (n_val > 0 OR n_test > 0)
    """,
)
def dataset_dedup_cross_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination report: exact-duplicate texts that
    landed in BOTH the training split and an eval split under the
    ``split_train_val_test`` hash rule — the leak a random split cannot
    prevent when the corpus carries duplicates, and the first audit a
    training pipeline runs after splitting (the decontamination
    complement: ``corpus_decontaminate`` removes KNOWN eval sets; this
    finds self-inflicted overlap).

    The synthetic corpus has no duplicate texts below sf0.1, so the
    fixture plants them deterministically (every 7th document cloned
    under a shifted id — the ``corpus_file_dedup`` convention, applied
    identically by both engines); the hash rule then scatters the
    clones across splits, so the report provably FIRES rather than
    passing vacuously on an empty frame.

    Scale: one text-keyed hash aggregation with conditional counts (the
    ``dedup_exact`` shuffle class — at 100 TB the key would be a text
    hash, exactly as the output column already is), then a selective
    filter; no join, no window.
    """
    base = read_table(spark, sf_dir, "documents")
    docs = base.select("doc_id", "text").unionByName(
        base.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    bucket = hash_bucket("doc_id")
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    x = (
        docs.select("doc_id", "text", split.alias("split"))
        .groupBy("text")
        .agg(
            F.count_if(F.col("split") == "train").alias("n_train"),
            F.count_if(F.col("split") == "val").alias("n_val"),
            F.count_if(F.col("split") == "test").alias("n_test"),
            F.min("doc_id").alias("first_doc"),
        )
    )
    return x.where(
        (F.col("n_train") > 0) & ((F.col("n_val") > 0) | (F.col("n_test") > 0))
    ).select(
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        "n_train", "n_val", "n_test", "first_doc",
    )


#: Feature-hashing geometry: bucket count and the md5-prefix hash
#: (shared verbatim with the oracle).
FEATURE_BUCKETS = 32


@query(
    "text_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT % {FEATURE_BUCKETS})
               AS bucket,
             CASE WHEN (('0x' || substr(md5(tok), 9, 1))::BIGINT % 2) = 0
                  THEN 1 ELSE -1 END AS sign
      FROM tok
    )
    SELECT doc_id, bucket,
           CAST(SUM(sign) AS BIGINT) AS signed_tf,
           COUNT(*) AS abs_tf
    FROM h GROUP BY doc_id, bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, public literature):
    every token maps to one of FEATURE_BUCKETS feature slots by hash,
    with a second hash bit supplying a +/-1 sign so collisions cancel
    in expectation — the fixed-width featurization that needs NO
    vocabulary pass, which is what makes it the 100 TB-friendly
    alternative to ``text_tfidf``'s corpus-wide document-frequency
    join.  Emits the sparse (doc, slot) -> (signed sum, raw count)
    features.

    Scale: explode + one (doc, bucket)-keyed hash agg with map-side
    partials; no vocabulary state, no second scan, no join.  Both
    hashes are the engine-portable md5-prefix integers, so every
    feature value — collisions and sign cancellations included — is
    pinned by the driver hash."""
    docs = tokenized_docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % FEATURE_BUCKETS
    )
    sign = F.when(
        F.conv(F.substring(F.md5("tok"), 9, 1), 16, 10).cast("long") % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", bucket.alias("bucket"), sign.alias("sign"))
        .groupBy("doc_id", "bucket")
        .agg(
            F.sum("sign").cast("long").alias("signed_tf"),
            F.count(F.lit(1)).alias("abs_tf"),
        )
    )


#: Temporal-split holdout width: the final N days of the event stream
#: become the evaluation split.
TEMPORAL_HOLDOUT_DAYS = 7


@query(
    "dataset_temporal_split",
    oracle=f"""
    WITH d AS MATERIALIZED (
      SELECT user_id, date_trunc('day', ts) AS day FROM events
    ),
    cut AS MATERIALIZED (
      SELECT MAX(day) - INTERVAL {TEMPORAL_HOLDOUT_DAYS} DAY AS cutoff
      FROM d
    ),
    tagged AS MATERIALIZED (
      SELECT user_id, day,
             CASE WHEN day < cut.cutoff THEN 'train' ELSE 'test' END
               AS split
      FROM d CROSS JOIN cut
    ),
    u AS MATERIALIZED (
      SELECT user_id,
             MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
             MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
      FROM tagged GROUP BY user_id
    ),
    us AS MATERIALIZED (
      SELECT CAST(SUM(in_train) AS BIGINT) AS train_users,
             CAST(SUM(in_test) AS BIGINT) AS test_users,
             CAST(SUM(in_train * in_test) AS BIGINT) AS both_users
      FROM u
    ),
    es AS MATERIALIZED (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
             strftime(MIN(day), '%Y-%m-%d') AS first_day,
             strftime(MAX(day), '%Y-%m-%d') AS last_day
      FROM tagged GROUP BY split
    )
    SELECT e.split, e.n_events,
           CASE WHEN e.split = 'train' THEN us.train_users
                ELSE us.test_users END AS n_users,
           e.first_day, e.last_day,
           CAST(us.both_users * 10000
                // CASE WHEN e.split = 'train' THEN us.train_users
                        ELSE us.test_users END AS BIGINT)
             AS seen_in_other_bp
    FROM es e CROSS JOIN us
    ORDER BY e.split
    """,
)
def dataset_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-audited TEMPORAL train/eval split over the event stream:
    the final ``TEMPORAL_HOLDOUT_DAYS`` days become 'test', everything
    before is 'train' — the forecasting/recsys split where random
    row-level splits (``split_train_val_test``) silently leak the
    future into training.  One readout row per split: event count,
    user count, day range, and the entity-overlap rate (share of this
    split's users also active in the other, integer basis points) —
    the number an auditor reads to decide between user-disjoint and
    time-disjoint evaluation.

    Determinism: the cutoff derives from MAX(day) in-plan (broadcast
    one-row join, no driver collect); day comparisons and string
    formatting are exact under the UTC-pinned session.

    Scale: one scan -> (user, day) projection; the cutoff is a one-row
    broadcast; user flags are ONE user-keyed hash agg; the final
    readout folds two tiny aggregates — O(1) rows cross the network."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    cut = ev.agg(
        (F.max("day") - F.expr(f"INTERVAL {TEMPORAL_HOLDOUT_DAYS} DAYS"))
        .alias("cutoff")
    )
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        "user_id",
        "day",
        F.when(F.col("day") < F.col("cutoff"), F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    u = tagged.groupBy("user_id").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "in_train"
        ),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
            "in_test"
        ),
    )
    us = u.agg(
        F.sum("in_train").alias("train_users"),
        F.sum("in_test").alias("test_users"),
        F.sum(F.col("in_train") * F.col("in_test")).alias("both_users"),
    )
    es = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("last_day"),
    )
    n_users = F.when(
        F.col("split") == "train", F.col("train_users")
    ).otherwise(F.col("test_users"))
    return (
        es.crossJoin(F.broadcast(us))
        .select(
            "split",
            "n_events",
            n_users.alias("n_users"),
            "first_day",
            "last_day",
            F.expr("both_users * 10000").alias("_num"),
            n_users.alias("_den"),
        )
        .select(
            "split",
            "n_events",
            "n_users",
            "first_day",
            "last_day",
            F.expr("_num div _den").cast("long").alias("seen_in_other_bp"),
        )
        .orderBy("split")
    )


@query(
    "dataset_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             CAST(n_chars AS BIGINT) * 10000 // (n_chars + 200)
               AS w_bp,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
              % 10000) AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w_bp) AS BIGINT) AS sum_w_bp,
           CAST(SUM(CASE WHEN bucket < w_bp THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN bucket < w_bp THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS kept_bp
    FROM w GROUP BY 1
    """,
)
def dataset_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance-weighted sampling report: every document
    gets an integer keep-probability in basis points (a saturating
    length weight, ``n_chars * 10000 div (n_chars + 200)`` — longer
    documents kept more often, the quality-weighted mix shaping a
    pretraining pipeline applies), and is kept iff its portable md5
    bucket (mod 10000) falls below that weight — the §7.6 rule-6 idiom
    extended from fixed-rate to PER-ROW rates.  A document's keep
    decision never flips as the corpus grows, across engines, runs, or
    row order; per-language counts summarize realized vs intended mass
    (n_kept tracks sum_w_bp / 10000 by LLN — pytest-pinned at the
    corpus level).

    Scale: one map-side expression per row (no shuffle until the
    language rollup), the same scan-level filter shape as
    ``sample_block_hash``."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    w = docs.select(
        "lang",
        F.expr(
            "CAST(n_chars AS BIGINT) * 10000 div (n_chars + 200)"
        ).alias("w_bp"),
        (hash_bucket("doc_id", 10000)).alias("bucket"),
    )
    kept = F.when(F.col("bucket") < F.col("w_bp"), 1).otherwise(0)
    return w.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w_bp").cast("long").alias("sum_w_bp"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.expr(
            "CAST(SUM(CASE WHEN bucket < w_bp THEN 1 ELSE 0 END)"
            " * 10000 div COUNT(*) AS BIGINT)"
        ).alias("kept_bp"),
    )


#: Curriculum phase thresholds (integer, fixed): token-count bands x a
#: stopword-share floor — "clean short -> clean long -> noisy" is the
#: standard easy-to-hard pretraining schedule shape.
_CURR_SHORT = 120  # tokens: short/long boundary
_CURR_STOP_MIN_BP = 300  # stopword share >= 3% marks "natural prose"


@query(
    "dataset_curriculum_order",
    oracle=f"""
    WITH scored AS MATERIALIZED (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                 t -> lower(t) IN ('the','a','and','of','to','in','is',
                                   'for','on','with'))) * 10000
                  // greatest(len(string_split(text, ' ')), 1) AS BIGINT)
               AS stop_bp
      FROM documents
    ),
    phased AS (
      SELECT CASE
               WHEN stop_bp >= {_CURR_STOP_MIN_BP}
                    AND n_tokens < {_CURR_SHORT} THEN 1
               WHEN stop_bp >= {_CURR_STOP_MIN_BP} THEN 2
               ELSE 3 END AS phase,
             n_tokens, stop_bp
      FROM scored
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(stop_bp) // COUNT(*) AS BIGINT) AS mean_stop_bp,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM phased GROUP BY 1
    """,
)
def dataset_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment for pretraining (easy-to-hard
    ordering, Bengio et al. 2009 framing): phase 1 = short natural
    prose (stopword share >= 3%, under {120} tokens), phase 2 = long
    natural prose, phase 3 = low-stopword/noisy tail — with per-phase
    doc counts, token budgets, and the mean stopword share.  A trainer
    consumes phases in order; the phase rule is a pure per-row integer
    expression, so assignment never flips with corpus growth (the
    ``split_train_val_test`` leakage argument).

    All integers (token counts, floor-divided shares).  Scale: one
    documents scan, per-row scoring, a 3-row hash agg."""
    from concurrent_etl_go_spark.llm.text import tokenized_docs

    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.expr(
            "CAST(size(filter(toks, t -> lower(t) IN "
            "('the','a','and','of','to','in','is','for','on','with')))"
            " * 10000 div greatest(size(toks), 1) AS BIGINT)"
        ).alias("stop_bp"),
    )
    phase = (
        F.when(
            (F.col("stop_bp") >= _CURR_STOP_MIN_BP)
            & (F.col("n_tokens") < _CURR_SHORT),
            1,
        )
        .when(F.col("stop_bp") >= _CURR_STOP_MIN_BP, 2)
        .otherwise(3)
    )
    return (
        scored.select(phase.cast("long").alias("phase"), "n_tokens", "stop_bp")
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.expr("CAST(SUM(stop_bp) div COUNT(*) AS BIGINT)").alias(
                "mean_stop_bp"
            ),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


_QUOTA_PER_SOURCE = 50  # sampled docs kept per source feed


@query(
    "dataset_quota_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 8))::BIGINT,
                        doc_id
             ) AS pick_rank
      FROM documents
    )
    SELECT source, doc_id, CAST(pick_rank AS BIGINT) AS pick_rank
    FROM ranked WHERE pick_rank <= {_QUOTA_PER_SOURCE}
    """,
)
def dataset_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling: keep (up to) {_QUOTA_PER_SOURCE}
    documents per source feed, chosen by a deterministic md5 hash rank
    (ties broken by doc_id) — the "equal voice per feed" audit sample
    every ingest review pulls, stable across runs, engines, and
    retries because the rank key is a pure function of the row
    (``llm/datasets.py::hash_bucket`` md5-prefix convention, 8 hex
    chars so collisions are rare and the doc_id tie-break resolves
    the rest).

    Scale: one source-partitioned top-k window — with a per-partition
    rank cutoff this is the classic "sampled top-k per group" that
    Spark executes with partial limits per partition; no global
    sort."""
    docs = read_table(spark, sf_dir, "documents").select("source", "doc_id")
    rank_key = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    w = Window.partitionBy("source").orderBy(rank_key, F.col("doc_id"))
    return (
        docs.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= _QUOTA_PER_SOURCE)
        .select("source", "doc_id", "pick_rank")
    )
