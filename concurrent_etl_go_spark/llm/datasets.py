"""Dataset-assembly operators for training-data pipelines: deterministic
hash splits, stratified sampling, and quality filtering over ``documents``.

All three are pure Catalyst expressions over a PORTABLE deterministic hash
(md5 hex -> int bucket), so they are oracle-checked end-to-end and —
unlike ``rand()``-based splits — reproducible across engines, runs, and
cluster sizes. At 100 TB each is an embarrassingly parallel scan (no
shuffle at all): the split/sample decision is a per-row expression, which
is exactly why hash-bucketing is the standard way to carve train/val/test
from a petabyte corpus (new data lands in stable buckets; no global
sampling pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of a key.

    Engine-portable: Spark ``conv(substring(md5(x),1,4),16,10)`` equals
    DuckDB ``('0x'||substr(md5(x),1,4))::BIGINT`` bit-for-bit, so the
    DuckDB oracles reproduce every split decision exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )


# Shared oracle fragment for the portable bucket (DuckDB side).
_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100)"


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           {_SQL_BUCKET} AS bucket,
           CASE WHEN {_SQL_BUCKET} < 80 THEN 'train'
                WHEN {_SQL_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by deterministic hash bucket.

    Stable under corpus growth: a document's split never changes when new
    rows arrive (the decision depends only on its own id), which is the
    property a training pipeline needs to avoid train/test leakage across
    snapshots. One scan, no shuffle.
    """
    docs = read_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang, {_SQL_BUCKET} AS bucket
    FROM documents
    WHERE {_SQL_BUCKET} <
          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 10 END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep fractions
    (en 50%, de 20%, others 10%) via the hash bucket.

    The ``sampleBy``-shaped operation with exact reproducibility — the
    sample is a pure function of (doc_id, lang), so an incremental 100 TB
    pipeline re-derives the identical sample without a stored seed/state.
    """
    docs = read_table(spark, sf_dir, "documents")
    frac = (
        F.when(F.col("lang") == "en", F.lit(50))
        .when(F.col("lang") == "de", F.lit(20))
        .otherwise(F.lit(10))
    )
    bucket = hash_bucket("doc_id")
    return docs.select(
        "doc_id", "lang", bucket.alias("bucket")
    ).where(F.col("bucket") < frac)


@query(
    "text_quality_filter",
    oracle="""
    WITH q AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                   t -> lower(t) IN ('the','a','and','of','to','in','is',
                                     'for','on','with'))) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1) AS sw_ratio,
               CAST(length(text) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1) AS cpt
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN sw_ratio < 0.02 THEN 'low_stopword'
                WHEN cpt > 5.7 THEN 'long_tokens'
                ELSE 'ok' END AS reason,
           CAST(n_tokens >= 20 AND sw_ratio >= 0.02 AND cpt <= 5.7
                AS BOOLEAN) AS keep
    FROM q
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining quality gate: drop too-short docs, vocabulary outliers
    (stopword-free text is usually boilerplate/code), and long-token docs
    (URL/base64-heavy). Emits keep + the FIRST failing reason per doc so a
    pipeline can report drop composition — the standard quality-funnel
    observability. Pure scan, no shuffle; thresholds sit at roughly the
    10th/90th percentiles of the corpus so both outcomes are exercised.
    """
    from concurrent_etl_go_spark.llm.text import EN_STOPWORDS, tokenized_docs

    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    stops = F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    n_tokens = F.size(toks)
    sw_ratio = F.size(stops) / F.greatest(n_tokens, F.lit(1))
    cpt = F.length("text") / F.greatest(n_tokens, F.lit(1))
    reason = (
        F.when(n_tokens < 20, F.lit("too_short"))
        .when(sw_ratio < 0.02, F.lit("low_stopword"))
        .when(cpt > 5.7, F.lit("long_tokens"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


@query(
    "text_sequence_pack",
    oracle="""
    WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
               FROM documents),
         c AS (SELECT doc_id, lang, n_tokens,
                      COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
                          ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS cum_prev
               FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST(cum_prev // 2048 AS BIGINT) AS pack_id
    FROM c
    """,
)
def text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: assign documents to fixed
    token-budget packs (2048 tokens) in deterministic doc_id order.

    ``pack_id = floor(exclusive-cumulative-tokens / budget)`` — the
    streaming-concat semantics (a document may straddle a pack boundary;
    the tokenizer-side concat handles the split). Packing is partitioned
    by ``lang``, which is the scale story: each partition packs
    independently (one window shuffle on the partition key, no global
    sort), so 100 TB packs as parallel per-stream runs. A global pack
    order would serialize the corpus through one partition — exactly what
    this layout avoids.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = docs.select("doc_id", "lang", n_tokens.cast("long").alias("n_tokens"))
    cum_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(cum_prev / 2048).cast("long").alias("pack_id"),
    )


@query(
    "corpus_clean",
    oracle="""
    WITH q AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                   t -> lower(t) IN ('the','a','and','of','to','in','is',
                                     'for','on','with'))) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1) AS sw_ratio,
               CAST(length(text) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1) AS cpt,
               trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS norm
        FROM documents
    ),
    kept AS (
        SELECT * FROM q
        WHERE n_tokens >= 20 AND sw_ratio >= 0.02 AND cpt <= 5.7
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY norm) AS keeper FROM kept)
    WHERE doc_id = keeper
    """,
)
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: quality gate, then keep one survivor
    (smallest doc_id) per normalized-text group — the composed
    filter -> dedup pipeline a pretraining corpus actually runs, as one
    declarative plan (Catalyst fuses the quality predicates into the scan;
    the only shuffle is the normalized-text window).

    The near-dup stage (LSH -> components -> keep representatives) chains
    after this with ``dedup_components``; this query is the
    SQL-expressible prefix, so the driver hash-checks the composition.
    """
    from pyspark.sql import Window

    from concurrent_etl_go_spark.llm.text import (
        EN_STOPWORDS,
        normalize_text,
        tokenized_docs,
    )

    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    stops = F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    n_tokens = F.size(toks)
    sw_ratio = F.size(stops) / F.greatest(n_tokens, F.lit(1))
    cpt = F.length("text") / F.greatest(n_tokens, F.lit(1))
    kept = docs.where(
        (n_tokens >= 20) & (sw_ratio >= 0.02) & (cpt <= 5.7)
    ).select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        normalize_text("text").alias("norm"),
    )
    keeper = F.min("doc_id").over(Window.partitionBy("norm"))
    return (
        kept.withColumn("keeper", keeper)
        .where(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "lang", "n_tokens")
    )
