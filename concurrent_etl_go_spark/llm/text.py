"""Text analysis over the ``documents`` table: token counting, quality
scoring, fingerprinting, language-ID.

Everything except language-ID is oracle-checked; all expressions are
JVM-side built-ins (split/regexp/aggregate), no Python in the row path —
at 100 TB these are embarrassingly parallel scans with no shuffle except
the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

# Tiny embedded stopword profiles for the heuristic scorers. Deliberately
# small and engine-owned: the point is the *operator shape* (vocabulary-
# profile scoring), swappable for real profiles at deployment.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")

# BPE-ish tokenizer regex: words, numbers, or single punctuation marks.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def kgram_index(toks: Column, k: int) -> Column:
    """0-based k-gram start indices; EMPTY for docs with fewer than k tokens.

    A naive ``sequence(0, size - k)`` DESCENDS when size < k (Spark
    ``sequence`` counts down toward a smaller stop), yielding [0, -1] whose
    lookups throw under Spark 4 ANSI ``element_at`` (index 0 is always
    illegal). Guarding with ``when(size >= k)`` makes short/empty documents
    legal — they simply have no k-grams, matching the SQL oracle's
    ``range``-comprehension semantics.
    """
    n = F.size(toks)
    return F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a materialized ``toks`` column, spread across cores.

    Hot text queries reference the token array several times; tokenizing
    into a column (instead of inlining ``split`` at each reference) and
    repartitioning the single-split parquet table keeps the scan parallel
    and the tokenization single-pass.
    """
    docs = read_table(spark, sf_dir, "documents")
    parallelism = spark.sparkContext.defaultParallelism
    return docs.repartition(parallelism, "doc_id").withColumn(
        "toks", tokens("text")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex (words / numbers / punct)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    toks = tokens(col)
    stops = F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    return F.size(stops) / F.greatest(F.size(toks), F.lit(1))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(normalize_text(c))


def normalize_text(col: Column | str) -> Column:
    """lower -> strip non-alphanumerics -> collapse whitespace -> trim."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(cleaned, r" +", " "))


@query(
    "text_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens,
           ROUND(AVG(length(text)), 4) AS avg_chars,
           ROUND(AVG(n_chars), 4) AS avg_n_chars,
           MIN(length(text)) AS min_chars, MAX(length(text)) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized_docs(spark, sf_dir)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.size("toks")), 4).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_n_chars"),
        F.min(F.length("text")).cast("long").alias("min_chars"),
        F.max(F.length("text")).cast("long").alias("max_chars"),
    )


@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
               t -> lower(t) IN ('the','a','and','of','to','in','is','for',
                                 'on','with'))) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1), 4)
               AS stopword_ratio,
           ROUND(CAST(length(text) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1), 4)
               AS chars_per_token
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, stopword ratio,
    mean token length — the standard cheap pretraining-quality filters."""
    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    stops = F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.size(stops) / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("stopword_ratio"),
        F.round(
            F.length("text") / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("chars_per_token"),
    )


@query(
    "text_token_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_regex_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        regex_token_count("text").cast("long").alias("n_regex_tokens"),
        F.size("toks").cast("long").alias("n_ws_tokens"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


@query(
    "text_langid",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    s AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(w, x -> lower(x) IN ('the','a','and','of','to',
            'in','is','for','on','with'))) AS DOUBLE)
            / greatest(len(w), 1) AS s_en,
        CAST(len(list_filter(w, x -> lower(x) IN ('der','die','das','und',
            'ist','nicht','ein','zu'))) AS DOUBLE)
            / greatest(len(w), 1) AS s_de,
        CAST(len(list_filter(w, x -> lower(x) IN ('el','la','los','las','es',
            'una','que','por'))) AS DOUBLE)
            / greatest(len(w), 1) AS s_es,
        CAST(len(list_filter(w, x -> lower(x) IN ('le','la','les','est','une',
            'que','pour','dans'))) AS DOUBLE)
            / greatest(len(w), 1) AS s_fr
      FROM t
    )
    SELECT doc_id, lang,
      CASE WHEN greatest(s_en, s_de, s_es, s_fr) < 0.02 THEN 'unk'
           WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
           WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
           WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
           ELSE 'fr' END AS predicted_lang,
      ROUND(greatest(s_en, s_de, s_es, s_fr), 4) AS confidence
    FROM s
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-profile hit ratio per language; the
    argmax wins ('unk' below a confidence floor; ties break in profile
    order en,de,es,fr — mirrored by the oracle's CASE order). Pure
    built-ins (filter/size/greatest) — scales as a scan."""
    profiles = {
        "en": EN_STOPWORDS,
        "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
        "es": ("el", "la", "los", "las", "es", "una", "que", "por"),
        "fr": ("le", "la", "les", "est", "une", "que", "pour", "dans"),
    }
    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")

    def hit_ratio(stopwords):
        # factory closure: F.filter inspects lambda arity, so the lambda
        # must take exactly one argument (no default-arg binding)
        pred = lambda t: F.lower(t).isin(*stopwords)  # noqa: E731
        return F.size(F.filter(toks, pred)) / F.greatest(F.size(toks), F.lit(1))

    scores = {lang: hit_ratio(sw) for lang, sw in profiles.items()}
    best_score = F.greatest(*scores.values())
    predicted = F.when(best_score < 0.02, F.lit("unk"))
    for lang, score in scores.items():
        predicted = predicted.when(score == best_score, F.lit(lang))
    return docs.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        F.round(best_score, 4).alias("confidence"),
    )


@query(
    "text_ngrams",
    oracle="""
    WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
         bg AS (SELECT unnest([w[i] || ' ' || w[i+1]
                    for i in range(1, greatest(len(w) - 1, 0) + 1)]) AS bigram
                FROM w)
    SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts: sequence+transform over the token array,
    explode, aggregate — the n-gram feature extractor."""
    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    idx = kgram_index(toks, 2)
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, (i + 1).cast("int")),
            F.element_at(toks, (i + 2).cast("int")),
        ),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF from first principles (explode -> tf -> df -> join), smoothed
    idf = ln((N+1)/(df+1)). The df side is a small term dictionary —
    broadcast; the doc count joins in-plan (no driver-side collect)."""
    docs = tokenized_docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode("toks").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                4,
            ).alias("tfidf"),
        )
    )


@query(
    "text_keywords_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
                  ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4)
                      AS tfidf
           FROM tf JOIN df USING (term) CROSS JOIN n
         )
    SELECT doc_id, term AS keyword, tfidf FROM (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) t WHERE rn = 1
    """,
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the single highest-TF-IDF term of
    each document (the cheap summarization/tagging primitive of corpus
    triage). The argmax orders by the ROUNDED score — the raw ``ln``
    differs in the last ulp across engines' libm, so ranking on it could
    flip near-ties; ranking on the 4-decimal value (the same value the
    proven ``text_tfidf`` emits) with a term tie-break is deterministic
    on both sides.

    Scale: tf/df aggregations as in ``text_tfidf`` (df dictionary
    broadcasts); the argmax is one window partitioned BY DOCUMENT —
    perfectly spread, never a global sort.
    """
    docs = tokenized_docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode("toks").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                4,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("keyword"), "tfidf")
    )
