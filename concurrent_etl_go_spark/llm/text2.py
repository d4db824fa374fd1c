"""Training-data text transforms, batch 2: context-window chunking,
PII scrubbing, and repetition scoring (the Gopher-style quality signal).

Like ``llm/text.py``, everything is a JVM-side Catalyst expression —
split / slice / transform / regexp over the ``documents`` table; no
Python in the row path. At 100 TB all three are embarrassingly parallel
scans: zero shuffles (chunking's posexplode expands rows in place on the
same partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.llm.text import tokenized_docs, tokens
from concurrent_etl_go_spark.sources.readers import read_table

#: Context-window chunking parameters: 64-token windows every 48 tokens
#: (16-token overlap) — the standard sliding-window pretraining layout,
#: scaled down to the synthetic corpus' ~30-120-token documents.
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             UNNEST(range(0, CAST(ceil(len(toks) / {CHUNK_STRIDE}.0) AS BIGINT)))
               AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           array_to_string(
             toks[chunk_id * {CHUNK_STRIDE} + 1 :
                  chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '
           ) AS chunk_text,
           CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                         chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS BIGINT)
             AS n_tokens
    FROM c
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into 64-token windows
    starting every 48 tokens (chunks overlap by 16 tokens; a window opens
    at every stride multiple below the document length, so the tail
    window may be short).

    Scale: chunk starts come from an in-row ``sequence`` + ``posexplode``
    — rows expand in place on their partitions, no shuffle, no Python.
    The 1.33x token duplication is the layout cost of overlap and is paid
    in the output, never in an intermediate exchange.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(float(CHUNK_STRIDE)))
    exploded = docs.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    window = F.slice(
        F.col("toks"),
        (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"),
        CHUNK_TOKENS,
    )
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(" ", window).alias("chunk_text"),
        F.size(window).cast("long").alias("n_tokens"),
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example or +1-555-'
                  || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
               AS full_text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(full_text, '{EMAIL_RE}')) AS BIGINT)
             AS email_hits,
           CAST(len(regexp_extract_all(full_text, '{PHONE_RE}')) AS BIGINT)
             AS phone_hits,
           regexp_replace(
             regexp_replace(full_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'
           ) AS scrubbed
    FROM injected
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email addresses and phone numbers.

    The synthetic corpus contains no organic PII, so each document first
    gets a deterministic contact line injected (derived from ``doc_id``) —
    the operator under test is the count+redact pass, which then provably
    fires exactly once per pattern per document. Both engines use the
    same RE2-compatible patterns (no backreferences/lookaround), and
    Spark's ``regexp_replace`` is global like DuckDB's ``'g'`` flag.

    Scale: pure per-row regexp expressions — no shuffle, no Python; at
    100 TB this is a scan whose cost is the regex engine itself.
    """
    docs = read_table(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or +1-555-"),
        F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
    )
    injected = docs.select("doc_id", full.alias("full_text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("full_text"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return injected.select(
        "doc_id",
        F.size(F.regexp_extract_all("full_text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("email_hits"),
        F.size(F.regexp_extract_all("full_text", F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("phone_hits"),
        scrubbed.alias("scrubbed"),
    )


@query(
    "text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || chr(31) || toks[i + 1]) AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           ROUND(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 4)
             AS dup_token_frac,
           CASE WHEN len(grams) > 0
                THEN ROUND(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 4)
                ELSE 0.0 END AS dup_bigram_frac
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring (Gopher-style quality signal): the fraction of
    duplicate tokens and duplicate bigrams per document. High values mark
    boilerplate/spam for the quality funnel.

    Scale: per-row array expressions (split / transform / array_distinct)
    — no shuffle, no Python. The bigram list is built positionally with a
    guarded ``sequence`` (Spark's sequence DESCENDS for n < 2, so
    single-token docs get an explicit empty gram list, matching DuckDB's
    empty ``range(1, 1)``).
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    n = F.size("toks")
    gram_idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        gram_idx,
        lambda i: F.concat_ws(
            "\x1f", F.element_at("toks", i), F.element_at("toks", i + 1)
        ),
    )
    with_grams = docs.select("doc_id", "toks", grams.alias("grams"))
    n_grams = F.size("grams")
    return with_grams.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(1.0 - F.size(F.array_distinct("toks")) / n, 4).alias(
            "dup_token_frac"
        ),
        F.when(
            n_grams > 0,
            F.round(1.0 - F.size(F.array_distinct("grams")) / n_grams, 4),
        )
        .otherwise(0.0)
        .alias("dup_bigram_frac"),
    )


@query(
    "text_boilerplate_ngrams",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 for i in range(1, greatest(len(w) - 2, 0) + 1)])) AS shingle
      FROM d
    ),
    freq AS (SELECT shingle, COUNT(*) AS doc_freq FROM sh GROUP BY 1)
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(*) FILTER (WHERE freq.doc_freq >= 10) AS n_boilerplate,
           ROUND(COUNT(*) FILTER (WHERE freq.doc_freq >= 10)
                 / COUNT(*), 4) AS boilerplate_ratio
    FROM sh JOIN freq USING (shingle)
    GROUP BY 1
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span (boilerplate) detection: for every
    document, the count and share of its distinct 3-token shingles that
    occur in >= 10 documents corpus-wide. High ratios mark navigation
    chrome / license headers / template spam — the spans pretraining
    curation removes before (or instead of) whole-document dedup.

    Scale: one shingle explode -> (shingle -> doc_freq) hash-agg ->
    equi-join back on shingle -> per-doc agg. All shuffle keys are narrow
    (the shingle string and doc_id); no all-pairs stage, no Python in the
    row path. The exploded shingle relation feeds BOTH the frequency agg
    and the join-back and is deliberately RECOMPUTED for each consumer:
    it is a shuffle-free map-side expansion of the scan, and measurement
    (sf0.1: 0.9 s recompute vs 1.8 s persisted) confirms that caching a
    corpus-scale exploded intermediate costs more than re-running the
    explode — at 100 TB it would also evict genuinely reusable cache.
    At 100 TB the doc-freq relation is the big intermediate — prune it
    with a HAVING doc_freq >= K semi-join before the join-back if only
    flagged spans are needed; the per-doc denominator here needs every
    shingle's frequency, so the join stays full.
    """
    from concurrent_etl_go_spark.llm.dedup import shingles_from_tokens
    from concurrent_etl_go_spark.llm.text import tokenized_docs

    docs = tokenized_docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"),
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("doc_freq"))
    flagged = F.count(F.when(F.col("doc_freq") >= 10, 1))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            flagged.alias("n_boilerplate"),
            F.round(flagged / F.count(F.lit(1)), 4).alias("boilerplate_ratio"),
        )
    )


#: Vocabulary-growth bucket width (documents per bucket).  1 on the
#: synthetic corpus: its 31-type vocabulary saturates within a dozen
#: documents, so coarser buckets collapse the whole curve into one row.
#: On a real corpus set this so vocab/width stays dimension-sized
#: (~1e4 buckets), which keeps the running-sum window bounded.
VOCAB_BUCKET_DOCS = 1


@query(
    "text_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    first_seen AS (
      SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok
    ),
    b AS (
      SELECT CAST(first_doc // {VOCAB_BUCKET_DOCS} AS BIGINT)
               AS doc_bucket,
             COUNT(*) AS n_new_tokens
      FROM first_seen GROUP BY 1
    )
    SELECT doc_bucket, n_new_tokens,
           CAST(SUM(n_new_tokens) OVER (ORDER BY doc_bucket)
                AS BIGINT) AS vocab_size
    FROM b
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) profile: how many NEW token types
    each ``VOCAB_BUCKET_DOCS``-document slice of the corpus introduces,
    plus the running vocabulary size — the curve a tokenizer-training
    pipeline reads to decide how much corpus saturates a vocab budget
    (Heaps 1978, public literature).

    Scale: first-occurrence is one hash aggregation keyed by token
    (the vocabulary key — the same shuffle class as ``text_tfidf``'s
    document frequency), then a bucket agg over |vocab| rows and a
    running sum over the BUCKET table — bounded by
    corpus_size / VOCAB_BUCKET_DOCS rows, so the single-partition
    window is over dimension-sized data,
    never facts (the ``agg_revenue_lorenz`` argument) — and only
    buckets that introduce >= 1 new type appear at all, so the window
    input is further capped at |vocab| rows.  If a corpus/width choice
    ever made bucket counts fact-sized, the cumulative sum has the
    standard two-pass partial-sum form (``operators/quantiles.py``).
    All-integer output: bit-exact across engines, no float discipline.
    """
    docs = tokenized_docs(spark, sf_dir)
    first_seen = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    b = (
        first_seen.select(
            F.expr(f"first_doc div {VOCAB_BUCKET_DOCS}").alias("doc_bucket")
        )
        .groupBy("doc_bucket")
        .agg(F.count(F.lit(1)).alias("n_new_tokens"))
    )
    w = Window.orderBy("doc_bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return b.select(
        "doc_bucket",
        "n_new_tokens",
        F.sum("n_new_tokens").over(w).cast("long").alias("vocab_size"),
    )


#: Number of top merge candidates the BPE step emits.
BPE_TOP_PAIRS = 20


@query(
    "text_bpe_merge_candidates",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    c AS (
      SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM t
    ),
    p AS (
      SELECT doc_id, w[i] AS left_tok, w[i + 1] AS right_tok FROM c
    )
    SELECT left_tok, right_tok,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM p
    GROUP BY 1, 2
    ORDER BY n_pairs DESC, left_tok, right_tok
    LIMIT {BPE_TOP_PAIRS}
    """,
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE inner loop's pair statistics (Sennrich et al. 2016,
    public literature): corpus-wide counts of adjacent token pairs,
    ranked — each training iteration merges the top pair and recounts;
    this query is that counting step at token granularity, the missing
    piece next to ``text_token_regex``'s BPE-ish tokenizer and
    ``text_token_histogram``'s unigram shape.

    Scale: in-row adjacent pairing (guarded ``sequence`` — Spark's
    sequence DESCENDS for n < 2, the ``text_repetition`` convention)
    explodes on its partitions, then ONE (left, right)-keyed hash agg
    with map-side partials and a TakeOrdered top-{BPE_TOP_PAIRS}; the
    distinct-doc count rides the same shuffle.  Ties rank
    lexicographically so the top list is deterministic on both
    engines.  All-integer/string output."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    n = F.size("toks")
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("toks", i).alias("left_tok"),
                    F.element_at("toks", i + 1).alias("right_tok"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.left_tok", "p.right_tok")
    return (
        pairs.groupBy("left_tok", "right_tok")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_pairs"), "left_tok", "right_tok")
        .limit(BPE_TOP_PAIRS)
    )


@query(
    "text_zipf_profile",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS MATERIALIZED (
      SELECT tok, COUNT(*) AS c FROM tok WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, tok) AS rank
      FROM cnt
    )
    SELECT CAST(length(format('{:b}', rank)) - 1 AS BIGINT)
             AS rank_log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_occurrences,
           CAST(MAX(c) AS BIGINT) AS max_count,
           CAST(MIN(c) AS BIGINT) AS min_count
    FROM ranked
    GROUP BY 1
    """,
)
def text_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile of the corpus vocabulary: token
    types ranked by frequency (ties broken by token — both engines rank
    the identical multiset), then folded into power-of-two rank buckets
    with type/occurrence counts and per-bucket frequency extrema — the
    log-log curve a tokenizer-budget decision reads (Zipf 1949, public
    literature; a Zipfian corpus shows n_occurrences roughly constant
    per bucket).

    Scale: one token-keyed hash agg (the ``text_vocab_growth`` shuffle
    class) builds the frequency table; the rank window runs over the
    VOCABULARY (dimension-sized, the ``agg_revenue_lorenz`` argument —
    never fact rows), and the bucket fold is a <= 64-row agg.  Integer
    bucketing via ``length(bin(rank)) - 1`` — the exact-integer log2 of
    ``graph_degree_distribution``, immune to libm boundary flakes on
    exact powers of two (rank 2^k is common by construction).
    All-integer output: bit-exact, no float discipline."""
    docs = tokenized_docs(spark, sf_dir)
    cnt = (
        docs.select(F.explode("toks").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = cnt.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "tok"))
        .alias("rank"),
    )
    return ranked.groupBy(
        (F.length(F.bin(F.col("rank"))) - 1)
        .cast("long")
        .alias("rank_log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_occurrences"),
        F.max("c").alias("max_count"),
        F.min("c").alias("min_count"),
    )


#: Frozen BPE merge table, applied IN ORDER.  In production these are
#: the learned merges — the top pairs ``text_bpe_merge_candidates``
#: surfaces each training iteration (Sennrich et al. 2016); freezing
#: them makes the APPLY step a pure deterministic function both engines
#: evaluate identically (the ``llm/ivfpq2.py`` frozen-codebook
#: convention: fit offline, prove the serving algebra).  Later merges
#: consume earlier outputs ("t h" -> "th", then "th e" -> "the"), so
#: the chain exercises real merge composition.
BPE_MERGES = (
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("e", "r"),
    ("o", "n"),
    ("s", "t"),
)

#: Number of top subword tokens the apply step reports.
BPE_APPLY_TOP = 30


def _bpe_apply_oracle() -> str:
    merged = "s"
    for a, b in BPE_MERGES:
        merged = f"replace({merged}, '{a} {b}', '{a}{b}')"
    return f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s
      FROM w
    ),
    m AS (SELECT doc_id, {merged} AS s FROM c),
    t AS (SELECT doc_id, unnest(string_split(s, ' ')) AS tok FROM m)
    SELECT tok, COUNT(*) AS n_tokens,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM t WHERE tok <> ''
    GROUP BY 1
    ORDER BY n_tokens DESC, tok
    LIMIT {BPE_APPLY_TOP}
    """


@query("text_bpe_apply", oracle=_bpe_apply_oracle())
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION with a frozen merge table — the other
    half of the BPE loop next to ``text_bpe_merge_candidates``'s pair
    counting: words split to characters, then each learned merge
    rewrites its pair in order, and the resulting subword vocabulary is
    ranked by corpus frequency (the "what does the tokenizer actually
    emit" report every training-data pipeline runs before committing a
    vocab).

    Portability of the rewrite itself: each merge is ONE sequential
    left-to-right non-overlapping string replace — Spark ``replace``
    and DuckDB ``replace`` share that exact semantic (verified on
    overlapping-pair adversarial cases: 'a a a a' -> 'aa aa' on both),
    and the char split is the same global regexp in both dialects, so
    the full rewrite chain is engine-identical with no float anywhere.

    Scale: the entire merge chain is per-row string arithmetic in
    whole-stage codegen (k nested replaces — no join, no shuffle, no
    Python), then ONE (token)-keyed hash agg with map-side partials
    rides the only exchange; top-{k} via TakeOrdered with the
    lexicographic tie-break.  A 100k-merge production vocab compiles
    the same way (chained replaces on bounded-length words) or swaps
    to a broadcast trie lookup in a pandas UDF; the counting plan —
    the part under test — is unchanged."""
    words = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens("text")).alias("word")
    )
    s = F.trim(F.regexp_replace("word", "(.)", "$1 "))
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
    toks = words.select(
        "doc_id", F.explode(F.split(s, " ")).alias("tok")
    ).where(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_tokens"), "tok")
        .limit(BPE_APPLY_TOP)
    )


#: Quality buckets for the corpus-mix report: token-count floor and the
#: English stopword-ratio floor (the ``text_langid`` confidence idiom).
MIX_MIN_TOKENS = 20
MIX_MIN_STOP_RATIO = 0.02


@query(
    "text_lang_quality_matrix",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    b AS MATERIALIZED (
      SELECT lang,
        CASE
          WHEN len(w) < {MIX_MIN_TOKENS} THEN 'short'
          WHEN CAST(len(list_filter(w, x -> lower(x) IN ('the','a','and',
               'of','to','in','is','for','on','with'))) AS DOUBLE)
               / greatest(len(w), 1) < {MIX_MIN_STOP_RATIO}
            THEN 'low_stopword'
          ELSE 'ok' END AS quality_bucket
      FROM t
    ),
    c AS (
      SELECT lang, quality_bucket, COUNT(*) AS n_docs
      FROM b GROUP BY 1, 2
    )
    SELECT lang, quality_bucket, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs * 10000 // SUM(n_docs) OVER () AS BIGINT)
             AS share_bp
    FROM c
    ORDER BY lang, quality_bucket
    """,
)
def text_lang_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition cross-tab: language x quality bucket with doc
    counts and corpus share in integer basis points — the "what goes
    into the training mix" report every pretraining pipeline signs off
    before sampling weights are chosen (the mix views published for
    C4/ROOTS-class corpora, public literature).  Buckets: 'short'
    (under ``MIX_MIN_TOKENS`` tokens), 'low_stopword' (English
    stopword ratio under ``MIX_MIN_STOP_RATIO`` — boilerplate/code
    smell), else 'ok'; the ratio compare is one IEEE division per doc,
    identical on both engines (the ``text_langid`` discipline).

    Scale: pure scan -> per-row bucket expression -> ONE
    (lang, bucket)-keyed hash agg with map-side partials;
    |langs| x 3 output rows, so the share window runs on a
    dimension-sized frame."""
    docs = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    from concurrent_etl_go_spark.llm.text import EN_STOPWORDS

    stop_ratio = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    ) / F.greatest(F.size(toks), F.lit(1))
    bucket = (
        F.when(F.size(toks) < MIX_MIN_TOKENS, F.lit("short"))
        .when(stop_ratio < MIX_MIN_STOP_RATIO, F.lit("low_stopword"))
        .otherwise(F.lit("ok"))
    )
    c = docs.groupBy("lang", bucket.alias("quality_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        c.select(
            "lang",
            "quality_bucket",
            "n_docs",
            F.expr("n_docs * 10000").alias("_num"),
            total.alias("_den"),
        )
        .select(
            "lang",
            "quality_bucket",
            "n_docs",
            F.expr("_num div _den").cast("long").alias("share_bp"),
        )
        .orderBy("lang", "quality_bucket")
    )


#: Duplicate-span n-gram width (the Lee et al. 2022 "Deduplicating
#: Training Data" exact-substring grain, public literature).
DUP_NGRAM_K = 8


@query(
    "text_dup_ngram_coverage",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS MATERIALIZED (
      SELECT doc_id, u.s,
             array_to_string(w[u.s + 1 : u.s + {DUP_NGRAM_K}], ' ') AS gram
      FROM t, unnest(range(0, len(w) - {DUP_NGRAM_K} + 1)) AS u(s)
    ),
    dup AS MATERIALIZED (
      SELECT gram FROM g GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    ds AS MATERIALIZED (
      SELECT g.doc_id, g.s,
             lead(g.s) OVER (PARTITION BY g.doc_id ORDER BY g.s) AS ns
      FROM g JOIN dup ON g.gram = dup.gram
    ),
    cov AS MATERIALIZED (
      SELECT doc_id,
             CAST(SUM(LEAST({DUP_NGRAM_K},
                            COALESCE(ns - s, {DUP_NGRAM_K}))) AS BIGINT)
               AS covered
      FROM ds GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
           COALESCE(cov.covered, 0) AS covered_tokens,
           CAST(COALESCE(cov.covered, 0) * 10000 // len(t.w) AS BIGINT)
             AS coverage_bp
    FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
    ORDER BY t.doc_id
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span coverage per document — the exact-substring dedup
    METRIC of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", public literature): a token is covered
    when it lies inside any ``DUP_NGRAM_K``-gram that also appears in
    at least one OTHER document, and the per-doc coverage ratio (in
    integer basis points) is the triage signal that decides between
    dropping the doc, cutting the span, or keeping it.  Complements
    the document-level dedup family (`dedup_*`): those ask "is this
    DOC a duplicate"; this asks "how much of this doc is boilerplate
    shared with others".

    The interval-union sweep is exact and portable: duplicated gram
    START positions sorted per doc; each start covers
    ``min(K, next_start − start)`` tokens (the [s, s+K) windows merge
    where they overlap), computed with one LEAD — no per-token
    explosion.  All integers end-to-end.

    Scale: gram construction is an in-row transform + posexplode
    (n_tokens rows per doc, the shingling cost every MinHash pipeline
    already pays); duplicate grams come from ONE gram-keyed hash agg;
    the sweep windows partition BY DOCUMENT.  At 100 TB the gram agg
    is the dominant shuffle — identical shape to
    ``dedup_minhash_signature``'s shingle pass, and the gram key can
    hash to a fixed-width fingerprint to cut shuffle bytes."""
    from concurrent_etl_go_spark.llm.text import kgram_index

    k = DUP_NGRAM_K
    docs = tokenized_docs(spark, sf_dir)
    base = docs.select("doc_id", "toks", F.size("toks").alias("n_tokens"))
    g = base.select(
        "doc_id",
        F.explode(kgram_index(F.col("toks"), k)).alias("s"),
        F.col("toks"),
    ).select(
        "doc_id",
        "s",
        F.array_join(F.slice("toks", F.col("s") + 1, k), " ").alias("gram"),
    )
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    ds = g.join(dup, "gram").select(
        "doc_id",
        "s",
        F.lead("s").over(
            Window.partitionBy("doc_id").orderBy("s")
        ).alias("ns"),
    )
    cov = ds.groupBy("doc_id").agg(
        F.sum(
            F.least(F.lit(k), F.coalesce(F.col("ns") - F.col("s"), F.lit(k)))
        ).alias("covered")
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("covered", F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.expr(
                "cast(coalesce(covered, 0) * 10000 div n_tokens as bigint)"
            ).alias("coverage_bp"),
        )
        .orderBy("doc_id")
    )


_BURST_MIN_T = 5  # total-count floor below which VMR is noise
_BURST_TOP = 20


@query(
    "text_term_burstiness",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    per_doc AS MATERIALIZED (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    stats AS MATERIALIZED (
      SELECT term,
             CAST(SUM(c) AS BIGINT) AS t,
             CAST(SUM(c * c) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM per_doc GROUP BY 1
      HAVING SUM(c) >= {_BURST_MIN_T}
    )
    SELECT term, t, df,
           CAST((CAST(n.n_docs AS HUGEINT) * sq - CAST(t AS HUGEINT) * t)
                * 10000
                // (CAST(n.n_docs AS HUGEINT) * t) AS BIGINT) AS vmr_bp
    FROM stats CROSS JOIN n
    ORDER BY vmr_bp DESC, term LIMIT {_BURST_TOP}
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995, public literature): the
    variance-to-mean ratio of each term's per-document count over the
    WHOLE corpus (zero-count documents included) — uniform background
    words sit near VMR 1 (Poisson), topical/bursty words far above; the
    content-vs-function-word signal TF-IDF approximates and corpus
    curation uses to spot template spam (pathologically bursty terms).

    All integer: with N docs, term total T and per-doc sum of squares
    SQ (zeros contribute 0 to both), VMR = var/mean =
    ``(N*SQ - T^2) div (N*T)`` in basis points — one cross-multiplied
    floor division, DECIMAL/HUGEINT products (at 100 TB, T^2 clears
    int64).  Rank on the integer score with a term tie-break.

    Scale: one (term, doc) hash agg over the exploded token stream
    (the ``text_tfidf`` tf shape), one term-keyed rollup, a broadcast
    one-row corpus count, TakeOrdered top-N."""
    docs = tokenized_docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode("toks").alias("term"))
    per_doc = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = (
        per_doc.groupBy("term")
        .agg(
            F.sum("c").cast("long").alias("t"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
        .where(F.col("t") >= _BURST_MIN_T)
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = stats.crossJoin(F.broadcast(n)).select(
        "term",
        "t",
        "df",
        F.expr(
            "CAST((CAST(n_docs AS DECIMAL(38,0)) * sq"
            " - CAST(t AS DECIMAL(38,0)) * t) * 10000"
            " div (CAST(n_docs AS DECIMAL(38,0)) * t) AS BIGINT)"
        ).alias("vmr_bp"),
    )
    return scored.orderBy(F.desc("vmr_bp"), "term").limit(_BURST_TOP)
