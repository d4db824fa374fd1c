"""Privacy / re-identification analytics over the customer dimension.

A training-data pipeline that ingests user-derived records needs the
governance readouts regulators and privacy reviews actually ask for,
not just the scrub pass (``text_pii_scrub``):

- **k-anonymity** (Sweeney 2002): the equivalence-class-size histogram
  of the quasi-identifier projection — how many records are unique or
  near-unique on (nation, market segment, balance bucket).
- **l-diversity** (Machanavajjhala et al. 2007): within each
  quasi-identifier class, how many DISTINCT sensitive values appear —
  a k-anonymous class whose members all share one sensitive value
  still leaks it.
- **generalization ladder** (Samarati 2001): the k/suppression
  trade-off as the balance bucket coarsens ($100 → $1,000 → $10,000)
  — the readout a Mondrian-style anonymizer iterates on.
- **PII density audit**: per-source pattern-hit rates per 10k chars,
  the "which ingest feeds need scrubbing attention" dashboard row.

All outputs are exact integers (counts, floor-divided rates) so the
driver hash is bit-stable.  Scale: every query is a hash aggregation
over the customer dimension (or one customer⋈orders equi-join), then a
histogram over class sizes — dimension-scale shuffles only; the PII
audit is a map-only regex scan + one source-keyed agg.  At 100 TB the
QI tuple count is bounded by the key-domain product, not by fact rows.

Reference parity: the reference engine (etl/main.go:1-485) has no
privacy surface; this extends SURVEY.md §2.B (dataset governance).
Negative balances make floor semantics live: Spark ``div`` truncates
toward zero while DuckDB ``//`` floors, so both sides share the
``kmeans2._FDIV`` adjusted-numerator idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.llm.text2 import EMAIL_RE, PHONE_RE
from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Exact cents from the double-typed balance (the finance4 idiom —
#: identical SQL text on both engines).
_CENTS = "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"

#: Floor division that is identical for negative numerators on both
#: engines (kmeans2._FDIV): adjust the numerator to an exact multiple,
#: then truncating (Spark ``div``) == flooring (DuckDB ``//``).
_FDIV = "(({s}) - ((({s}) % {n} + {n}) % {n})) {op} {n}"

#: Base quasi-identifier balance bucket: $1,000 (100,000 cents).
_QI_BUCKET_CENTS = 100_000

#: Suppression threshold for the generalization ladder.
_K_MIN = 5

#: Generalization ladder bucket widths, in cents ($100/$1,000/$10,000).
_LADDER_CENTS = (10_000, 100_000, 1_000_000)


def _qi_sql(op: str, bucket_cents: int = _QI_BUCKET_CENTS) -> str:
    return _FDIV.format(s=_CENTS, n=bucket_cents, op=op)


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             {_qi_sql('//')} AS bal_bucket,
             COUNT(*) AS k
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT CAST(k AS BIGINT) AS class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(k * COUNT(*) AS BIGINT) AS n_rows
    FROM classes GROUP BY k
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class-size histogram of the quasi-identifier
    projection (nation, market segment, $1,000 balance bucket): for
    each class size k, how many classes and how many customers sit at
    exactly that anonymity level.  ``class_size = 1`` rows are unique
    — re-identifiable by the QI alone (Sweeney 2002).

    Two dimension-scale hash aggs: QI-keyed class sizing, then a
    size-keyed histogram.  No joins, no windows."""
    cust = read_table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(_qi_sql("div")).alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return classes.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        (F.col("k") * F.count(F.lit(1))).cast("long").alias("n_rows"),
    ).select(
        F.col("k").cast("long").alias("class_size"), "n_classes", "n_rows"
    )


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH sens AS (
      SELECT o_custkey, MIN(o_orderpriority) AS sv
      FROM orders GROUP BY 1
    ),
    classes AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             {_qi_sql('//')} AS bal_bucket,
             COUNT(*) AS class_rows,
             COUNT(DISTINCT s.sv) AS l
      FROM customer c JOIN sens s ON s.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    )
    SELECT CAST(l AS BIGINT) AS l_diversity,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_rows) AS BIGINT) AS n_rows
    FROM classes GROUP BY l
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity histogram (Machanavajjhala et al. 2007): per
    quasi-identifier class, the number of DISTINCT sensitive values
    (each ordering customer's alphabetically-first order priority — a
    deterministic per-customer attribute), then a histogram over l.
    ``l_diversity = 1`` classes leak their sensitive value to anyone
    who can place a member in the class, regardless of k.

    Customers with no orders carry no sensitive value and are out of
    scope (inner join).  One customer-keyed equi-join + two
    dimension-scale hash aggs."""
    cust = read_table(spark, sf_dir, "customer")
    sens = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_orderpriority").alias("sv"))
    )
    classes = (
        cust.join(sens, cust["c_custkey"] == sens["o_custkey"])
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(_qi_sql("div")).alias("bal_bucket"),
            "sv",
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("class_rows"),
            F.countDistinct("sv").alias("l"),
        )
    )
    return classes.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_rows").cast("long").alias("n_rows"),
    ).select(
        F.col("l").cast("long").alias("l_diversity"), "n_classes", "n_rows"
    )


@query(
    "privacy_generalization_ladder",
    oracle=f"""
    WITH widths AS (
      SELECT * FROM (VALUES {', '.join(f'({w})' for w in _LADDER_CENTS)})
        AS t(w_cents)
    ),
    classes AS (
      SELECT w.w_cents, c.c_nationkey, c.c_mktsegment,
             {_FDIV.format(s=_CENTS, n='w.w_cents', op='//')} AS bucket,
             COUNT(*) AS k
      FROM customer c CROSS JOIN widths w
      GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(w_cents // 100 AS BIGINT) AS width_dollars,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(COALESCE(SUM(k) FILTER (WHERE k < {_K_MIN}), 0) AS BIGINT)
             AS rows_suppressed,
           CAST(COALESCE(MIN(k) FILTER (WHERE k >= {_K_MIN}), 0) AS BIGINT)
             AS k_after_suppression
    FROM classes GROUP BY w_cents
    """,
)
def privacy_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The generalization/suppression trade-off (Samarati 2001): for
    each balance-bucket width on the ladder, the class count, the
    worst-case k, the rows a k≥{_K_MIN} policy would suppress, and the
    k actually achieved after suppression.  Coarser buckets raise
    min-k and shrink suppression — this table is the whole decision
    surface an anonymizer sweeps.

    One explode to |ladder| copies per customer row (a 3x map-side
    fan-out, not a shuffle multiplier), then the same two hash aggs as
    ``privacy_k_anonymity``."""
    cust = read_table(spark, sf_dir, "customer")
    widths = F.array(*[F.lit(w) for w in _LADDER_CENTS])
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(_CENTS).alias("cents"),
            F.explode(widths).alias("w_cents"),
        )
        .select(
            "w_cents",
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                _FDIV.format(s="cents", n="w_cents", op="div")
            ).alias("bucket"),
        )
        .groupBy("w_cents", "c_nationkey", "c_mktsegment", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    below = F.when(F.col("k") < _K_MIN, F.col("k"))
    at_or_above = F.when(F.col("k") >= _K_MIN, F.col("k"))
    return classes.groupBy("w_cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("min_k"),
        F.coalesce(F.sum(below), F.lit(0)).cast("long").alias(
            "rows_suppressed"
        ),
        F.coalesce(F.min(at_or_above), F.lit(0)).cast("long").alias(
            "k_after_suppression"
        ),
    ).select(
        F.expr("CAST(w_cents div 100 AS BIGINT)").alias("width_dollars"),
        "n_classes",
        "min_k",
        "rows_suppressed",
        "k_after_suppression",
    )


@query(
    "privacy_pii_density",
    oracle=f"""
    WITH injected AS (
      SELECT source,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example'
                  ELSE text END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' call +1-555-'
                          || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR),
                                  4, '0')
                     ELSE '' END AS full_text
      FROM documents
    ),
    hits AS (
      SELECT source, full_text,
             len(regexp_extract_all(full_text, '{EMAIL_RE}'))
               AS email_hits,
             len(regexp_extract_all(full_text, '{PHONE_RE}'))
               AS phone_hits
      FROM injected
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(email_hits) AS BIGINT) AS email_hits,
           CAST(SUM(phone_hits) AS BIGINT) AS phone_hits,
           CAST(SUM(length(full_text)) AS BIGINT) AS chars,
           CAST(SUM(email_hits + phone_hits) * 10000
                // SUM(length(full_text)) AS BIGINT)
             AS hits_per_10k_chars
    FROM hits GROUP BY source
    """,
)
def privacy_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII-pattern density: email/phone hits and hits per
    10k chars — the audit row that tells a scrubbing pipeline which
    ingest feeds need attention.  The synthetic corpus has no organic
    PII, so a deterministic contact line is injected into every 3rd
    (email) / 5th (phone) document by ``doc_id`` — the operator under
    test is the density readout, which then has a provable non-uniform
    per-source distribution.

    Map-only regex scan (RE2-compatible patterns, no lookaround) + one
    source-keyed hash agg; rates are exact floor-divided integers."""
    docs = read_table(spark, sf_dir, "documents")
    full = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example"),
            ),
        ).otherwise(F.col("text")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    hits = docs.select(
        "source",
        full.alias("full_text"),
    ).select(
        "source",
        "full_text",
        F.size(
            F.regexp_extract_all("full_text", F.lit(EMAIL_RE), F.lit(0))
        ).alias("email_hits"),
        F.size(
            F.regexp_extract_all("full_text", F.lit(PHONE_RE), F.lit(0))
        ).alias("phone_hits"),
    )
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("email_hits").cast("long").alias("email_hits"),
        F.sum("phone_hits").cast("long").alias("phone_hits"),
        F.sum(F.length("full_text")).cast("long").alias("chars"),
        F.expr(
            "CAST(SUM(email_hits + phone_hits) * 10000"
            " div SUM(length(full_text)) AS BIGINT)"
        ).alias("hits_per_10k_chars"),
    )
