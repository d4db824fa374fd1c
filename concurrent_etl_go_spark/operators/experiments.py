"""Experimentation analytics: deterministic A/B assignment and the
two-proportion test readout.

The missing family next to the attribution/funnel queries: a training-
data or product pipeline that ships models runs ONLINE EXPERIMENTS, and
the analytics engine owes it the canonical readout — deterministic
hash-based arm assignment (the ``split_train_val_test`` discipline: a
user's arm never changes as data grows, no assignment table to join),
per-arm conversion, the pooled two-proportion z statistic, and the
sample-ratio-mismatch (SRM) chi-square guard that invalidates the
experiment when the split itself is broken (Kohavi et al., "Trustworthy
Online Controlled Experiments", public literature).

Reference parity: the reference engine (etl/main.go, 485 LoC) has no
experimentation surface; this extends SURVEY.md §2.B alongside the
funnel/attribution family.

Cross-engine float discipline: every input to the float stats is an
exact integer count; both engines evaluate the IDENTICAL IEEE op
sequence (divisions, one correctly-rounded sqrt), so the doubles match
bit-for-bit before the ROUND(…,4)+0.0 canonicalization.  Rates are
ALSO emitted as exact integer basis points via portable floor division
(the ``agg_basket_lift`` convention) so the headline numbers carry no
float at all.  The all-converted / none-converted degenerate case
(pooled variance 0 — a divide-by-zero that Spark's ANSI mode raises
and DuckDB NULLs, i.e. a guaranteed cross-engine divergence) is pinned
to z = 0.0 by an identical CASE guard on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Portable md5 arm bucket (the llm/datasets.py ``hash_bucket`` idiom):
#: Spark ``conv(substring(md5(x),1,4),16,10)`` == DuckDB
#: ``('0x'||substr(md5(x),1,4))::BIGINT`` bit-for-bit.
_SQL_ARM = (
    "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2)"
)


@query(
    "agg_ab_test",
    oracle=f"""
    WITH u AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             {_SQL_ARM} AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
      FROM events GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS conv_a,
        SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS conv_b
      FROM u
    )
    SELECT
      CAST(n_a AS BIGINT) AS n_a,
      CAST(n_b AS BIGINT) AS n_b,
      CAST(conv_a AS BIGINT) AS conv_a,
      CAST(conv_b AS BIGINT) AS conv_b,
      CAST((10000 * conv_a) // n_a AS BIGINT) AS rate_a_bp,
      CAST((10000 * conv_b) // n_b AS BIGINT) AS rate_b_bp,
      CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
           THEN 0.0
           ELSE ROUND(
        (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        / sqrt(
            (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
            * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
            * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
          ),
        4) + 0.0 END AS z_score,
      ROUND(
        (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
          * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
          / (CAST(n_a + n_b AS DOUBLE) / 2.0)
        + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
          * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
          / (CAST(n_a + n_b AS DOUBLE) / 2.0),
        4) + 0.0 AS srm_chi2
    FROM s
    """,
)
def agg_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout in one pass: users split into two arms by
    the deterministic md5 bucket (stable under data growth — a user's
    arm never flips, no assignment table), analysis unit = USER-DAY
    (conversion = "purchased that day": the DAU-conversion grain that
    keeps variation at every corpus size, where lifetime "ever
    purchased" saturates to 100% on long event histories — the
    degenerate case the z guard pins; clustered-by-user standard
    errors are the documented next refinement, same plan), then the
    pooled two-proportion z statistic and the SRM chi-square (the
    guard that flags a broken split: under a healthy 50/50 hash,
    chi2 ~ χ²(1); a large value invalidates the experiment regardless
    of z).

    Scale: one scan of events → ONE (user, day)-keyed hash agg
    (any-purchase flag, combiner-friendly MAX) → one global agg
    folding both arms' counts in the same pass (4 conditional sums —
    no pivot, no second shuffle) → scalar arithmetic on a single row.
    Driver traffic: that one row.  Per-experiment/per-metric variants
    add the experiment key to both group-bys; the plan shape is
    unchanged."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
    )
    units = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    s = units.select(arm.alias("arm"), "conv").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / n
    z = (ca / n_a - cb / n_b) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    )
    conv_tot = F.col("conv_a") + F.col("conv_b")
    degenerate = (conv_tot == 0) | (conv_tot == F.col("n_a") + F.col("n_b"))
    half = n / F.lit(2.0)
    chi2 = (n_a - half) * (n_a - half) / half + (n_b - half) * (
        n_b - half
    ) / half
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.expr("(10000 * conv_a) div n_a").alias("rate_a_bp"),
        F.expr("(10000 * conv_b) div n_b").alias("rate_b_bp"),
        F.when(degenerate, F.lit(0.0))
        .otherwise(F.round(z, 4) + F.lit(0.0))
        .alias("z_score"),
        (F.round(chi2, 4) + F.lit(0.0)).alias("srm_chi2"),
    )
