"""Experimentation analytics, part 3: the sequential probability ratio
test (SPRT) monitor.

``agg_sprt_ab`` runs Wald's SPRT (Wald 1945, public literature) over
the treatment arm's daily conversion stream — the "peek every day
without inflating false positives" monitor production experimentation
platforms run between fixed-horizon readouts.  Hypotheses are derived
from the data so the query is self-contained at every scale factor:
H0 = the pooled conversion rate, H1 = a +10% relative lift on it.
Each day contributes ``c*ln(p1/p0) + (n-c)*ln((1-p1)/(1-p0))`` to the
running log-likelihood ratio; crossing ``ln((1-beta)/alpha)`` accepts
H1, crossing ``ln(beta/(1-alpha))`` accepts H0.

Cross-engine exactness: the only transcendentals are TWO SCALAR
constants (the per-conversion and per-non-conversion log ratios) —
pinned once with ROUND(8) + 0.0 over rates that are exact int64
ratios; every daily term is integer-weighted arithmetic on those two
identical doubles, FLOOR'd to integer micro-nats per day (floor of a
bit-identical double is bit-identical), and the running LLR is an
integer SUM — order-independent, immune to segment-tree window
summation order.  The float trace derives from that integer.

Scale: one events scan -> (day, user)-grain distinct agg -> day-keyed
counts; the cumulative window is day-count sized.  Reference parity:
no experimentation surface exists in the reference (etl/main.go);
extends SURVEY.md §2.B beside ``operators/experiments2.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: md5 arm bucket (experiments.py convention).
_SQL_ARM = (
    "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2)"
)

_ALPHA = 0.05
_BETA = 0.05
#: Wald boundaries as precomputed INTEGER micro-nat literals — the
#: running LLR accumulates as integers (cumulative FLOAT window sums
#: are not portable: DuckDB's windowed SUM may add in segment-tree
#: order, not left-to-right), so the boundaries are integers too.
_UPPER_E6 = int(math.floor(math.log((1 - _BETA) / _ALPHA) * 1e6))
_LOWER_E6 = int(math.ceil(math.log(_BETA / (1 - _ALPHA)) * 1e6))
_LIFT = 1.1  # H1: +10% relative lift on the pooled rate

#: The two pinned scalar log ratios over exact int64 pooled counts
#: (ct = pooled conversions, nt = pooled exposures).  p0 = ct/nt,
#: p1 = min(1.1 * p0, 0.999999).
_P0 = "(CAST(ct AS DOUBLE) / nt)"
_P1 = f"LEAST({_LIFT} * {_P0}, 0.999999)"
_LR_CONV = f"ROUND(ln({_P1} / {_P0}), 8) + 0.0"
_LR_MISS = f"ROUND(ln((1.0 - {_P1}) / (1.0 - {_P0})), 8) + 0.0"


def _sprt_sql() -> str:
    return f"""
    WITH active AS MATERIALIZED (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id,
             {_SQL_ARM} AS arm
      FROM events
    ),
    conv AS MATERIALIZED (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id
      FROM events WHERE event_type = 'purchase'
    ),
    daily AS MATERIALIZED (
      SELECT a.day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                  AS BIGINT) AS c
      FROM active a
      LEFT JOIN conv c ON c.day = a.day AND c.user_id = a.user_id
      WHERE a.arm = 1
      GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(c) AS BIGINT) AS ct
      FROM daily
    ),
    terms AS MATERIALIZED (
      SELECT day, n, c,
             CAST(FLOOR((c * ({_LR_CONV}) + (n - c) * ({_LR_MISS}))
                        * 1000000.0) AS BIGINT) AS term_e6
      FROM daily CROSS JOIN pooled
    ),
    cum AS (
      SELECT day, n, c, term_e6,
             CAST(SUM(term_e6) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS llr_e6
      FROM terms
    )
    SELECT day, n AS n_exposed, c AS n_converted,
           term_e6, llr_e6,
           (CAST(llr_e6 AS DOUBLE) / 1000000.0) + 0.0 AS llr_cum,
           CASE WHEN llr_e6 >= {_UPPER_E6} THEN 'accept_h1'
                WHEN llr_e6 <= {_LOWER_E6} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    """


@query("agg_sprt_ab", oracle=_sprt_sql())
def agg_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily SPRT trace for the treatment arm's conversion rate: per
    day, the arm's exposed/converted user counts, the day's LLR
    contribution, the running LLR, and the Wald decision at 5%/5%
    error rates.  The log ratios are two ROUND(8)-pinned scalars over
    the pooled integer rate, so the whole trace is bit-identical
    across engines and emits unrounded."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
    )
    active = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            "user_id",
            arm.alias("arm"),
        )
        .distinct()
        .where(F.col("arm") == 1)
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    daily = scoped_persist(
        active.join(conv, ["day", "user_id"], "left")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("c"),
        )
    )
    pooled = daily.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("c").cast("long").alias("ct"),
    )
    terms = daily.crossJoin(F.broadcast(pooled)).select(
        "day",
        "n",
        "c",
        F.expr(
            f"CAST(FLOOR((c * ({_LR_CONV}) + (n - c) * ({_LR_MISS}))"
            f" * 1000000.0) AS BIGINT)"
        ).alias("term_e6"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = terms.select(
        "day",
        "n",
        "c",
        "term_e6",
        F.sum("term_e6").over(w).cast("long").alias("llr_e6"),
    )
    return cum.select(
        "day",
        F.col("n").alias("n_exposed"),
        F.col("c").alias("n_converted"),
        "term_e6",
        "llr_e6",
        F.expr("(CAST(llr_e6 AS DOUBLE) / 1000000.0) + 0.0").alias(
            "llr_cum"
        ),
        F.expr(
            f"CASE WHEN llr_e6 >= {_UPPER_E6} THEN 'accept_h1'"
            f" WHEN llr_e6 <= {_LOWER_E6} THEN 'accept_h0'"
            f" ELSE 'continue' END"
        ).alias("decision"),
    )


@query(
    "agg_capture_recapture",
    oracle="""
    WITH b AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS bound
      FROM events
    ),
    s1 AS MATERIALIZED (
      SELECT DISTINCT user_id FROM events CROSS JOIN b
      WHERE epoch_us(ts) < b.bound
    ),
    s2 AS MATERIALIZED (
      SELECT DISTINCT user_id FROM events CROSS JOIN b
      WHERE epoch_us(ts) >= b.bound
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS recaptured
      FROM s1 JOIN s2 USING (user_id)
    ),
    c AS (
      SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n1,
             CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n2,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events)
                  AS BIGINT) AS observed
    )
    SELECT n1 AS first_half_users, n2 AS second_half_users,
           recaptured, observed,
           CAST((n1 + 1) * (n2 + 1) // (recaptured + 1) - 1 AS BIGINT)
             AS chapman_estimate,
           CAST(observed * 1000000 //
                ((n1 + 1) * (n2 + 1) // (recaptured + 1) - 1) AS BIGINT)
             AS coverage_e6
    FROM c CROSS JOIN m
    """,
)
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimate of the active-user population
    (Lincoln-Petersen with the Chapman small-sample correction, public
    literature): the first and second halves of the event-time span
    are the two "capture" samples, their overlap is the recapture, and
    ``(n1+1)(n2+1)/(m+1) - 1`` estimates how many users EXIST —
    observed or not.  ``coverage_e6`` = observed/estimated is the
    "what fraction of the population have we ever seen" readout a
    growth team tracks.  Pure integer arithmetic, one row.

    Scale: two distinct-user aggs and a key join — the same shuffle
    class as ``agg_new_vs_returning``."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    bound = ev.agg(
        F.expr(
            "(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) div 2"
        ).alias("bound")
    )
    tagged = ev.crossJoin(F.broadcast(bound)).select(
        "user_id",
        (F.expr("unix_micros(ts)") < F.col("bound")).alias("first_half"),
    )
    s1 = tagged.where("first_half").select("user_id").distinct()
    s2 = tagged.where(~F.col("first_half")).select("user_id").distinct()
    m = s1.join(s2, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("recaptured")
    )
    c = (
        s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).cast("long").alias("n2")))
        .crossJoin(
            ev.agg(
                F.countDistinct("user_id").cast("long").alias("observed")
            )
        )
    )
    return c.crossJoin(F.broadcast(m)).select(
        F.col("n1").alias("first_half_users"),
        F.col("n2").alias("second_half_users"),
        "recaptured",
        "observed",
        F.expr(
            "CAST((n1 + 1) * (n2 + 1) div (recaptured + 1) - 1"
            " AS BIGINT)"
        ).alias("chapman_estimate"),
        F.expr(
            "CAST(observed * 1000000 div"
            " ((n1 + 1) * (n2 + 1) div (recaptured + 1) - 1) AS BIGINT)"
        ).alias("coverage_e6"),
    )
