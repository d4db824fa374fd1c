"""Experimentation analytics, part 2: CUPED variance-reduced readout
and the difference-in-differences estimator.

CUPED (Controlled-experiment Using Pre-Experiment Data; Deng, Xu,
Kohavi & Walker, WSDM 2013 — public literature) is the production
experimentation-platform estimator: regress the experiment-period
metric Y on the pre-period metric X of the same unit, then read out the
adjusted metric ``Y - theta * (X - mean(X))`` per arm.  Randomization
makes the adjustment unbiased while removing the between-user variance
X explains — typically 30-50% tighter confidence intervals for free.

Difference-in-differences is the panel twin: compare each arm's
pre-to-post CHANGE, cancelling fixed per-arm level differences
(Card & Krueger 1994 framing; here the arms are randomized, so DiD is
the robustness readout beside CUPED's efficiency readout).

Cross-engine float discipline (SURVEY §7.6): every stochastic quantity
is an exact INTEGER (per-user purchase counts, their pairwise product
sums in DECIMAL(38,0)/HUGEINT); the few emitted floats are single
shared-text expressions over those integers, ROUND(4) + 0.0 on both
engines, with CASE guards pinning the zero-variance degenerate cases.
The squared correlation is emitted as EXACT integer basis points via
floor division in 128-bit integers — the headline "how much variance
did CUPED remove" number carries no float at all.  (At ~1e9 units and
~1e10 metric sums the 128-bit ``cov^2 * 10^4`` product approaches
overflow — at that scale emit rho2 from the float path instead; the
integer form is exact through ~1e4x this corpus.)

The pre/experiment boundary is DERIVED from the data (the midpoint of
the event-time span, integer microseconds, floor-halved) so the query
is deterministic at every scale factor without a pinned calendar date.

Reference parity: the reference engine (etl/main.go) has no
experimentation surface; extends SURVEY.md §2.B beside
``operators/experiments.py`` (VERDICT r9 item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Portable md5 arm bucket (operators/experiments.py convention).
_SQL_ARM = (
    "(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2)"
)

#: Shared float fragments — IDENTICAL text evaluated by both engines
#: over exactly-equal integer columns, so the IEEE trees match
#: bit-for-bit before ROUND(4) + 0.0.
_MEAN_Y = "ROUND(CAST(sy AS DOUBLE) / n, 4) + 0.0"
_THETA = (
    "CASE WHEN varx_n = 0 THEN 0.0 ELSE "
    "ROUND(CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE), 4) + 0.0 END"
)
_ADJ_MEAN_Y = (
    "CASE WHEN varx_n = 0 THEN ROUND(CAST(sy AS DOUBLE) / n, 4) + 0.0 "
    "ELSE ROUND(CAST(sy AS DOUBLE) / n "
    "- (CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE)) "
    "* (CAST(sx AS DOUBLE) / n - CAST(sxp AS DOUBLE) / np), 4) + 0.0 END"
)


def _cuped_sql(big: str) -> str:
    """The CUPED readout in one dialect; ``big`` is the 128-bit integer
    type (HUGEINT for DuckDB, DECIMAL(38,0) for Spark)."""
    return f"""
    WITH b AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS bound
      FROM events
    ),
    units AS MATERIALIZED (
      SELECT user_id, {_SQL_ARM} AS arm,
             SUM(CASE WHEN epoch_us(ts) < b.bound
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN epoch_us(ts) >= b.bound
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events CROSS JOIN b GROUP BY 1, 2
    ),
    arms AS MATERIALIZED (
      SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM units GROUP BY 1
    ),
    pool AS (
      SELECT SUM(n) AS np, SUM(sx) AS sxp, SUM(sy) AS syp,
             SUM(sxx) AS sxxp, SUM(sxy) AS sxyp, SUM(syy) AS syyp
      FROM arms
    ),
    calc AS (
      SELECT a.arm, a.n, a.sx, a.sy, p.np, p.sxp,
             CAST(p.np AS {big}) * p.sxyp
               - CAST(p.sxp AS {big}) * p.syp AS cov_n,
             CAST(p.np AS {big}) * p.sxxp
               - CAST(p.sxp AS {big}) * p.sxp AS varx_n,
             CAST(p.np AS {big}) * p.syyp
               - CAST(p.syp AS {big}) * p.syp AS vary_n
      FROM arms a CROSS JOIN pool p
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS pre_purchases,
           CAST(sy AS BIGINT) AS exp_purchases,
           {_MEAN_Y} AS mean_y,
           {_THETA} AS theta,
           {_ADJ_MEAN_Y} AS adj_mean_y,
           CASE WHEN varx_n = 0 OR vary_n = 0 THEN 0
                ELSE CAST(10000 * cov_n * cov_n
                          // (varx_n * vary_n) AS BIGINT) END AS rho2_bp
    FROM calc
    """


@query("agg_ab_cuped", oracle=_cuped_sql("HUGEINT"))
def agg_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: units are users, the metric
    is the purchase count in the experiment half of the event-time span,
    the covariate is the same user's purchase count in the pre-period
    half, theta is the POOLED OLS slope cov(X,Y)/var(X) (the CUPED
    paper's estimator), and each arm emits its raw mean, the adjusted
    mean, and rho² — the fraction of metric variance the covariate
    removes — as exact integer basis points.

    Scale: one events scan → ONE user-keyed hash agg (two conditional
    sums against a broadcast scalar boundary) → one 2-row arm agg
    carrying the five moment sums (all combiner-friendly integer SUMs)
    → scalar arithmetic on a broadcast single pooled row.  Driver
    traffic: two rows.  The moment-sum shape is the textbook one-pass
    parallel covariance — no second scan, no per-unit float."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    bound = ev.agg(
        F.expr(
            "(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) div 2"
        ).alias("bound")
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
    )
    is_purch = F.col("event_type") == "purchase"
    pre = F.expr("unix_micros(ts)") < F.col("bound")
    units = (
        ev.crossJoin(F.broadcast(bound))
        .groupBy("user_id", arm.alias("arm"))
        .agg(
            F.sum(F.when(pre & is_purch, 1).otherwise(0)).alias("x"),
            F.sum(F.when(~pre & is_purch, 1).otherwise(0)).alias("y"),
        )
    )
    arms = units.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    pool = arms.agg(
        F.sum("n").alias("np"),
        F.sum("sx").alias("sxp"),
        F.sum("sy").alias("syp"),
        F.sum("sxx").alias("sxxp"),
        F.sum("sxy").alias("sxyp"),
        F.sum("syy").alias("syyp"),
    )
    big = "DECIMAL(38,0)"
    calc = arms.crossJoin(F.broadcast(pool)).select(
        "arm",
        "n",
        "sx",
        "sy",
        "np",
        "sxp",
        F.expr(
            f"CAST(np AS {big}) * sxyp - CAST(sxp AS {big}) * syp"
        ).alias("cov_n"),
        F.expr(
            f"CAST(np AS {big}) * sxxp - CAST(sxp AS {big}) * sxp"
        ).alias("varx_n"),
        F.expr(
            f"CAST(np AS {big}) * syyp - CAST(syp AS {big}) * syp"
        ).alias("vary_n"),
    )
    return calc.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("pre_purchases"),
        F.col("sy").cast("long").alias("exp_purchases"),
        F.expr(_MEAN_Y).alias("mean_y"),
        F.expr(_THETA).alias("theta"),
        F.expr(_ADJ_MEAN_Y).alias("adj_mean_y"),
        F.expr(
            "CASE WHEN varx_n = 0 OR vary_n = 0 THEN 0"
            " ELSE CAST(10000 * cov_n * cov_n"
            " div (varx_n * vary_n) AS BIGINT) END"
        ).alias("rho2_bp"),
    )


#: DiD shared float fragments (same integer-columns-in contract).
_DID = (
    "ROUND((CAST(sy AS DOUBLE) / n - CAST(sx AS DOUBLE) / n)"
    " - (CAST(sy0 AS DOUBLE) / n0 - CAST(sx0 AS DOUBLE) / n0), 4) + 0.0"
)


@query(
    "agg_ab_did",
    oracle=f"""
    WITH b AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS bound
      FROM events
    ),
    units AS MATERIALIZED (
      SELECT user_id, {_SQL_ARM} AS arm,
             SUM(CASE WHEN epoch_us(ts) < b.bound
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN epoch_us(ts) >= b.bound
                       AND event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events CROSS JOIN b GROUP BY 1, 2
    ),
    arms AS MATERIALIZED (
      SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy
      FROM units GROUP BY 1
    ),
    ctl AS (
      SELECT n AS n0, sx AS sx0, sy AS sy0 FROM arms WHERE arm = 0
    ),
    joined AS (
      SELECT a.arm, a.n, a.sx, a.sy, c.n0, c.sx0, c.sy0
      FROM arms a CROSS JOIN ctl c
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS pre_purchases,
           CAST(sy AS BIGINT) AS exp_purchases,
           ROUND(CAST(sx AS DOUBLE) / n, 4) + 0.0 AS mean_pre,
           ROUND(CAST(sy AS DOUBLE) / n, 4) + 0.0 AS mean_exp,
           {_DID} AS did
    FROM joined
    """,
)
def agg_ab_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout over the same derived pre/post
    split and md5 arms as ``agg_ab_cuped``: each arm's pre-to-post
    change in purchases-per-user, minus the CONTROL arm's change — the
    estimator that cancels any fixed per-arm level offset (the control
    row's ``did`` is 0 by construction, the treatment row's is the
    effect estimate).

    Scale: the CUPED plan minus the second-moment sums — one user-keyed
    agg, one 2-row arm agg, a broadcast join against the control row.
    All counts integer; the three emitted means/did are shared-text
    ROUND(4)+0.0 floats over integer sums."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    bound = ev.agg(
        F.expr(
            "(MIN(unix_micros(ts)) + MAX(unix_micros(ts))) div 2"
        ).alias("bound")
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
    )
    is_purch = F.col("event_type") == "purchase"
    pre = F.expr("unix_micros(ts)") < F.col("bound")
    units = (
        ev.crossJoin(F.broadcast(bound))
        .groupBy("user_id", arm.alias("arm"))
        .agg(
            F.sum(F.when(pre & is_purch, 1).otherwise(0)).alias("x"),
            F.sum(F.when(~pre & is_purch, 1).otherwise(0)).alias("y"),
        )
    )
    arms = units.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    ctl = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"),
        F.col("sx").alias("sx0"),
        F.col("sy").alias("sy0"),
    )
    return arms.crossJoin(F.broadcast(ctl)).select(
        F.col("arm").cast("long").alias("arm"),
        F.col("n").cast("long").alias("n_users"),
        F.col("sx").cast("long").alias("pre_purchases"),
        F.col("sy").cast("long").alias("exp_purchases"),
        F.expr("ROUND(CAST(sx AS DOUBLE) / n, 4) + 0.0").alias("mean_pre"),
        F.expr("ROUND(CAST(sy AS DOUBLE) / n, 4) + 0.0").alias("mean_exp"),
        F.expr(_DID).alias("did"),
    )


#: SRM z score over exact int64 arm counts (unrounded shared tree;
#: delta can be negative, so + 0.0 pins the signed zero).
_SRM_Z = (
    "CASE WHEN n_users = 0 THEN 0.0 ELSE"
    " ((CAST(arm0 AS DOUBLE) - arm1) / SQRT(CAST(n_users AS DOUBLE)))"
    " + 0.0 END"
)


@query(
    "agg_srm_check",
    oracle=f"""
    WITH units AS MATERIALIZED (
      SELECT DISTINCT user_id, {_SQL_ARM} AS arm FROM events
    ),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS arm0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS arm1
      FROM units
    )
    SELECT n_users, arm0, arm1,
           CASE WHEN n_users = 0 THEN 0 ELSE
             CAST((CAST(arm0 AS HUGEINT) - arm1)
                  * (CAST(arm0 AS HUGEINT) - arm1)
                  * 1000000 // n_users AS BIGINT) END AS chi2_e6,
           {_SRM_Z} AS z_score
    FROM counts
    """,
)
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for the md5 arm split (the first
    gate every experimentation platform runs before reading a test):
    chi-square goodness-of-fit against the designed 50/50 allocation —
    for two arms that is exactly ``(arm0 - arm1)^2 / n`` — in exact
    integer millionths, plus the signed z score.  A healthy hash split
    keeps chi2 small; a large value means the bucketing is biased and
    every downstream readout is suspect.

    Scale: one distinct-user agg (the same shuffle class as
    ``agg_ab_test``) then scalar arithmetic on one row."""
    big = "DECIMAL(38,0)"
    ev = read_table(spark, sf_dir, "events").select("user_id")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
    )
    units = ev.select("user_id", arm.alias("arm")).distinct()
    counts = units.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("arm0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("arm1"),
    )
    return counts.select(
        "n_users",
        "arm0",
        "arm1",
        F.expr(
            f"CASE WHEN n_users = 0 THEN 0 ELSE"
            f" CAST((CAST(arm0 AS {big}) - arm1)"
            f" * (CAST(arm0 AS {big}) - arm1)"
            f" * 1000000 div n_users AS BIGINT) END"
        ).alias("chi2_e6"),
        F.expr(_SRM_Z).alias("z_score"),
    )
