"""Seventh coverage batch: behavioral analytics over ``events`` —
retention cohorts (the canonical product-analytics rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table


@query(
    "agg_retention_cohort",
    oracle="""
    WITH c AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id)
    SELECT CAST(date_trunc('week', c.first_ts) AS TIMESTAMP) AS cohort_week,
           CAST(datediff('day', date_trunc('week', c.first_ts),
                         date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by their first-activity week
    (Monday-truncated — identical semantics in Spark and DuckDB), counted
    per week offset they were active again.

    Single scan, two shuffles at any scale: first-activity comes from a
    MIN window over the user partition (no self-join — a groupBy+join
    cohort doubles the events scan and was measured at 8 exchanges vs 2),
    then one (cohort_week, offset) count-distinct aggregation.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    joined = ev.withColumn(
        "first_ts", F.min("ts").over(Window.partitionBy("user_id"))
    )
    cohort_week = F.date_trunc("week", F.col("first_ts"))
    event_week = F.date_trunc("week", F.col("ts"))
    return (
        joined.select(
            "user_id",
            # emit as timestamp (not date): Monday-midnight weeks compare
            # identically and timestamps normalize cleanly in the
            # value-hash (DateType round-trips as python date objects)
            cohort_week.alias("cohort_week"),
            F.floor(F.datediff(event_week, cohort_week) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "agg_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purch
        FROM events GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_click,
           COUNT(CASE WHEN t_purch > t_click AND t_click > t_view
                      THEN 1 END) AS n_purchase
    FROM s
    """,
)
def agg_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts
    at each step only if the step's FIRST occurrence strictly follows the
    previous step's first occurrence.

    One shuffle (per-user conditional-min pivot, map-side combined) plus a
    scalar global aggregate — the standard scalable funnel shape; no
    self-joins, no per-user event sorting.
    """
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    s = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purch"),
    )
    return s.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_click"),
        F.count(
            F.when(
                (F.col("t_purch") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_purchase"),
    )


@query(
    "agg_user_lifetime",
    oracle="""
    SELECT user_id,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
               AS n_active_days,
           COUNT(*) AS n_events,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value
                          ELSE 0 END), 4) AS purchase_value
    FROM events GROUP BY 1
    """,
)
def agg_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime summary — first/last activity, distinct active
    days, event count, cumulative purchase value. The profile table every
    product-analytics and LTV pipeline starts from.

    Scale: one hash aggregation keyed by user_id; the distinct-day count
    is per-group bounded (days, not events). At extreme user counts this
    is the canonical salting candidate — see ``agg_salted_skew`` — and
    the distinct-day term swaps to an HLL sketch if days-per-user grows.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count_distinct(F.date_trunc("day", "ts")).alias("n_active_days"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            4,
        ).alias("purchase_value"),
    )


@query(
    "agg_stickiness",
    oracle="""
    WITH d AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM d GROUP BY 1),
    wau AS (
      SELECT g.day, COUNT(DISTINCT d.user_id) AS wau
      FROM (SELECT DISTINCT day FROM d) g
      JOIN d ON d.day BETWEEN g.day - INTERVAL 6 DAY AND g.day
      GROUP BY 1
    )
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(dau.dau / wau.wau, 4) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
)
def agg_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — daily actives over trailing-7-day
    actives, the engagement ratio product teams track.

    Scale: both terms reuse the grain-first discipline of
    ``agg_trailing_distinct`` — raw events collapse once to (day, user),
    the trailing-window count expands only that tiny relation by at most
    7x, and the final join aligns two day-keyed aggregates. The sketch
    path (``agg_trailing_distinct_hll``) substitutes directly when user
    cardinality outgrows exact counting.
    """
    ev = read_table(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    dau = d.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    grid = d.select("day").distinct().withColumnRenamed("day", "g_day")
    cond = (F.col("day") <= F.col("g_day")) & (
        F.col("day") >= F.col("g_day") - F.expr("INTERVAL 6 DAYS")
    )
    wau = (
        grid.join(d, cond)
        .groupBy(F.col("g_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
    )


@query(
    "window_power_users",
    scale_class="oracle_twin",  # production: window_power_users_scalable
    oracle="""
    WITH u AS (
      SELECT user_id, COUNT(*) AS n_events,
             ROUND(SUM(value), 4) + 0.0 AS total_value
      FROM events GROUP BY 1
    )
    SELECT user_id, n_events, total_value
    FROM (
      SELECT *, ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile
      FROM u
    ) WHERE decile = 1
    """,
)
def window_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-decile users by activity (deterministic ntile with user_id
    tie-break) with their totals — the power-user segment cut.

    ORACLE TWIN: the ntile runs over the per-user AGGREGATE (users, not
    events) — but a global ORDER BY is still a single-partition sort at
    extreme user counts. The production path is
    ``window_power_users_scalable`` (operators/quantiles.py): histogram
    threshold + bounded tie top-k, same exact answer and oracle.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("total_value"),
    )
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id"))
    return (
        u.withColumn("decile", F.ntile(10).over(w))
        .where(F.col("decile") == 1)
        .drop("decile")
    )
