"""Marketing-style event attribution over the events stream.

Last-touch attribution: each purchase is credited to the user's most
recent click within a 7-day lookback. The join is the PIT shape
(``join_pit_scd2``'s rule applied stream-to-stream): an EQUI join on
user_id carrying the time-window predicate as a residual filter — never
a pure range join, so at 100 TB it is one hash exchange per side on
user_id, and the per-purchase argmax is a window over each purchase's
candidate clicks (bounded by the lookback), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

LOOKBACK_DAYS = 7


@query(
    "join_attribution_last_touch",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
             c.event_id AS click_id, c.ts AS click_ts
      FROM p LEFT JOIN c
        ON p.user_id = c.user_id
       AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL {LOOKBACK_DAYS} DAY
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY purchase_id
               ORDER BY click_ts DESC NULLS LAST, click_id DESC NULLS LAST
             ) AS rn
      FROM j
    )
    SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
           click_id IS NOT NULL AS attributed
    FROM r WHERE rn = 1
    """,
)
def join_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit each purchase to the user's latest click within the
    ``LOOKBACK_DAYS`` window (ties on ts break to the higher click_id);
    unattributed purchases survive with NULL click columns.

    Scale: hash equi-join on user_id with the lookback as a residual
    predicate; the argmax is a per-purchase row_number window whose
    partitions are lookback-bounded candidate sets. First-touch
    attribution is the same plan with the window order ascending.
    """
    ev = read_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.user_id)
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {LOOKBACK_DAYS} DAYS")
        ),
        "left",
    ).select(
        "purchase_id", p.user_id.alias("user_id"), "purchase_ts",
        "click_id", "click_ts",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc_nulls_last(), F.col("click_id").desc_nulls_last()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            F.col("click_id").isNotNull().alias("attributed"),
        )
    )


FUNNEL_WINDOW_HOURS = 24


@query(
    "agg_window_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_v FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_c
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_v
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_p
      FROM events e JOIN v USING (user_id) JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_c
        AND e.ts <= v.t_v + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_in_window
    """,
)
def agg_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained, time-bounded conversion funnel (the windowFunnel shape):
    first view -> first click AFTER that view -> first purchase after
    that click AND within ``FUNNEL_WINDOW_HOURS`` of the view.

    Stronger than ``agg_funnel`` (which orders GLOBAL first occurrences):
    each stage's timestamp is conditioned on the previous stage's, so a
    click that predates the user's first view never counts, and the
    whole chain must fit the window. Semantics: earliest-chain greedy
    (the first qualifying event per stage).

    Scale: three conditional-min aggregations over the same user_id
    partitioning with user-count-sized join-backs between them — no
    self-join of raw events against raw events, no per-user sorting;
    the stage frames shrink monotonically.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t_c"))
            & (
                F.col("ts")
                <= F.col("t_v")
                + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(
            F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        )
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase_in_window")))
        )
    )
    return counts


# --- round 14: exact Shapley-value channel attribution --------------------

#: Touch channels (bit positions in the exposure mask); conversion is a
#: ``purchase`` event.  The 3-channel subset lattice has 8 cells, so
#: the Shapley sum unrolls exactly with 3! = 6 cleared from every
#: weight denominator.
_SHAPLEY_CHANNELS = (("view", 1), ("click", 2), ("signup", 4))


def _v_sql(s: int) -> str:
    """v(S) = conversions from users whose exposure mask is a subset of
    S (the cumulative value function of Dalessandro et al. 2012 /
    Zhao et al. 2018 Shapley attribution)."""
    return (
        f"(SELECT COALESCE(SUM(c), 0) FROM conv WHERE (m & {7 - s}) = 0)"
    )


def _phi_sql(bit: int, others: tuple[int, int]) -> str:
    """6 * Shapley value of the channel at ``bit``: the unrolled
    marginal-contribution sum over the other two channels' subsets,
    weights |S|!(2-|S|)! = 2,1,1,2."""
    x, y = others
    return (
        f"2 * ({_v_sql(bit)} - {_v_sql(0)})"
        f" + ({_v_sql(bit | x)} - {_v_sql(x)})"
        f" + ({_v_sql(bit | y)} - {_v_sql(y)})"
        f" + 2 * ({_v_sql(7)} - {_v_sql(x | y)})"
    )


@query(
    "agg_shapley_attribution",
    oracle=f"""
    WITH firstp AS (
      SELECT user_id, MIN(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    mask AS (
      SELECT f.user_id,
             {" + ".join(
                 f"{bit} * MAX(CASE WHEN e.event_type = '{ch}' "
                 f"AND e.ts < f.pts THEN 1 ELSE 0 END)"
                 for ch, bit in _SHAPLEY_CHANNELS
             )} AS m
      FROM firstp f LEFT JOIN events e ON e.user_id = f.user_id
      GROUP BY 1
    ),
    conv AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM mask GROUP BY 1)
    SELECT channel, CAST(phi_x6 AS BIGINT) AS phi_x6 FROM (
      SELECT 'view' AS channel, {_phi_sql(1, (2, 4))} AS phi_x6
      UNION ALL
      SELECT 'click' AS channel, {_phi_sql(2, (1, 4))} AS phi_x6
      UNION ALL
      SELECT 'signup' AS channel, {_phi_sql(4, (1, 2))} AS phi_x6
    )
    """,
)
def agg_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution (Shapley 1953 via the
    Dalessandro 2012 / Zhao 2018 cumulative value function): each
    converting user's exposure mask is the set of touch channels
    (view/click/signup) seen strictly BEFORE their first purchase;
    ``v(S)`` counts conversions from users whose mask is a subset of
    ``S``; each channel's Shapley value is the factorial-weighted
    marginal-contribution sum over the 3-channel subset lattice —
    emitted times 6 (= 3!) so every weight is the integer
    ``|S|!(2-|S|)!`` in {2, 1, 1, 2} and no division exists at all.
    Efficiency holds exactly: ``sum(phi_x6) = 6 * (v(full) -
    v(empty))`` (pinned by a pytest identity).

    Scale: the corpus-scale work is ONE events scan -> per-converter
    exposure mask -> an 8-row mask histogram; the Shapley algebra runs
    on those 8 integers (driver-side here, a broadcast relation at any
    size — the lattice is 2^|channels|, not data-sized).  Last-touch
    and position attribution (above) mis-credit assists; Shapley is
    the game-theoretically fair split."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    firstp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    mask_col = None
    for ch, bit in _SHAPLEY_CHANNELS:
        term = bit * F.max(
            F.when(
                (F.col("event_type") == ch) & (F.col("ts") < F.col("pts")),
                1,
            ).otherwise(0)
        )
        mask_col = term if mask_col is None else mask_col + term
    masks = (
        firstp.join(ev, "user_id", "left")
        .groupBy("user_id", "pts")
        .agg(mask_col.alias("m"))
    )
    conv = {
        int(r["m"]): int(r["c"])
        for r in masks.groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }

    def v(s: int) -> int:
        return sum(c for m, c in conv.items() if (m & (7 - s)) == 0)

    def phi6(bit: int, x: int, y: int) -> int:
        return (
            2 * (v(bit) - v(0))
            + (v(bit | x) - v(x))
            + (v(bit | y) - v(y))
            + 2 * (v(7) - v(x | y))
        )

    rows = [
        ("view", phi6(1, 2, 4)),
        ("click", phi6(2, 1, 4)),
        ("signup", phi6(4, 1, 2)),
    ]
    return spark.createDataFrame(rows, "channel string, phi_x6 long")
