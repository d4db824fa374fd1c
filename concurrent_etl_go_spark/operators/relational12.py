"""Relational pack 12 (round 9): funnel latency distribution,
position-based multi-touch attribution, categorical-column entropy
profile, and an all-integer weighted moving average.

Each is a classic analytics template the surface lacked, with the §7.6
exactness discipline: integer counts/credits/averages wherever algebra
allows; the one float family (entropy's ``ln``) is a single shared
expression over integer counts with ROUND(4)+0.0 emission.

Reference parity: the reference engine (etl/main.go) has no analytics
surface; these extend SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: Funnel latency bands (minutes, upper-exclusive); the last band is
#: open-ended.  Shared between both dialects via the CASE text below.
_LAT_BANDS = ((5, "lt_5m"), (60, "lt_1h"), (360, "lt_6h"), (1440, "lt_1d"))
_LAT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN delay_min < {m} THEN '{lbl}'" for m, lbl in _LAT_BANDS
    )
    + " ELSE 'ge_1d' END"
)
_LAT_ORDER = (
    "CASE "
    + " ".join(
        f"WHEN delay_min < {m} THEN {i}"
        for i, (m, _) in enumerate(_LAT_BANDS)
    )
    + f" ELSE {len(_LAT_BANDS)} END"
)


@query(
    "agg_funnel_latency",
    oracle=f"""
    WITH fv AS MATERIALIZED (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS MATERIALIZED (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fv.v_ts
      GROUP BY 1
    ),
    delays AS MATERIALIZED (
      SELECT fv.user_id,
             (epoch_us(fp.p_ts) - epoch_us(fv.v_ts)) // 60000000
               AS delay_min
      FROM fv JOIN fp ON fp.user_id = fv.user_id
    ),
    n AS (SELECT COUNT(*) AS n_conv FROM delays)
    SELECT {_LAT_CASE} AS band,
           CAST({_LAT_ORDER} AS BIGINT) AS band_order,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) * 10000 // n.n_conv AS BIGINT) AS share_bp
    FROM delays CROSS JOIN n
    GROUP BY 1, 2, n.n_conv
    """,
)
def agg_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: minutes between each user's FIRST
    view and their first purchase AFTER it, banded — the latency
    histogram behind "how long does the funnel take", where
    ``agg_funnel`` counts only who converts.  Delay is integer minutes
    (microsecond epoch difference floor-divided), bands and shares are
    integers, so the driver hash needs no float discipline.

    Scale: two user-keyed hash aggs (first view, first qualifying
    purchase) + one broadcast scalar count; the histogram is a
    five-row fold."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    delays = fv.join(fp, "user_id").select(
        "user_id",
        F.expr(
            "(unix_micros(p_ts) - unix_micros(v_ts)) div 60000000"
        ).alias("delay_min"),
    )
    n = delays.agg(F.count(F.lit(1)).alias("n_conv"))
    return (
        delays.crossJoin(F.broadcast(n))
        .groupBy(
            F.expr(_LAT_CASE).alias("band"),
            F.expr(_LAT_ORDER).cast("long").alias("band_order"),
            "n_conv",
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "band",
            "band_order",
            F.col("n_users").cast("long").alias("n_users"),
            F.expr("n_users * 10000 div n_conv").alias("share_bp"),
        )
    )


_ATTR_LOOKBACK_DAYS = 7


@query(
    "join_attribution_position",
    oracle=f"""
    WITH conv AS MATERIALIZED (
      SELECT event_id AS conv_id, user_id, ts AS c_ts FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS MATERIALIZED (
      SELECT t.event_id AS touch_id, t.event_type, c.conv_id,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.ts, t.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY c.conv_id) AS n
      FROM events t
      JOIN conv c ON c.user_id = t.user_id
                 AND t.ts < c.c_ts
                 AND t.ts >= c.c_ts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY
      WHERE t.event_type IN ('view', 'click')
    ),
    credited AS MATERIALIZED (
      SELECT event_type,
             CASE WHEN n = 1 THEN 10000
                  WHEN n = 2 THEN 5000
                  WHEN pos = 1 OR pos = n THEN 4000
                  ELSE 2000 // (n - 2) END AS credit_bp
      FROM touch
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit_bp) AS BIGINT) AS credit_bp
    FROM credited GROUP BY 1
    """,
)
def join_attribution_position(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every
    purchase distributes 10000 basis points of credit over the user's
    view/click touches in the prior ``_ATTR_LOOKBACK_DAYS`` days —
    40% to the first touch, 40% to the last, the middle 20% split
    evenly (integer floor per middle touch; the sub-basis-point
    remainder is deliberately dropped, identically in both engines) —
    the standard U-shaped model beside ``join_attribution_last_touch``'s
    winner-takes-all.  Credit per channel summed as integers.

    Scale: one time-banded equi-join keyed by user (the last-touch
    query's shape), a per-conversion window over that conversion's
    touches only, then a channel-keyed hash agg."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type"),
        F.col("ts").alias("t_ts"),
    )
    joined = touches.join(conv, "user_id").where(
        (F.col("t_ts") < F.col("c_ts"))
        & (
            F.col("t_ts")
            >= F.col("c_ts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAY")
        )
    )
    w = Window.partitionBy("conv_id").orderBy("t_ts", "touch_id")
    wn = Window.partitionBy("conv_id")
    credited = (
        joined.withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .select(
            "event_type",
            F.when(F.col("n") == 1, F.lit(10000))
            .when(F.col("n") == 2, F.lit(5000))
            .when(
                (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
                F.lit(4000),
            )
            .otherwise(F.expr("2000 div (n - 2)"))
            .alias("credit_bp"),
        )
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("credit_bp").cast("long").alias("credit_bp"),
    )


#: (report label, table, column) triples profiled by the entropy query.
_ENTROPY_COLS = (
    ("orders.o_orderpriority", "orders", "o_orderpriority"),
    ("orders.o_orderstatus", "orders", "o_orderstatus"),
    ("customer.c_mktsegment", "customer", "c_mktsegment"),
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("events.event_type", "events", "event_type"),
)

#: Shannon entropy in nats from integer category counts —
#: H = ln(n) - sum(c*ln(c))/n, ONE shared expression text (the
#: ``text_tfidf`` pinned-``ln`` convention, applied to aggregated
#: columns n_rows and s); the category fold is <= a few dozen terms, so
#: summation-order jitter sits ~10 orders below the ROUND(4) grain.
_ENTROPY_EXPR = "ROUND(ln(1.0 * n_rows) - s / n_rows, 4) + 0.0"


@query(
    "profile_column_entropy",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT column_name, n_distinct, n_rows, {_ENTROPY_EXPR} AS entropy
    FROM (
      SELECT '{label}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             SUM(c * ln(1.0 * c)) AS s
      FROM (SELECT {col} AS v, COUNT(*) AS c FROM {tbl} GROUP BY 1)
    )
    """
        for label, tbl, col in _ENTROPY_COLS
    ),
)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the schema's categorical columns — the
    profiling signal behind "is this column informative / skewed /
    constant" (0 = constant column; ln(k) = perfectly uniform over k
    values).  Computed from integer category counts as
    ``ln(n) − Σ c·ln(c) / n`` — one shared expression; the per-column
    fold runs over the CATEGORY dictionary (≤ dozens of rows), so
    summation order cannot reach the ROUND(4) grain.

    Scale: one hash agg per column (dictionary-sized output), a scalar
    fold each, and a 5-row union — the ``profile_constraint_check``
    report shape."""
    out = None
    for label, tbl, col in _ENTROPY_COLS:
        counts = (
            read_table(spark, sf_dir, tbl)
            .groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row = counts.agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum("c").cast("long").alias("n_rows"),
            F.sum(F.expr("c * ln(1.0 * c)")).alias("s"),
        ).select(
            F.lit(label).alias("column_name"),
            "n_distinct",
            "n_rows",
            F.expr(_ENTROPY_EXPR).alias("entropy"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_WMA_DAYS = 7  # window width: today + the 6 prior days


@query(
    "window_wma",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT a.day, a.cents,
           CAST(SUM(({_WMA_DAYS} - o.o) * b.cents)
                // SUM({_WMA_DAYS} - o.o) AS BIGINT) AS wma_cents
    FROM daily a
    CROSS JOIN (SELECT unnest(range(0, {_WMA_DAYS})) AS o) o
    JOIN daily b ON b.day = a.day - o.o * INTERVAL 1 DAY
    GROUP BY a.day, a.cents
    """,
)
def window_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average of daily order revenue: over
    each day's trailing 7-day window, weight w = 7 for today
    down to 1 for six days back, ``WMA = Σ w·cents div Σ w`` — ALL
    INTEGER (exact cents in, integer weights, one floor division), so
    unlike float WMAs there is no summation-order discipline at all.
    The trend-responsive smoother between the flat ``agg_ewma`` and the
    trend-extrapolating ``agg_holt_forecast``.

    Scale: grain-first — facts collapse to |days| rows in one hash agg;
    the weighted window then EXPLODES each day into its 7 offset rows
    and equi-joins back on the shifted date (a RANGE frame cannot
    carry position-dependent weights, and the offset form keeps the
    join a hash join where a band self-join would nested-loop) —
    linear in the series either way, but hash-join-shaped at any
    width."""
    daily = scoped_persist(
        read_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    offsets = daily.select(
        "day",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_WMA_DAYS - 1))).alias("o"),
    ).withColumn(
        "b_day", F.expr("day - make_dt_interval(o)")
    )
    b = daily.select(
        F.col("day").alias("b_day"), F.col("cents").alias("b_cents")
    )
    w = F.lit(_WMA_DAYS) - F.col("o")
    return (
        offsets.join(b, "b_day")
        .groupBy("day", "cents")
        .agg(
            F.sum(w * F.col("b_cents")).alias("num"),
            F.sum(w).alias("den"),
        )
        .select(
            "day",
            "cents",
            F.expr("num div den").cast("long").alias("wma_cents"),
        )
    )


_STOCK_PARTS = 10  # anchor parts simulated (highest-volume first)


@query(
    "window_stock_clamp",
    oracle=f"""
    WITH flows AS MATERIALIZED (
      SELECT l_partkey AS pk, date_trunc('day', l_shipdate) AS day,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT)
                           ELSE -CAST(l_quantity AS BIGINT) END)
                  AS BIGINT) AS delta
      FROM lineitem GROUP BY 1, 2
    ),
    anchors AS MATERIALIZED (
      SELECT pk FROM flows
      GROUP BY 1
      ORDER BY SUM(CASE WHEN delta >= 0 THEN delta ELSE -delta END)
               DESC, pk
      LIMIT {_STOCK_PARTS}
    ),
    series AS (
      SELECT f.pk,
             list(f.delta ORDER BY f.day) AS deltas,
             CAST(SUM(CASE WHEN f.delta > 0 THEN f.delta ELSE 0 END)
                  AS BIGINT) AS total_in,
             CAST(SUM(CASE WHEN f.delta < 0 THEN -f.delta ELSE 0 END)
                  AS BIGINT) AS total_out,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM flows f JOIN anchors an ON an.pk = f.pk
      GROUP BY 1
    )
    SELECT pk, n_days, total_in, total_out,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT), deltas),
             (acc, x) -> GREATEST(CAST(0 AS BIGINT), acc + x)
           ) AS BIGINT) AS on_hand
    FROM series
    """,
)
def window_stock_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-clamped running inventory: per high-volume part, fold the
    daily net flow (returns restock +qty, shipments draw -qty) through
    ``on_hand = max(0, on_hand + delta)`` — the stock-simulation
    recurrence a window running-sum CANNOT express (the clamp makes it
    non-linear: once the balance floors at zero, history before the
    floor stops mattering).  The ``agg_ewma`` ordered-array fold idiom
    with an INTEGER accumulator and an explicit zero seed (prepended,
    so DuckDB's seed-with-first-element ``list_reduce`` runs the
    identical fold); whole-unit quantities keep every step exact.

    Scale: grain-first — facts collapse to (part, day) in one hash
    agg; folds run over per-part day-count arrays; anchors are a
    derived top-N.  For unbounded series, chunk by month and carry the
    clamped balance as the next chunk's seed (the clamp recurrence
    composes left-to-right exactly like EWMA)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_returnflag"
    )
    delta = F.when(
        F.col("l_returnflag") == "R",
        F.col("l_quantity").cast("long"),
    ).otherwise(-F.col("l_quantity").cast("long"))
    flows = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("day", "l_shipdate").alias("day"),
    ).agg(F.sum(delta).cast("long").alias("delta"))
    flows = scoped_persist(flows)
    anchors = (
        flows.groupBy("pk")
        .agg(F.sum(F.abs(F.col("delta"))).alias("vol"))
        .orderBy(F.desc("vol"), "pk")
        .limit(_STOCK_PARTS)
        .select("pk")
    )
    series = (
        flows.join(F.broadcast(anchors), "pk")
        .groupBy("pk")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "delta"))),
                lambda s: s["delta"],
            ).alias("deltas"),
            F.sum(
                F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)
            ).cast("long").alias("total_in"),
            F.sum(
                F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0)
            ).cast("long").alias("total_out"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )
    on_hand = F.aggregate(
        F.col("deltas"),
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(F.lit(0).cast("long"), acc + x),
    )
    return series.select(
        "pk", "n_days", "total_in", "total_out",
        on_hand.cast("long").alias("on_hand"),
    )


_DUP_BAND_CENTS = 50000  # $500 price bands
_DUP_WINDOW_DAYS = 180


@query(
    "profile_dup_transactions",
    oracle=f"""
    WITH o AS MATERIALIZED (
      SELECT o_custkey AS custkey, o_orderkey AS okey, o_orderdate AS d,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
               // {_DUP_BAND_CENTS} AS band
      FROM orders
    )
    SELECT a.custkey, a.okey AS okey_a, b.okey AS okey_b,
           CAST(a.band AS BIGINT) AS band,
           CAST(abs(date_diff('day', a.d, b.d)) AS BIGINT) AS gap_days
    FROM o a
    JOIN o b ON b.custkey = a.custkey AND b.band = a.band
            AND b.okey > a.okey
    WHERE abs(date_diff('day', a.d, b.d)) <= {_DUP_WINDOW_DAYS}
    """,
)
def profile_dup_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suspected duplicate-transaction pairs: same customer, same $500
    price band, within ``_DUP_WINDOW_DAYS`` days — the double-charge DQ
    probe every billing pipeline runs (exact-key duplicate checks miss
    re-keyed resubmissions; banding + a time window is the standard
    blocking recipe).  Pure integers: exact cents floor-divided into
    bands, day gaps, oriented (okey_a < okey_b) so each pair emits
    once.

    Scale: one equi-join on the (customer, band) BLOCK key — the
    ``join_fuzzy_names`` blocking argument: candidate fan-out is
    bounded by per-block sizes (a customer's orders in one price
    band), never all-pairs; the window predicate prunes inside the
    block."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("d"),
        F.expr(
            f"CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
            f" div {_DUP_BAND_CENTS}"
        ).alias("band"),
    )
    a = o.alias("a")
    b = o.select(
        F.col("custkey"),
        F.col("okey").alias("okey_b"),
        F.col("d").alias("d_b"),
        F.col("band"),
    ).alias("b")
    return (
        a.join(b, ["custkey", "band"])
        .where(F.col("okey_b") > F.col("okey"))
        .where(
            F.abs(F.datediff("d", "d_b")) <= _DUP_WINDOW_DAYS
        )
        .select(
            "custkey",
            F.col("okey").alias("okey_a"),
            "okey_b",
            F.col("band").cast("long").alias("band"),
            F.abs(F.datediff("d", "d_b")).cast("long").alias("gap_days"),
        )
    )


#: Landing-page bucket width for the per-source funnel split: the JSON
#: props key k (0-99) floor-divided into 4 source buckets.
_SRC_BUCKET = 25


@query(
    "agg_funnel_source_split",
    oracle=f"""
    WITH first_e AS MATERIALIZED (
      SELECT user_id, src FROM (
        SELECT user_id,
               COALESCE(TRY_CAST(json_extract_string(props, '$.k')
                                 AS BIGINT) // {_SRC_BUCKET}, -1) AS src,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    fv AS MATERIALIZED (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS MATERIALIZED (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fv.v_ts
      GROUP BY 1
    ),
    delays AS MATERIALIZED (
      SELECT s.src, fv.user_id,
             (epoch_us(fp.p_ts) - epoch_us(fv.v_ts)) // 60000000
               AS delay_min
      FROM fv
      JOIN fp ON fp.user_id = fv.user_id
      JOIN first_e s ON s.user_id = fv.user_id
    ),
    nsrc AS MATERIALIZED (
      SELECT src, COUNT(*) AS n_conv FROM delays GROUP BY 1
    )
    SELECT d.src, {_LAT_CASE} AS band,
           CAST({_LAT_ORDER} AS BIGINT) AS band_order,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) * 10000 // n.n_conv AS BIGINT) AS share_bp
    FROM delays d JOIN nsrc n ON n.src = d.src
    GROUP BY 1, 2, 3, n.n_conv
    """,
)
def agg_funnel_source_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``agg_funnel_latency`` histogram split by FIRST-TOUCH source
    (VERDICT r9 item 8): each user's source is the landing-page bucket
    of their very first event — the JSON ``props.k`` attribute
    floor-divided into ``100 / _SRC_BUCKET`` buckets (missing/malformed
    k → -1), selected by the deterministic (ts, event_id) first-row
    rule.  Shares are basis points WITHIN each source — "does funnel
    latency differ by where the user landed", the split every
    first-touch attribution readout wants next.

    All integers (minute delays, counts, floor-divided shares) — no
    float discipline needed.  Scale: reuses the two user-keyed funnel
    aggs plus ONE user-keyed window for the first event (same shuffle
    key, so AQE coalesces the exchanges); the per-source totals are a
    4-row broadcast."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "props"
    )
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_e = (
        ev.select(
            "user_id",
            F.expr(
                "COALESCE(TRY_CAST(get_json_object(props, '$.k')"
                f" AS BIGINT) div {_SRC_BUCKET}, -1)"
            ).alias("src"),
            F.row_number().over(w_first).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "src")
    )
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    delays = (
        fv.join(fp, "user_id")
        .join(first_e, "user_id")
        .select(
            "src",
            "user_id",
            F.expr(
                "(unix_micros(p_ts) - unix_micros(v_ts)) div 60000000"
            ).alias("delay_min"),
        )
    )
    nsrc = delays.groupBy("src").agg(F.count(F.lit(1)).alias("n_conv"))
    return (
        delays.join(F.broadcast(nsrc), "src")
        .groupBy(
            "src",
            F.expr(_LAT_CASE).alias("band"),
            F.expr(_LAT_ORDER).cast("long").alias("band_order"),
            "n_conv",
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "src",
            "band",
            "band_order",
            F.col("n_users").cast("long").alias("n_users"),
            F.expr("n_users * 10000 div n_conv").alias("share_bp"),
        )
    )
