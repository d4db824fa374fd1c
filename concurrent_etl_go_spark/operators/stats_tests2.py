"""Classical hypothesis tests, part 2: Welch's t, Kendall's tau-b,
Kruskal-Wallis H, Cohen's kappa, and Jarque-Bera — extending
``operators/stats_tests.py``'s pack (all public literature: Welch
1947, Kendall 1938, Kruskal & Wallis 1952, Cohen 1960, Jarque & Bera
1980) with the same engine contribution: each test is ONE bounded-key
hash aggregation plus scalar arithmetic on the tiny aggregate — never
a global sort or per-row rank window.

Cross-engine exactness (the stats_tests.py / round-10 float rules):

- every stochastic quantity starts as an exact integer (counts, money
  cents, quantity cells, 2x-rank values);
- 128-bit cancellations (n*SS - S^2, C - D, n(a+d) - E) happen in
  DECIMAL(38,0)/HUGEINT and downscale by a FIXED power of ten into
  int64 before any double conversion (128 -> double casts differ by an
  ulp across engines; int64 -> double is hardware IEEE on both), with
  the scale either cancelling in a ratio or multiplied back exactly;
- signed quantities re-sign around an ABS() before floor division so
  DuckDB's floor `//` and Spark's truncating `div` agree;
- Jarque-Bera avoids the 128-bit path entirely: the quantity domain is
  bounded (1..50), so values shift by the integer FLOOR mean and raw
  power sums S1'..S4' stay int64 out to ~1e12 rows; skew/kurtosis/JB
  are one shared unrounded double tree over those exact integers.

Scale: the only fact-sized step in every query is the first hash agg
onto a bounded key (50 quantities, 550 quantity x discount cells, 2-5
groups, a 2x2 confusion matrix).  Reference parity: no stats surface
exists in the reference (etl/main.go); extends SURVEY.md §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_O_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
_L_CENTS = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"


# --------------------------------------------------------------------------
# Welch's unequal-variance t: order value, urgent vs low priority
# --------------------------------------------------------------------------

#: Downscale for the n*SS - S^2 variance cancellation (~2e23 at sf0.1
#: money-cents magnitudes; int64 after /1e9, envelope n ~ 6e11 rows).
_W_K = "1000000000"

#: Shared double tree over exact int64 inputs (s1, s2 sums; v1_s, v2_s
#: downscaled variance numerators).
_WELCH_VARS = (
    "CAST(v1_s AS DOUBLE) * {k}.0 / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1.0))"
    " AS var1_n, "
    "CAST(v2_s AS DOUBLE) * {k}.0 / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1.0))"
    " AS var2_n"
)
_WELCH_T = (
    "CASE WHEN var1_n + var2_n <= 0.0 THEN 0.0"
    " ELSE (mean_diff / SQRT(var1_n + var2_n)) + 0.0 END"
)
_WELCH_DF = (
    "CASE WHEN var1_n + var2_n <= 0.0 THEN 0.0"
    " ELSE ((var1_n + var2_n) * (var1_n + var2_n)"
    " / (var1_n * var1_n / (n1 - 1.0)"
    "    + var2_n * var2_n / (n2 - 1.0))) + 0.0 END"
)


def _welch_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH g AS MATERIALIZED (
      SELECT o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({_O_CENTS}) AS BIGINT) AS s,
             SUM(CAST({_O_CENTS} AS {big}) * {_O_CENTS}) AS ss
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY 1
    ),
    w AS (
      SELECT MAX(CASE WHEN p = '1-URGENT' THEN n END) AS n1,
             MAX(CASE WHEN p = '1-URGENT' THEN s END) AS s1,
             MAX(CASE WHEN p = '5-LOW' THEN n END) AS n2,
             MAX(CASE WHEN p = '5-LOW' THEN s END) AS s2,
             CAST(MAX(CASE WHEN p = '1-URGENT' THEN
               (n * ss - CAST(s AS {big}) * s) {intdiv} {_W_K} END)
               AS BIGINT) AS v1_s,
             CAST(MAX(CASE WHEN p = '5-LOW' THEN
               (n * ss - CAST(s AS {big}) * s) {intdiv} {_W_K} END)
               AS BIGINT) AS v2_s
      FROM g
    ),
    d AS (
      SELECT n1, n2, v1_s, v2_s,
             (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
               AS mean_diff,
             {_WELCH_VARS.format(k=_W_K)}
      FROM w
    )
    SELECT n1 AS n_urgent, n2 AS n_low,
           mean_diff + 0.0 AS mean_diff_cents,
           {_WELCH_T} AS t_stat,
           {_WELCH_DF} AS welch_df
    FROM d
    """


@query("agg_welch_t", oracle=_welch_sql("HUGEINT", "//"))
def agg_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t test comparing order value (exact
    cents) between urgent and low priorities, with the
    Welch-Satterthwaite degrees of freedom.  Group moments (n, sum,
    128-bit sum of squares) aggregate in one pass; each group's
    variance numerator n*SS - S^2 cancels exactly in DECIMAL and
    downscales by 1e9 into int64 before the shared double tree (the
    scale multiplies back exactly — 1e9 and int64 are both
    double-representable).

    Scale: one orders scan -> 2-group hash agg; everything after is
    scalar arithmetic on one row."""
    big = "DECIMAL(38,0)"
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    g = (
        o.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(F.col("o_orderpriority").alias("p"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr(_O_CENTS)).cast("long").alias("s"),
            F.sum(
                F.expr(f"CAST({_O_CENTS} AS {big}) * {_O_CENTS}")
            ).alias("ss"),
        )
    )
    vexpr = f"(n * ss - CAST(s AS {big}) * s) div {_W_K}"
    w = g.agg(
        F.max(F.expr("CASE WHEN p = '1-URGENT' THEN n END")).alias("n1"),
        F.max(F.expr("CASE WHEN p = '1-URGENT' THEN s END")).alias("s1"),
        F.max(F.expr("CASE WHEN p = '5-LOW' THEN n END")).alias("n2"),
        F.max(F.expr("CASE WHEN p = '5-LOW' THEN s END")).alias("s2"),
        F.max(
            F.expr(f"CASE WHEN p = '1-URGENT' THEN {vexpr} END")
        ).cast("long").alias("v1_s"),
        F.max(
            F.expr(f"CASE WHEN p = '5-LOW' THEN {vexpr} END")
        ).cast("long").alias("v2_s"),
    )
    d = w.selectExpr(
        "n1",
        "n2",
        "v1_s",
        "v2_s",
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) AS mean_diff",
        *_WELCH_VARS.format(k=_W_K).split(", "),
    )
    return d.selectExpr(
        "n1 AS n_urgent",
        "n2 AS n_low",
        "mean_diff + 0.0 AS mean_diff_cents",
        f"{_WELCH_T} AS t_stat",
        f"{_WELCH_DF} AS welch_df",
    )


# --------------------------------------------------------------------------
# Kendall's tau-b: quantity vs discount concordance
# --------------------------------------------------------------------------

#: Downscale for the tau-b numerator/denominator (pair counts ~ n^2/2;
#: int64 after /1e3, envelope n ~ 1.4e11 rows; the 1e3 cancels in the
#: ratio).
_KT_K = "1000"

_KT_TAU = (
    "CASE WHEN a_s <= 0 OR b_s <= 0 THEN 0.0"
    " ELSE (CAST(cd_s AS DOUBLE)"
    " / SQRT(CAST(a_s AS DOUBLE) * CAST(b_s AS DOUBLE))) + 0.0 END"
)


def _kendall_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM lineitem GROUP BY 1, 2
    ),
    conc AS (
      SELECT SUM(CAST(a.m AS {big}) * b.m) AS c
      FROM cells a JOIN cells b ON a.x < b.x AND a.y < b.y
    ),
    disc AS (
      SELECT SUM(CAST(a.m AS {big}) * b.m) AS d
      FROM cells a JOIN cells b ON a.x < b.x AND a.y > b.y
    ),
    ties AS (
      SELECT CAST(SUM(m) AS BIGINT) AS n FROM cells
    ),
    tx AS (
      SELECT SUM(CAST(s AS {big}) * (s - 1)) AS t2
      FROM (SELECT SUM(m) AS s FROM cells GROUP BY x)
    ),
    ty AS (
      SELECT SUM(CAST(s AS {big}) * (s - 1)) AS t2
      FROM (SELECT SUM(m) AS s FROM cells GROUP BY y)
    ),
    parts AS (
      SELECT n, c, d,
             (CAST(n AS {big}) * (n - 1) - tx.t2) AS a2,
             (CAST(n AS {big}) * (n - 1) - ty.t2) AS b2,
             CAST(n AS {big}) * (n - 1) AS n02
      FROM conc, disc, ties, tx, ty
    )
    SELECT n AS n_rows,
           CAST(c * 20000 {intdiv} n02 AS BIGINT) AS conc_bp,
           CAST(d * 20000 {intdiv} n02 AS BIGINT) AS disc_bp,
           {_KT_TAU} AS tau_b
    FROM (
      SELECT n, n02, c, d,
             CASE WHEN c - d < 0
               THEN -CAST((d - c) {intdiv} {_KT_K} AS BIGINT)
               ELSE CAST((c - d) {intdiv} {_KT_K} AS BIGINT) END AS cd_s,
             CAST(a2 {intdiv} (2 * {_KT_K}) AS BIGINT) AS a_s,
             CAST(b2 {intdiv} (2 * {_KT_K}) AS BIGINT) AS b_s
      FROM parts
    )
    """


@query("agg_kendall_tau", oracle=_kendall_sql("HUGEINT", "//"))
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between quantity and discount:
    both domains are BOUNDED (50 quantities x 11 discount points), so
    concordant/discordant pair counts come from a ~550-cell count
    matrix self-joined on the strict orderings — never an O(n^2) row
    join; ties enter through the standard tau-b marginal corrections.
    The emitted concordant/discordant shares are exact integer basis
    points; tau-b itself is one shared double tree over int64s
    downscaled by a fixed 1e3 (the scale cancels between the C - D
    numerator — ABS-re-signed so floor and truncating division agree —
    and the sqrt((n0-n1)(n0-n2)) denominator).

    Scale: one lineitem scan -> bounded-cell hash agg; the cell
    self-joins touch <= 550^2 broadcast rows."""
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount"
    )
    cells = li.groupBy(
        F.expr("CAST(l_quantity AS BIGINT)").alias("x"),
        F.expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").alias("y"),
    ).agg(F.count(F.lit(1)).cast("long").alias("m"))
    from concurrent_etl_go_spark.operators.registry import scoped_persist

    cells = scoped_persist(cells)
    a, b = cells.alias("a"), cells.alias("b")
    conc = a.join(
        F.broadcast(b),
        (F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")),
    ).agg(F.sum(F.expr(f"CAST(a.m AS {big}) * b.m")).alias("c"))
    disc = a.join(
        F.broadcast(b),
        (F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")),
    ).agg(F.sum(F.expr(f"CAST(a.m AS {big}) * b.m")).alias("d"))
    ties = cells.agg(F.sum("m").cast("long").alias("n"))
    tx = (
        cells.groupBy("x")
        .agg(F.sum("m").alias("s"))
        .agg(F.sum(F.expr(f"CAST(s AS {big}) * (s - 1)")).alias("t2x"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("m").alias("s"))
        .agg(F.sum(F.expr(f"CAST(s AS {big}) * (s - 1)")).alias("t2y"))
    )
    parts = (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .selectExpr(
            "n",
            "c",
            "d",
            f"CAST(n AS {big}) * (n - 1) AS n02",
            f"(CAST(n AS {big}) * (n - 1) - t2x) AS a2",
            f"(CAST(n AS {big}) * (n - 1) - t2y) AS b2",
        )
    )
    scaled = parts.selectExpr(
        "n",
        "n02",
        "c",
        "d",
        f"CASE WHEN c - d < 0 THEN -CAST((d - c) div {_KT_K} AS BIGINT)"
        f" ELSE CAST((c - d) div {_KT_K} AS BIGINT) END AS cd_s",
        f"CAST(a2 div (2 * {_KT_K}) AS BIGINT) AS a_s",
        f"CAST(b2 div (2 * {_KT_K}) AS BIGINT) AS b_s",
    )
    return scaled.selectExpr(
        "n AS n_rows",
        "CAST(c * 20000 div n02 AS BIGINT) AS conc_bp",
        "CAST(d * 20000 div n02 AS BIGINT) AS disc_bp",
        f"{_KT_TAU} AS tau_b",
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis H: quantity ranks across return flags
# --------------------------------------------------------------------------

#: H = (N-1) * SSB/SST over the 2x-midrank values — the variance form
#: carries the tie correction intrinsically (H with ties equals the
#: rank-ANOVA ratio on midranks), so no separate t^3 - t term exists.
_KW_H = (
    "CASE WHEN k_groups <= 1 OR sst_s <= 0 THEN 0.0"
    " ELSE ((n_rows - 1.0) * CAST(ssb_s AS DOUBLE)"
    " / CAST(sst_s AS DOUBLE)) + 0.0 END"
)


def _kruskal_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag AS g,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM lineitem GROUP BY 1, 2
    ),
    vals0 AS MATERIALIZED (
      SELECT v, SUM(m) AS c FROM pts GROUP BY v
    ),
    vals AS MATERIALIZED (
      SELECT v, c,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp
      FROM vals0
    ),
    ranked AS (
      SELECT p.g, p.m, 2 * vals.cp + vals.c + 1 AS r2
      FROM pts p JOIN vals ON p.v = vals.v
    ),
    grp AS (
      SELECT g, CAST(SUM(m) AS BIGINT) AS n_g,
             SUM(CAST(r2 AS {big}) * m) AS r2sum,
             SUM(CAST(r2 AS {big}) * r2 * m) AS r2ss
      FROM ranked GROUP BY g
    ),
    agg AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(r2sum) AS rt, SUM(r2ss) AS rsst,
             SUM((r2sum * r2sum) {intdiv} n_g) AS asum
      FROM grp
    )
    SELECT k AS k_groups, nt AS n_rows,
           CAST((asum - (rt * rt) {intdiv} nt) {intdiv} 1000 AS BIGINT)
             AS ssb_s,
           CAST((rsst - (rt * rt) {intdiv} nt) {intdiv} 1000 AS BIGINT)
             AS sst_s,
           {_KW_H} AS h_stat
    FROM agg
    """


@query("agg_kruskal_wallis", oracle=_kruskal_sql("HUGEINT", "//"))
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H comparing the quantity distribution across the
    three return flags — the k-group extension of Mann-Whitney,
    computed WITHOUT a global sort: 2x average ranks come from
    cumulative counts over the 50-row distinct-value frame
    (``2*cum_prev + cnt + 1``, the stats_tests.py trick), and H is the
    rank-ANOVA variance ratio ``(N-1)*SSB/SST`` on those exact-integer
    midranks — a form that carries the tie correction intrinsically.
    The sums of squares cancel exactly in DECIMAL (per-group floor
    ``R^2/n``, the ANOVA idiom) and downscale by 1e3 into int64; the
    scale cancels in the ratio.

    Scale: one lineitem scan -> bounded (value x group) hash agg;
    everything after runs on <= 150 rows."""
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag"
    )
    pts = li.groupBy(
        F.expr("CAST(l_quantity AS BIGINT)").alias("v"),
        F.col("l_returnflag").alias("g"),
    ).agg(F.count(F.lit(1)).cast("long").alias("m"))
    from pyspark.sql import Window

    from concurrent_etl_go_spark.operators.registry import scoped_persist

    pts = scoped_persist(pts)
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    vals = (
        pts.groupBy("v")
        .agg(F.sum("m").alias("c"))
        .select(
            "v",
            "c",
            F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("cp"),
        )
    )
    ranked = pts.join(vals, "v").select(
        "g", "m", (2 * F.col("cp") + F.col("c") + 1).alias("r2")
    )
    grp = ranked.groupBy("g").agg(
        F.sum("m").cast("long").alias("n_g"),
        F.sum(F.expr(f"CAST(r2 AS {big}) * m")).alias("r2sum"),
        F.sum(F.expr(f"CAST(r2 AS {big}) * r2 * m")).alias("r2ss"),
    )
    # Exact floor division kept IN decimal (Spark's `div` collapses to
    # BIGINT and silently overflows at sf>=1 here — the ANOVA a_g
    # idiom): subtract the exact modulus, divide the integrally-
    # divisible decimal.
    agg = grp.agg(
        F.sum("n_g").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("r2sum").alias("rt"),
        F.sum("r2ss").alias("rsst"),
        F.sum(
            F.expr(
                f"CAST((r2sum * r2sum - r2sum * r2sum % n_g) / n_g"
                f" AS {big})"
            )
        ).alias("asum"),
    )
    gq = (
        f"CAST((rt * rt - rt * rt % nt) / nt AS {big})"
    )
    return agg.selectExpr(
        "k AS k_groups",
        "nt AS n_rows",
        f"CAST((asum - {gq}) div 1000 AS BIGINT) AS ssb_s",
        f"CAST((rsst - {gq}) div 1000 AS BIGINT) AS sst_s",
        f"{_KW_H} AS h_stat",
    )


# --------------------------------------------------------------------------
# Cohen's kappa: agreement between two order-classification rules
# --------------------------------------------------------------------------

#: High-value threshold (cents) and the priority set for the second
#: rater — fixed literals, not data-derived.
_KAPPA_CENTS = 15_000_000


def _kappa_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH flags AS (
      SELECT CASE WHEN {_O_CENTS} >= {_KAPPA_CENTS} THEN 1 ELSE 0 END
               AS ra,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END AS rb
      FROM orders
    ),
    conf AS (
      SELECT CAST(SUM(ra * rb) AS BIGINT) AS tt,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS tf,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS ft,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS ff,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM flags
    ),
    e AS (
      SELECT tt, tf, ft, ff, n,
             CAST(tt + tf AS {big}) * (tt + ft)
               + CAST(ft + ff AS {big}) * (tf + ff) AS pe2,
             CAST(n AS {big}) * (tt + ff) AS po2,
             CAST(n AS {big}) * n AS n2
      FROM conf
    )
    SELECT tt AS both_high, tf AS value_only, ft AS priority_only,
           ff AS both_low,
           CASE WHEN n2 - pe2 <= 0 THEN 0
                WHEN po2 - pe2 < 0
             THEN -CAST((pe2 - po2) * 1000000 {intdiv} (n2 - pe2)
                        AS BIGINT)
             ELSE CAST((po2 - pe2) * 1000000 {intdiv} (n2 - pe2)
                       AS BIGINT) END AS kappa_e6
    FROM e
    """


@query("agg_cohens_kappa", oracle=_kappa_sql("HUGEINT", "//"))
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two deterministic order
    classifiers — rater A: order value >= $150k; rater B: priority in
    (urgent, high) — the chance-corrected agreement a labeling
    pipeline reports when two annotation rules (or model versions)
    vote on the same rows.  kappa = (Po - Pe)/(1 - Pe) is computed
    ENTIRELY in integers: both the observed and expected agreement
    cross-multiply by n, the cancellation runs in DECIMAL, and the
    emitted kappa is exact floor micro-units, ABS-re-signed so floor
    and truncating division agree.

    Scale: one orders scan -> a 2x2 confusion matrix; scalar
    arithmetic after."""
    big = "DECIMAL(38,0)"
    o = read_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderpriority"
    )
    flags = o.select(
        F.expr(
            f"CASE WHEN {_O_CENTS} >= {_KAPPA_CENTS} THEN 1 ELSE 0 END"
        ).alias("ra"),
        F.expr(
            "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
            " THEN 1 ELSE 0 END"
        ).alias("rb"),
    )
    conf = flags.agg(
        F.sum(F.expr("ra * rb")).cast("long").alias("tt"),
        F.sum(F.expr("ra * (1 - rb)")).cast("long").alias("tf"),
        F.sum(F.expr("(1 - ra) * rb")).cast("long").alias("ft"),
        F.sum(F.expr("(1 - ra) * (1 - rb)")).cast("long").alias("ff"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    e = conf.selectExpr(
        "tt",
        "tf",
        "ft",
        "ff",
        "n",
        f"CAST(tt + tf AS {big}) * (tt + ft)"
        f" + CAST(ft + ff AS {big}) * (tf + ff) AS pe2",
        f"CAST(n AS {big}) * (tt + ff) AS po2",
        f"CAST(n AS {big}) * n AS n2",
    )
    return e.selectExpr(
        "tt AS both_high",
        "tf AS value_only",
        "ft AS priority_only",
        "ff AS both_low",
        "CASE WHEN n2 - pe2 <= 0 THEN 0"
        " WHEN po2 - pe2 < 0"
        " THEN -CAST((pe2 - po2) * 1000000 div (n2 - pe2) AS BIGINT)"
        " ELSE CAST((po2 - pe2) * 1000000 div (n2 - pe2) AS BIGINT)"
        " END AS kappa_e6",
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality: quantity distribution shape per return flag
# --------------------------------------------------------------------------

#: Central moments from FLOOR-mean-shifted raw power sums (all exact
#: int64 — the quantity domain is bounded, so S4' <= 6.25e6 * n), then
#: skewness, excess kurtosis, and JB as one shared unrounded tree.
_JB_MOMENTS = (
    "CAST(s1 AS DOUBLE) / n AS mu, "
    "CAST(s2 AS DOUBLE) / n AS m2r, "
    "CAST(s3 AS DOUBLE) / n AS m3r, "
    "CAST(s4 AS DOUBLE) / n AS m4r"
)
_JB_FINAL = """
    CASE WHEN m2 <= 0.0 THEN 0.0
         ELSE (m3 / (SQRT(m2) * m2)) + 0.0 END AS skewness,
    CASE WHEN m2 <= 0.0 THEN 0.0
         ELSE (m4 / (m2 * m2) - 3.0) + 0.0 END AS excess_kurtosis,
    CASE WHEN m2 <= 0.0 THEN 0.0
         ELSE (CAST(n AS DOUBLE) / 6.0
               * ((m3 / (SQRT(m2) * m2)) * (m3 / (SQRT(m2) * m2))
                  + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                    / 4.0)) + 0.0 END AS jarque_bera
"""


def _jb_sql() -> str:
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (
      SELECT flag, CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * v) AS BIGINT) // CAST(SUM(m) AS BIGINT) AS m0
      FROM cells GROUP BY 1
    ),
    shifted AS (
      SELECT c.flag, b.n,
             CAST(SUM(c.m * (c.v - b.m0)) AS BIGINT) AS s1,
             CAST(SUM(c.m * (c.v - b.m0) * (c.v - b.m0)) AS BIGINT) AS s2,
             CAST(SUM(c.m * (c.v - b.m0) * (c.v - b.m0) * (c.v - b.m0))
               AS BIGINT) AS s3,
             CAST(SUM(c.m * (c.v - b.m0) * (c.v - b.m0) * (c.v - b.m0)
                      * (c.v - b.m0)) AS BIGINT) AS s4
      FROM cells c JOIN base b ON c.flag = b.flag
      GROUP BY 1, 2
    ),
    raw AS (
      SELECT flag, n, {_JB_MOMENTS} FROM shifted
    ),
    cm AS (
      SELECT flag, n,
             m2r - mu * mu AS m2,
             m3r - 3.0 * mu * m2r + 2.0 * mu * mu * mu AS m3,
             m4r - 4.0 * mu * m3r + 6.0 * mu * mu * m2r
               - 3.0 * mu * mu * mu * mu AS m4
      FROM raw
    )
    SELECT flag, n AS n_rows, {_JB_FINAL}
    FROM cm
    """


@query("agg_jarque_bera", oracle=_jb_sql())
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality check of the quantity distribution per
    return flag: skewness, excess kurtosis, and the JB statistic.  The
    value domain is bounded (1..50), so each flag's raw power sums
    S1'..S4' over FLOOR-mean-shifted values stay exact int64 out to
    ~1e12 rows (|v - m0| < 50 -> S4' <= 6.25e6 * n) — no 128-bit path,
    no downscale; the central-moment recombination and the JB tree are
    one shared unrounded double expression over those exact integers.
    The integer shift changes nothing: central moments are
    translation-invariant, and shifting merely bounds the lattice.

    Scale: one lineitem scan -> bounded (flag x value) hash agg;
    everything after runs on <= 150 rows."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("m"))
    from concurrent_etl_go_spark.operators.registry import scoped_persist

    cells = scoped_persist(cells)
    base = cells.groupBy("flag").agg(
        F.sum("m").cast("long").alias("n"),
        F.expr(
            "CAST(SUM(m * v) AS BIGINT) div CAST(SUM(m) AS BIGINT)"
        ).alias("m0"),
    )
    shifted = (
        cells.join(F.broadcast(base), "flag")
        .groupBy("flag", "n")
        .agg(
            F.sum(F.expr("m * (v - m0)")).cast("long").alias("s1"),
            F.sum(F.expr("m * (v - m0) * (v - m0)"))
            .cast("long")
            .alias("s2"),
            F.sum(F.expr("m * (v - m0) * (v - m0) * (v - m0)"))
            .cast("long")
            .alias("s3"),
            F.sum(
                F.expr("m * (v - m0) * (v - m0) * (v - m0) * (v - m0)")
            )
            .cast("long")
            .alias("s4"),
        )
    )
    raw = shifted.selectExpr(
        "flag", "n", *[x.strip() for x in _JB_MOMENTS.split(", ")]
    )
    cm = raw.selectExpr(
        "flag",
        "n",
        "m2r - mu * mu AS m2",
        "m3r - 3.0 * mu * m2r + 2.0 * mu * mu * mu AS m3",
        "m4r - 4.0 * mu * m3r + 6.0 * mu * mu * m2r"
        " - 3.0 * mu * mu * mu * mu AS m4",
    )
    return cm.selectExpr(
        "flag",
        "n AS n_rows",
        *[x.strip() for x in _JB_FINAL.split(",\n")],
    )
