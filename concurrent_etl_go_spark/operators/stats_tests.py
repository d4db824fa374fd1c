"""Classical hypothesis tests as distributed one-pass aggregations:
chi-square independence, Mann-Whitney U / AUC, Kolmogorov-Smirnov,
one-way ANOVA, and Spearman rank correlation.

These are the statistical primitives a data platform's experimentation
and data-quality layers read constantly (all public literature:
Pearson 1900; Mann & Whitney 1947; Kolmogorov 1933 / Smirnov 1948;
Fisher 1925; Spearman 1904).  The engine contribution is expressing
each as a SCALABLE Spark plan: one hash aggregation onto a bounded
domain (contingency cells, distinct small-domain values, group
moments), then scalar arithmetic on the tiny aggregate — never a
global per-row sort or rank window.

Rank statistics without a global sort: every ranked variable here has
a bounded value domain (quantity 1..50, discount/tax basis points,
5x5 contingency cells, 3 return flags), so average ranks come from
cumulative counts over the ~50-row distinct-value frame — the
map-side-combinable groupBy carries all the data movement.  At 100 TB
the same plans hold: the only shuffle is the bounded-key aggregation.
Integer envelope (round-10 ADVICE): Mann-Whitney's tie term
sum(c^3 - c) crosses int64 once one value's count reaches ~2.1M rows,
so it stays in DECIMAL(38,0)/HUGEINT and reaches the z tree as exact
floor-divided micro-units (valid out to ~4e12 rows); the Wilcoxon
tie term is bounded STRUCTURALLY (one paired difference per day —
tie3 <= n_days^3, ~1e11 at a 5,000-day horizon) and stays int64.

Cross-engine exactness (SURVEY §7.6 + the round-10 float rules):
- every stochastic quantity is an exact INTEGER (counts, rank*2 values,
  money cents, their 128-bit moment products);
- 128-bit cancellations (n*Sxy - Sx*Sy) happen IN DECIMAL(38,0)/HUGEINT,
  then are downscaled by a fixed power of ten into int64 BEFORE any
  double conversion (128->double casts differ by an ulp across engines;
  int64->double is hardware-exact on both);
- downscaling divides NON-NEGATIVE values only, except the Spearman
  numerator which is re-signed around an ABS() so DuckDB's floor `//`
  and Spark's truncating `div` agree;
- emitted floats are single SHARED-TEXT IEEE trees over those exact
  int64s, unrounded, `+ 0.0` (bit-identical by construction; ROUND
  would only add half-way-boundary risk).

Reference parity: the reference engine (etl/main.go) has no statistics
surface; extends SURVEY.md §2.B's aggregation family beside
``operators/experiments.py`` / ``operators/experiments2.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

#: Exact integer cents (committed idiom from operators/relational12.py:
#: money doubles are 2dp-exact, *100 then half-up ROUND is identical on
#: both engines).
_CENTS = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"

# --------------------------------------------------------------------------
# chi-square test of independence: market segment x order priority
# --------------------------------------------------------------------------

#: Expected cell count under independence — exact int64 inputs, shared
#: unrounded tree.
_CHI_EXPECTED = "(CAST(r AS DOUBLE) * c / n) + 0.0"
#: Cramer's V from the exact integer chi2_e6.
_CHI_V = (
    "SQRT((CAST(chi2_e6 AS DOUBLE) / 1000000.0)"
    " / (CAST(n AS DOUBLE) * LEAST(nseg - 1, npri - 1))) + 0.0"
)


def _chi_square_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             COUNT(*) AS obs
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    segs AS (SELECT DISTINCT seg FROM cells),
    pris AS (SELECT DISTINCT pri FROM cells),
    grid AS MATERIALIZED (
      SELECT s.seg, p.pri, COALESCE(x.obs, 0) AS obs
      FROM segs s CROSS JOIN pris p
      LEFT JOIN cells x ON x.seg = s.seg AND x.pri = p.pri
    ),
    marg AS MATERIALIZED (
      SELECT seg, pri, obs,
             SUM(obs) OVER (PARTITION BY seg) AS r,
             SUM(obs) OVER (PARTITION BY pri) AS c,
             SUM(obs) OVER () AS n
      FROM grid
    ),
    dims AS (
      SELECT COUNT(DISTINCT seg) AS nseg, COUNT(DISTINCT pri) AS npri
      FROM grid
    ),
    contrib AS MATERIALIZED (
      SELECT seg, pri, obs, r, c, n,
             CAST((CAST(n AS {big}) * obs - CAST(r AS {big}) * c)
                  * (CAST(n AS {big}) * obs - CAST(r AS {big}) * c)
                  * 1000000 {intdiv} (CAST(n AS {big}) * r * c)
                  AS BIGINT) AS contrib_e6
      FROM marg
    ),
    tot AS (SELECT SUM(contrib_e6) AS chi2_e6 FROM contrib)
    SELECT seg AS mktsegment, pri AS priority,
           CAST(obs AS BIGINT) AS observed,
           {_CHI_EXPECTED} AS expected,
           contrib.contrib_e6 AS contrib_e6,
           CAST(t.chi2_e6 AS BIGINT) AS chi2_e6,
           {_CHI_V} AS cramers_v
    FROM contrib CROSS JOIN tot t CROSS JOIN dims
    """


@query("agg_chi_square", oracle=_chi_square_sql("HUGEINT", "//"))
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and order priority, one row per contingency cell: observed count,
    expected count under independence, the cell's exact-integer
    chi-square contribution in millionths
    ``(N*O - r*c)^2 * 1e6 / (N*r*c)`` (per-cell floor division is the
    DEFINED statistic — deterministic on both engines), the total
    statistic, and Cramer's V.

    Scale: orders-customer key join -> 25-cell hash agg; every later
    step runs on the 25-row frame (tiny windows, broadcast scalars).
    Missing cells are restored by a dim-grid left join so zero cells
    still contribute their expected count."""
    big = "DECIMAL(38,0)"
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cells = scoped_persist(
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    # broadcast the 5-row priority dim so the grid expansion plans as a
    # broadcast nested-loop, not a CartesianProduct
    grid = (
        cells.select("seg")
        .distinct()
        .crossJoin(F.broadcast(cells.select("pri").distinct()))
        .join(cells, ["seg", "pri"], "left")
        .select("seg", "pri", F.coalesce("obs", F.lit(0)).alias("obs"))
    )
    marg = grid.select(
        "seg",
        "pri",
        "obs",
        F.sum("obs").over(Window.partitionBy("seg")).alias("r"),
        F.sum("obs").over(Window.partitionBy("pri")).alias("c"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    dims = cells.agg(
        F.countDistinct("seg").alias("nseg"),
        F.countDistinct("pri").alias("npri"),
    )
    contrib = marg.withColumn(
        "contrib_e6",
        F.expr(
            f"CAST((CAST(n AS {big}) * obs - CAST(r AS {big}) * c)"
            f" * (CAST(n AS {big}) * obs - CAST(r AS {big}) * c)"
            f" * 1000000 div (CAST(n AS {big}) * r * c) AS BIGINT)"
        ),
    )
    tot = contrib.agg(F.sum("contrib_e6").alias("chi2_e6"))
    return (
        contrib.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("seg").alias("mktsegment"),
            F.col("pri").alias("priority"),
            F.col("obs").cast("long").alias("observed"),
            F.expr(_CHI_EXPECTED).alias("expected"),
            "contrib_e6",
            F.col("chi2_e6").cast("long").alias("chi2_e6"),
            F.expr(_CHI_V).alias("cramers_v"),
        )
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (two-sample rank test): quantity by line status
# --------------------------------------------------------------------------

#: Tie-corrected normal-approximation variance of U and the z score —
#: exact int64 inputs (u1_x2, n1, n2, tie_e6), shared unrounded tree.
#: The tie correction tie3/(N*(N-1)) arrives as exact integer
#: MICRO-units (tie_e6): the raw tie3 = sum(c^3 - c) crosses int64 once
#: a single value's count reaches ~2.1M rows (round-10 ADVICE), so it
#: stays in DECIMAL(38,0)/HUGEINT and is floor-divided down — two
#: chained floor divisions (by N-1, then by N after the e6 scale-up)
#: keep every intermediate under 10^38 out to N ~ 10^12 rows, and both
#: engines execute the identical divide sequence so the (<= 1e-6,
#: deterministic) flooring is shared.  int64 -> double is
#: hardware-exact on both engines; a 128-bit -> double cast is not.
_MW_VAR = (
    "(CAST(n1 AS DOUBLE) * n2 / 12.0)"
    " * ((n1 + n2 + 1.0) - CAST(tie_e6 AS DOUBLE) / 1000000.0)"
)
_MW_Z = (
    f"CASE WHEN n1 = 0 OR n2 = 0 OR {_MW_VAR} <= 0.0 THEN 0.0"
    f" ELSE (CAST(u1_x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)"
    f" / (2.0 * SQRT({_MW_VAR})) + 0.0 END"
)


def _mann_whitney_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS c2
      FROM lineitem WHERE l_linestatus IN ('O', 'F')
      GROUP BY 1
    ),
    cum AS MATERIALIZED (
      SELECT v, c1, c2, c1 + c2 AS c,
             COALESCE(SUM(c1 + c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp
      FROM pts
    ),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (2 * cp + c + 1)) AS BIGINT) AS r1x2,
             SUM(CAST(c AS {big}) * c * c - c) AS tie3
      FROM cum
    ),
    u AS (
      SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u1_x2,
             CASE WHEN n1 + n2 > 1 THEN CAST(
               ((tie3 {intdiv} (CAST(n1 AS {big}) + n2 - 1)) * 1000000)
               {intdiv} (CAST(n1 AS {big}) + n2) AS BIGINT)
             ELSE 0 END AS tie_e6
      FROM s
    )
    SELECT n1 AS n_open, n2 AS n_finished, u1_x2,
           CAST(CAST(u1_x2 AS {big}) * 1000000
                {intdiv} (2 * CAST(n1 AS {big}) * n2) AS BIGINT) AS auc_e6,
           {_MW_Z} AS z_score
    FROM u
    """


@query("agg_mann_whitney", oracle=_mann_whitney_sql("HUGEINT", "//"))
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U comparing the l_quantity distribution between
    open ('O') and finished ('F') line statuses, with average-rank tie
    handling: ``2*avg_rank = 2*cum_prev + cnt + 1`` keeps every rank
    quantity an exact integer, so U1*2, the probability-of-superiority
    AUC (millionths, floor division over 128-bit products), and the
    tie-corrected z score are all deterministic.

    Scale: ONE bounded-domain hash agg (50 distinct quantities); the
    cumulative window runs on the 50-row frame."""
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_linestatus"
    )
    pts = (
        li.where(F.col("l_linestatus").isin("O", "F"))
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("l_linestatus") == "O", 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
            ).alias("c2"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = pts.select(
        "v",
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("c"),
        F.coalesce(
            F.sum(F.col("c1") + F.col("c2")).over(w), F.lit(0)
        ).alias("cp"),
    )
    s = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("cp") + F.col("c") + 1)
        ).cast("long").alias("r1x2"),
        F.sum(F.expr(f"CAST(c AS {big}) * c * c - c")).alias("tie3"),
    )
    # Exact 128-bit floor division via (x - x % n) / n: Spark's `div`
    # returns BIGINT even on DECIMAL(38,0) operands (silent overflow).
    # Two chained floor divides (by N-1, then by N after the e6
    # scale-up) mirror the oracle's `//` sequence term for term.
    s2 = s.withColumn(
        "nn", F.expr(f"CAST(n1 AS {big}) + n2")
    ).withColumn(
        "q1e6",
        F.expr(
            f"CASE WHEN nn > 1 THEN"
            f" CAST((tie3 - tie3 % (nn - 1)) / (nn - 1) AS {big})"
            f" * 1000000 ELSE CAST(0 AS {big}) END"
        ),
    )
    u = s2.select(
        "n1",
        "n2",
        (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_x2"),
        F.expr(
            "CASE WHEN nn > 1 THEN CAST((q1e6 - q1e6 % nn) / nn"
            " AS BIGINT) ELSE 0 END"
        ).alias("tie_e6"),
    )
    return u.select(
        F.col("n1").alias("n_open"),
        F.col("n2").alias("n_finished"),
        "u1_x2",
        F.expr(
            f"CAST(CAST(u1_x2 AS {big}) * 1000000"
            f" div (2 * CAST(n1 AS {big}) * n2) AS BIGINT)"
        ).alias("auc_e6"),
        F.expr(_MW_Z).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample statistic on the same split
# --------------------------------------------------------------------------


def _ks_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS c2
      FROM lineitem WHERE l_linestatus IN ('O', 'F')
      GROUP BY 1
    ),
    cum AS MATERIALIZED (
      SELECT v,
             SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
             SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
      FROM pts
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM pts
    ),
    d AS (
      SELECT v, n1, n2,
             ABS(CAST(f1 AS {big}) * n2 - CAST(f2 AS {big}) * n1) AS dn
      FROM cum CROSS JOIN tot
    )
    SELECT v AS at_value, n1, n2,
           CAST(dn * 1000000 {intdiv} (CAST(n1 AS {big}) * n2) AS BIGINT)
             AS d_e6
    FROM d
    ORDER BY dn DESC, v ASC
    LIMIT 1
    """


@query("agg_ks_test", oracle=_ks_sql("HUGEINT", "//"))
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the open/finished
    l_quantity distributions: the max ECDF gap is located on the
    cross-multiplied INTEGER lattice ``|F1(v)*n2 - F2(v)*n1|`` (no
    float ever), emitted as millionths with the argmax value
    (smallest v breaks ties).

    Scale: same bounded-domain agg as ``agg_mann_whitney``; the ECDF
    scan is a 50-row window."""
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_linestatus"
    )
    pts = scoped_persist(
        li.where(F.col("l_linestatus").isin("O", "F"))
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("l_linestatus") == "O", 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
            ).alias("c2"),
        )
    )
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pts.select(
        "v",
        F.sum("c1").over(wc).alias("f1"),
        F.sum("c2").over(wc).alias("f2"),
    )
    tot = pts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.expr(
            f"ABS(CAST(f1 AS {big}) * n2 - CAST(f2 AS {big}) * n1)"
        ).alias("dn"),
    )
    return (
        d.orderBy(F.col("dn").desc(), F.col("v").asc())
        .limit(1)
        .select(
            F.col("v").alias("at_value"),
            "n1",
            "n2",
            F.expr(
                f"CAST(dn * 1000000 div (CAST(n1 AS {big}) * n2)"
                f" AS BIGINT)"
            ).alias("d_e6"),
        )
    )


# --------------------------------------------------------------------------
# one-way ANOVA: extended price cents across return flags
# --------------------------------------------------------------------------

#: F statistic over the downscaled int64 sums of squares (the /1000
#: scale cancels between numerator and denominator).
_ANOVA_F = (
    "CASE WHEN k_groups <= 1 OR n_rows <= k_groups OR ssw_s <= 0 THEN 0.0"
    " ELSE (CAST(ssb_s AS DOUBLE) / (k_groups - 1))"
    " / (CAST(ssw_s AS DOUBLE) / (n_rows - k_groups)) + 0.0 END"
)
_ANOVA_MEAN = "(CAST(st_b AS DOUBLE) / n_rows) + 0.0"


def _anova_sql(big: str, intdiv: str) -> str:
    return f"""
    WITH g AS MATERIALIZED (
      SELECT l_returnflag AS flag, COUNT(*) AS n,
             SUM({_CENTS}) AS s,
             SUM(CAST({_CENTS} AS {big}) * {_CENTS}) AS ss
      FROM lineitem GROUP BY 1
    ),
    a AS (
      SELECT flag, n, s, ss,
             CAST(s AS {big}) * s {intdiv} n AS a_g
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(s) AS st,
             SUM(ss) AS sst, SUM(a_g) AS asum,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM a
    ),
    f AS (
      SELECT k AS k_groups, nt AS n_rows, CAST(st AS BIGINT) AS st_b,
             asum - (CAST(st AS {big}) * st {intdiv} nt) AS ssb,
             sst - asum AS ssw
      FROM tot
    ),
    scaled AS (
      SELECT k_groups, n_rows, st_b,
             CAST(ssb {intdiv} 1000 AS BIGINT) AS ssb_s,
             CAST(ssw {intdiv} 1000 AS BIGINT) AS ssw_s,
             ssb, ssw
      FROM f
    )
    SELECT k_groups, n_rows, st_b AS sum_cents, ssb_s, ssw_s,
           {_ANOVA_MEAN} AS grand_mean_cents,
           CASE WHEN ssb + ssw <= 0 THEN 0 ELSE
             CAST(ssb * 1000000 {intdiv} (ssb + ssw) AS BIGINT) END
             AS eta2_e6,
           {_ANOVA_F} AS f_stat
    FROM scaled
    """


@query("agg_anova_f", oracle=_anova_sql("HUGEINT", "//"))
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of exact extended-price cents across the three
    return flags: per-group moment sums (n, sum, 128-bit sum of
    squares), between/within sums of squares via per-group floor-divided
    ``s^2/n`` (the DEFINED statistic), the F ratio and exact-integer
    eta-squared effect size in millionths.

    The sums of squares exceed int64 at sf>=1, so they stay in
    DECIMAL(38,0)/HUGEINT through the cancellation and are downscaled
    by 1e3 into int64 BEFORE the double tree (the /1000 cancels in F).

    Scale: one lineitem scan -> 3-group hash agg; everything after is
    scalar arithmetic."""
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    g = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_CENTS)).alias("s"),
        F.sum(F.expr(f"CAST({_CENTS} AS {big}) * {_CENTS}")).alias("ss"),
    )
    # Exact floor division kept IN decimal: Spark's `div` collapses to
    # BIGINT (overflows at sf>=1 here), so subtract the exact modulus
    # and divide an integrally-divisible decimal instead.
    a = g.select(
        "n",
        "s",
        "ss",
        F.expr(
            f"CAST((CAST(s AS {big}) * s - CAST(s AS {big}) * s % n)"
            f" / n AS {big})"
        ).alias("a_g"),
    )
    tot = a.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum("a_g").alias("asum"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    f = tot.select(
        F.col("k").alias("k_groups"),
        F.col("nt").alias("n_rows"),
        F.col("st").cast("long").alias("st_b"),
        F.expr(
            f"asum - CAST((CAST(st AS {big}) * st"
            f" - CAST(st AS {big}) * st % nt) / nt AS {big})"
        ).alias("ssb"),
        F.expr("sst - asum").alias("ssw"),
    )
    scaled = f.select(
        "k_groups",
        "n_rows",
        "st_b",
        F.expr("CAST(ssb div 1000 AS BIGINT)").alias("ssb_s"),
        F.expr("CAST(ssw div 1000 AS BIGINT)").alias("ssw_s"),
        "ssb",
        "ssw",
    )
    return scaled.select(
        "k_groups",
        "n_rows",
        F.col("st_b").alias("sum_cents"),
        "ssb_s",
        "ssw_s",
        F.expr(_ANOVA_MEAN).alias("grand_mean_cents"),
        F.expr(
            "CASE WHEN ssb + ssw <= 0 THEN 0 ELSE"
            " CAST(ssb * 1000000 div (ssb + ssw) AS BIGINT) END"
        ).alias("eta2_e6"),
        F.expr(_ANOVA_F).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation over bounded-domain pairs
# --------------------------------------------------------------------------

_SP_RHO = (
    "CASE WHEN varx_s <= 0 OR vary_s <= 0 THEN 0.0"
    " ELSE (CAST(numer_s AS DOUBLE)"
    " / (SQRT(CAST(varx_s AS DOUBLE)) * SQRT(CAST(vary_s AS DOUBLE))))"
    " + 0.0 END"
)

#: Downscale divisor taking the 128-bit rank moments into int64 before
#: the double tree (max |numer| ~ 5e27 at sf1 -> ~5e18 after).
_SP_K = "1000000000"


def _spearman_ctes(i: int, xe: str, ye: str) -> str:
    """One pair's CTE chain with ``_{i}``-suffixed names so two pairs
    share a single top-level WITH (DuckDB-safe; see
    [[duckdb-cte-materialization]] for why AS MATERIALIZED)."""
    return f"""
    cells_{i} AS MATERIALIZED (
      SELECT {xe} AS x, {ye} AS y, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    xr_{i} AS MATERIALIZED (
      SELECT x, 2 * COALESCE(SUM(cm) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cm + 1 AS rx2
      FROM (SELECT x, SUM(cnt) AS cm FROM cells_{i} GROUP BY 1)
    ),
    yr_{i} AS MATERIALIZED (
      SELECT y, 2 * COALESCE(SUM(cm) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cm + 1 AS ry2
      FROM (SELECT y, SUM(cnt) AS cm FROM cells_{i} GROUP BY 1)
    ),
    m_{i} AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             SUM(CAST(cnt AS HUGEINT) * rx2) AS sx,
             SUM(CAST(cnt AS HUGEINT) * ry2) AS sy,
             SUM(CAST(cnt AS HUGEINT) * rx2 * rx2) AS sxx,
             SUM(CAST(cnt AS HUGEINT) * ry2 * ry2) AS syy,
             SUM(CAST(cnt AS HUGEINT) * rx2 * ry2) AS sxy
      FROM cells_{i} c JOIN xr_{i} ON c.x = xr_{i}.x
      JOIN yr_{i} ON c.y = yr_{i}.y
    ),
    out_{i} AS (
      SELECT n AS n_rows,
             CAST(CASE WHEN CAST(n AS HUGEINT) * sxy - sx * sy < 0
                  THEN -(ABS(CAST(n AS HUGEINT) * sxy - sx * sy)
                         // {_SP_K})
                  ELSE (CAST(n AS HUGEINT) * sxy - sx * sy) // {_SP_K}
                  END AS BIGINT) AS numer_s,
             CAST((CAST(n AS HUGEINT) * sxx - sx * sx) // {_SP_K}
                  AS BIGINT) AS varx_s,
             CAST((CAST(n AS HUGEINT) * syy - sy * sy) // {_SP_K}
                  AS BIGINT) AS vary_s
      FROM m_{i}
    )"""


_SP_PAIRS = [
    ("CAST(l_quantity AS BIGINT)",
     "CAST(ROUND(l_discount * 100, 0) AS BIGINT)",
     "quantity_discount"),
    ("CAST(l_quantity AS BIGINT)",
     "CAST(ROUND(l_tax * 100, 0) AS BIGINT)",
     "quantity_tax"),
]

_SPEARMAN_ORACLE = (
    "WITH "
    + ",".join(
        _spearman_ctes(i, xe, ye)
        for i, (xe, ye, _label) in enumerate(_SP_PAIRS)
    )
    + "\nUNION ALL\n".join(
        f"\nSELECT '{label}' AS pair, n_rows, numer_s, varx_s, vary_s"
        f" FROM out_{i}"
        for i, (_xe, _ye, label) in enumerate(_SP_PAIRS)
    )
)


def _spearman_pair(
    spark: SparkSession, sf_dir: str, xe: str, ye: str, label: str
) -> DataFrame:
    big = "DECIMAL(38,0)"
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax"
    )
    cells = scoped_persist(
        li.select(F.expr(xe).alias("x"), F.expr(ye).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def ranks(col: str, out: str) -> DataFrame:
        m = cells.groupBy(col).agg(F.sum("cnt").alias("cm"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return m.select(
            col,
            (
                2 * F.coalesce(F.sum("cm").over(w), F.lit(0))
                + F.col("cm")
                + 1
            ).alias(out),
        )

    j = cells.join(ranks("x", "rx2"), "x").join(ranks("y", "ry2"), "y")
    m = j.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.expr(f"CAST(cnt AS {big}) * rx2")).alias("sx"),
        F.sum(F.expr(f"CAST(cnt AS {big}) * ry2")).alias("sy"),
        F.sum(F.expr(f"CAST(cnt AS {big}) * rx2 * rx2")).alias("sxx"),
        F.sum(F.expr(f"CAST(cnt AS {big}) * ry2 * ry2")).alias("syy"),
        F.sum(F.expr(f"CAST(cnt AS {big}) * rx2 * ry2")).alias("sxy"),
    )
    return m.select(
        F.lit(label).alias("pair"),
        F.col("n").alias("n_rows"),
        F.expr(
            f"CAST(CASE WHEN CAST(n AS {big}) * sxy - sx * sy < 0"
            f" THEN -(ABS(CAST(n AS {big}) * sxy - sx * sy)"
            f" div {_SP_K})"
            f" ELSE (CAST(n AS {big}) * sxy - sx * sy) div {_SP_K}"
            f" END AS BIGINT)"
        ).alias("numer_s"),
        F.expr(
            f"CAST((CAST(n AS {big}) * sxx - sx * sx) div {_SP_K}"
            f" AS BIGINT)"
        ).alias("varx_s"),
        F.expr(
            f"CAST((CAST(n AS {big}) * syy - sy * sy) div {_SP_K}"
            f" AS BIGINT)"
        ).alias("vary_s"),
    )


@query(
    "agg_spearman_corr",
    oracle=f"""
    SELECT pair, n_rows, numer_s, varx_s, vary_s, {_SP_RHO} AS rho
    FROM ({_SPEARMAN_ORACLE}) u
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation for two bounded-domain lineitem pairs
    (quantity vs discount basis points, quantity vs tax basis points)
    WITHOUT a global rank window: average ranks come from cumulative
    marginal counts over the <=50-row distinct-value frames
    (``2*avg_rank`` stays integer under ties), the five rank moments
    accumulate as 128-bit integers over the <=550 joint cells, and the
    Pearson-on-ranks cancellation happens exactly in 128-bit before a
    fixed 1e9 downscale into int64 (ABS-resigned so floor and
    truncating integer division agree on the negative numerator).

    Scale: one hash agg onto the joint-cell domain; the rank join is
    cell-count sized."""
    parts = [
        _spearman_pair(spark, sf_dir, xe, ye, label)
        for xe, ye, label in _SP_PAIRS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "pair",
        "n_rows",
        "numer_s",
        "varx_s",
        "vary_s",
        F.expr(_SP_RHO).alias("rho"),
    )


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily revenue series
# --------------------------------------------------------------------------

#: z score of the observed run count — unrounded shared tree over exact
#: int64s (n1 = above-median days, n2 = rest, runs = observed runs).
_RUNS_Z = (
    "CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0 ELSE"
    " (CAST(runs AS DOUBLE)"
    "  - (2.0 * CAST(n1 AS DOUBLE) * n2 / (n1 + n2) + 1.0))"
    " / SQRT(2.0 * CAST(n1 AS DOUBLE) * n2"
    "        * (2.0 * CAST(n1 AS DOUBLE) * n2 - n1 - n2)"
    "        / ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2)"
    "           * (CAST(n1 AS DOUBLE) + n2 - 1.0))) + 0.0 END"
)

_O_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"


def _runs_sql() -> str:
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_O_CENTS}) AS BIGINT) AS cents
      FROM daily_src GROUP BY 1
    ),
    med AS (
      SELECT cents AS m FROM (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, day) AS r,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE r = (n + 1) // 2
    ),
    signs AS MATERIALIZED (
      SELECT day, CASE WHEN cents > m THEN 1 ELSE 0 END AS hi
      FROM daily CROSS JOIN med
    ),
    flips AS (
      SELECT hi,
             CASE WHEN LAG(hi) OVER (ORDER BY day) IS NULL THEN 1
                  WHEN LAG(hi) OVER (ORDER BY day) <> hi THEN 1
                  ELSE 0 END AS new_run
      FROM signs
    )
    SELECT CAST(SUM(hi) AS BIGINT) AS n1,
           CAST(SUM(1 - hi) AS BIGINT) AS n2,
           CAST(SUM(new_run) AS BIGINT) AS runs,
           {_RUNS_Z} AS z_score
    FROM flips
    """


@query(
    "agg_runs_test",
    oracle=_runs_sql().replace("daily_src", "orders"),
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (1940, public literature) for
    randomness of the daily revenue series around its lower median:
    days are labeled above/not-above the exact median (rank
    ``(n+1)//2`` with day tie-break), runs are counted by ordered sign
    flips, and the normal-approximation z compares the observed run
    count to ``2*n1*n2/(n1+n2) + 1``.  Too FEW runs = trending /
    autocorrelated revenue; too many = oscillation.

    All counts are exact integers; z is one unrounded shared tree.
    Scale: one day-keyed hash agg; the median rank and the flip scan
    are day-count-sized windows."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = scoped_persist(
        orders.groupBy(
            F.date_trunc("day", "o_orderdate").alias("day")
        ).agg(F.sum(F.expr(_O_CENTS)).cast("long").alias("cents"))
    )
    ranked = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "day")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.where(
        F.col("r") == F.expr("CAST((n + 1) div 2 AS INT)")
    ).select(F.col("cents").alias("m"))
    signs = daily.crossJoin(F.broadcast(med)).select(
        "day",
        F.when(F.col("cents") > F.col("m"), 1).otherwise(0).alias("hi"),
    )
    wd = Window.orderBy("day")
    flips = signs.select(
        "hi",
        F.when(F.lag("hi").over(wd).isNull(), 1)
        .when(F.lag("hi").over(wd) != F.col("hi"), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    return flips.agg(
        F.sum("hi").cast("long").alias("n1"),
        F.sum(1 - F.col("hi")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("runs"),
    ).select("n1", "n2", "runs", F.expr(_RUNS_Z).alias("z_score"))


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test: week-over-week daily revenue change
# --------------------------------------------------------------------------

#: Tie-corrected z for W+ — unrounded shared tree over exact int64s
#: (wp_x2 = 2*W+, nz = nonzero-difference count, tie3 = sum t^3-t).
#: tie3 stays int64 here by STRUCTURE, not luck: the paired series has
#: one difference per day, so nz (and any tie group) is bounded by the
#: calendar horizon — tie3 <= nz^3 ~ 1e11 at 5,000 days, 7 orders of
#: magnitude inside int64 (contrast Mann-Whitney, whose per-value
#: counts grow with corpus size and needed the DECIMAL widening).
_WSR_Z = (
    "CASE WHEN nz = 0 THEN 0.0 ELSE"
    " (CAST(wp_x2 AS DOUBLE) / 2.0"
    "  - CAST(nz AS DOUBLE) * (nz + 1.0) / 4.0)"
    " / SQRT(CAST(nz AS DOUBLE) * (nz + 1.0) * (2.0 * nz + 1.0) / 24.0"
    "        - CAST(tie3 AS DOUBLE) / 48.0) + 0.0 END"
)


def _wsr_sql(big: str) -> str:
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_O_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    pos AS MATERIALIZED (
      SELECT day, cents,
             ROW_NUMBER() OVER (ORDER BY day) AS p
      FROM daily
    ),
    diffs AS MATERIALIZED (
      SELECT a.cents - b.cents AS d, ABS(a.cents - b.cents) AS ad
      FROM pos a JOIN pos b ON a.p = b.p + 7
      WHERE a.cents <> b.cents
    ),
    vals AS MATERIALIZED (
      SELECT ad, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_pos
      FROM diffs GROUP BY 1
    ),
    cum AS MATERIALIZED (
      SELECT ad, c, c_pos,
             COALESCE(SUM(c) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cp
      FROM vals
    )
    SELECT CAST(SUM(c) AS BIGINT) AS nz,
           CAST(SUM(c_pos) AS BIGINT) AS n_up,
           CAST(SUM(c_pos * (2 * cp + c + 1)) AS BIGINT) AS wp_x2,
           CAST(SUM(CAST(c AS {big}) * c * c - c) AS BIGINT) AS tie3,
           {_WSR_Z} AS z_score
    FROM cum
    """


@query("agg_wilcoxon_signed_rank", oracle=_wsr_sql("HUGEINT"))
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (1945, public literature) for a
    week-over-week shift in daily revenue: differences are each day
    minus the revenue 7 positions earlier, zero differences drop, the
    absolute differences rank with average-rank ties (the integer
    ``2*avg_rank`` lattice of ``agg_mann_whitney``), and ``W+`` sums
    the ranks of positive differences.  The tie-corrected z is one
    unrounded shared tree over exact int64 moments.

    Scale: day-keyed hash agg, a position self-join at lag 7, and a
    distinct-|difference| cumulative window — all day-count-sized."""
    big = "DECIMAL(38,0)"
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.sum(F.expr(_O_CENTS)).cast("long").alias("cents"))
    pos = daily.select(
        "cents", F.row_number().over(Window.orderBy("day")).alias("p")
    )
    b = pos.select(
        F.col("cents").alias("cents_b"), (F.col("p") + 7).alias("p")
    )
    diffs = (
        pos.join(b, "p")
        .where(F.col("cents") != F.col("cents_b"))
        .select(
            (F.col("cents") - F.col("cents_b")).alias("d"),
            F.abs(F.col("cents") - F.col("cents_b")).alias("ad"),
        )
    )
    vals = diffs.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("c_pos"),
    )
    wc = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "ad",
        "c",
        "c_pos",
        F.coalesce(F.sum("c").over(wc), F.lit(0)).alias("cp"),
    )
    return cum.agg(
        F.sum("c").cast("long").alias("nz"),
        F.sum("c_pos").cast("long").alias("n_up"),
        F.sum(F.col("c_pos") * (2 * F.col("cp") + F.col("c") + 1))
        .cast("long")
        .alias("wp_x2"),
        F.sum(F.expr(f"CAST(c AS {big}) * c * c - c"))
        .cast("long")
        .alias("tie3"),
    ).select("nz", "n_up", "wp_x2", "tie3", F.expr(_WSR_Z).alias("z_score"))
