"""Statistical tests pack 4 — drift detection for retrain gates.

A 100 TB corpus is re-ingested continuously; the pipeline needs
change/drift detectors that run as plain aggregations and hash
identically cross-engine:

- **Page-Hinkley** (Page 1954): the classic mean-shift detector —
  cumulative deviation from the mean minus its running minimum, alarm
  when the gap exceeds a threshold.  The offline form (deviations from
  the SERIES mean) is used so everything stays an exact integer after
  one scale-up by the day count; the online form just replaces the
  series mean with a running one.
- **Cramér-von Mises two-sample** (Cramér 1928; Anderson 1962 rank
  form): integrated squared ECDF distance — the whole-distribution
  complement to ``agg_ks_test``'s max-gap and ``agg_mann_whitney``'s
  location shift, computed on the same bounded-domain grouped-counts
  frame (50 distinct quantities), so the "integral" is a 50-row sum.
- **χ² homogeneity drift** (Pearson 1900): the categorical
  distribution-drift gate between two ingest epochs — the
  integer-exact cousin of the PSI score every retrain checklist
  carries (PSI needs ``ln``; the χ² statistic is a ratio of integer
  products, so it hashes bit-stable).

All statistics are exact integers or documented floor-divided fixed-
point values (the ``agg_mann_whitney`` convention: chained ``//``
mirrored term-for-term on both engines; Spark ``div`` on DECIMAL(38,0)
operands silently overflows through BIGINT, so wide divisions use the
``(x - x % n) / n`` idiom).

Reference parity: the reference engine (etl/main.go:1-485) has no
statistics surface; this extends SURVEY.md §2.B (robust statistics /
data-quality gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

_BIG = "DECIMAL(38,0)"
_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"

#: Page-Hinkley drift allowance delta (cents/day) and alarm threshold
#: lambda (cumulative cents).  Config constants, not data-derived.
_PH_DELTA_CENTS = 5_000
_PH_LAMBDA_CENTS = 100_000_000


@query(
    "window_page_hinkley",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT day, cents,
             row_number() OVER (ORDER BY day) AS t,
             SUM(CAST(cents AS HUGEINT)) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER () AS n,
             SUM(CAST(cents AS HUGEINT)) OVER () AS s
      FROM daily
    ),
    m AS MATERIALIZED (
      SELECT day, cents, n,
             n * cum - t * s - t * {_PH_DELTA_CENTS}::HUGEINT * n AS m_t
      FROM idx
    ),
    ph AS (
      SELECT day, cents, n, m_t,
             m_t - MIN(m_t) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS ph_scaled
      FROM m
    )
    SELECT day,
           cents AS day_cents,
           CAST(ph_scaled // n AS BIGINT) AS ph_cents,
           CAST(CASE WHEN ph_scaled // n > {_PH_LAMBDA_CENTS}
                     THEN 1 ELSE 0 END AS BIGINT) AS alarm
    FROM ph
    """,
)
def window_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-increase detector over the daily revenue
    series: ``M_t = sum_{{i<=t}}(x_i - mean - delta)`` scaled by the day
    count n so it stays integer (``n*cum_t - t*S - t*delta*n``), the
    running minimum of M, and the alarm flag when the gap exceeds
    lambda.  ``ph_cents`` is the gap floor-divided back to cents —
    non-negative, so truncation equals floor on both engines.

    Scale: one orders scan to day grain; the three windows (prefix sum,
    running min, global totals) run on the |days|-row frame regardless
    of corpus size."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(F.expr(_CENTS)).cast("long").alias("cents"))
    w_ord = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum(F.col("cents").cast(_BIG)).over(w_ord).alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum(F.col("cents").cast(_BIG)).over(w_all).alias("s"),
    )
    m = idx.select(
        "day",
        "cents",
        "n",
        F.expr(
            f"n * cum - t * s - CAST(t AS {_BIG})"
            f" * {_PH_DELTA_CENTS} * n"
        ).alias("m_t"),
    )
    ph = m.select(
        "day",
        "cents",
        "n",
        (
            F.col("m_t") - F.min("m_t").over(w_ord)
        ).alias("ph_scaled"),
    )
    # ph_scaled >= 0, so (x - x % n) / n == floor == DuckDB `//`
    return ph.select(
        "day",
        F.col("cents").alias("day_cents"),
        F.expr(
            "CAST((ph_scaled - ph_scaled % n) / n AS BIGINT)"
        ).alias("ph_cents"),
        F.expr(
            f"CAST(CASE WHEN (ph_scaled - ph_scaled % n) / n"
            f" > {_PH_LAMBDA_CENTS} THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("alarm"),
    )


@query(
    "agg_cvm_test",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c2
      FROM lineitem
      WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1
    ),
    cum AS (
      SELECT v, c1 + c2 AS c,
             SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS a,
             SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS b,
             SUM(c1) OVER () AS n1,
             SUM(c2) OVER () AS n2
      FROM pts
    ),
    contrib AS (
      SELECT n1, n2,
             CAST(c AS HUGEINT)
               * ((CAST(a AS HUGEINT) * n2 - CAST(b AS HUGEINT) * n1)
                  * (CAST(a AS HUGEINT) * n2 - CAST(b AS HUGEINT) * n1)
                  // ((n1 + n2) * (n1 + n2)))
               * 1000000 // (CAST(n1 AS HUGEINT) * n2) AS e6
      FROM cum
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n_accepted,
           CAST(MAX(n2) AS BIGINT) AS n_returned,
           CAST(SUM(e6) AS BIGINT) AS t_e6
    FROM contrib
    """,
)
def agg_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample statistic comparing the l_quantity
    distribution between accepted ('A') and returned ('R') line
    items, in the ECDF form
    ``T = (n*m/N^2) * sum over all N points of (F_n - G_m)^2`` — the
    integrated squared distance that is sensitive to the whole
    distribution where KS sees only the max gap.  Grouped-counts
    algebra: at each distinct value the contribution is
    ``c * (A*m - B*n)^2 / (n*m*N^2)`` with A/B the inclusive
    cumulative counts.  ``t_e6`` is the documented fixed-point
    convention: per-value chained floor divides (by N^2, then by n*m
    after the e6 scale-up), mirrored term-for-term in the oracle, so
    every intermediate fits DECIMAL(38,0) even at sf100.

    Scale: ONE bounded-domain hash agg (50 distinct quantities); all
    windows run on the 50-row frame."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag"
    )
    pts = (
        li.where(F.col("l_returnflag").isin("A", "R"))
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "A", 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("c2"),
        )
    )
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = pts.select(
        "v",
        (F.col("c1") + F.col("c2")).alias("c"),
        F.sum("c1").over(w_cum).alias("a"),
        F.sum("c2").over(w_cum).alias("b"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    contrib = (
        cum.select(
            "n1",
            "n2",
            F.col("c").cast(_BIG).alias("c"),
            F.expr(
                f"CAST(a AS {_BIG}) * n2 - CAST(b AS {_BIG}) * n1"
            ).alias("d"),
            F.expr(f"CAST(n1 + n2 AS {_BIG}) * (n1 + n2)").alias("nn2"),
        )
        # d^2 // N^2  (d^2 >= 0, so (x - x % n)/n == floor == `//`)
        .select(
            "n1",
            "n2",
            F.expr(
                "CAST(c * ((d * d - d * d % nn2) / nn2) * 1000000"
                f" AS {_BIG})"
            ).alias("ce6"),
        )
        # ... * 1e6 // (n*m), mirrored in the oracle
        .select(
            "n1",
            "n2",
            F.expr(
                f"""CAST((ce6 - ce6 % (CAST(n1 AS {_BIG}) * n2))
                         / (CAST(n1 AS {_BIG}) * n2) AS {_BIG})"""
            ).alias("e6"),
        )
    )
    return contrib.agg(
        F.max("n1").cast("long").alias("n_accepted"),
        F.max("n2").cast("long").alias("n_returned"),
        F.sum("e6").cast("long").alias("t_e6"),
    )


#: Epoch split date for the drift gate (mid-corpus; the TPC-H order
#: date domain is 1992-01-01 .. 1998-08-02).
_DRIFT_SPLIT = "1995-06-01"


@query(
    "profile_chi2_drift",
    oracle=f"""
    WITH cells AS (
      SELECT o_orderpriority AS bucket,
             SUM(CASE WHEN o_orderdate < DATE '{_DRIFT_SPLIT}'
                      THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN o_orderdate >= DATE '{_DRIFT_SPLIT}'
                      THEN 1 ELSE 0 END) AS b
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT SUM(a) AS na, SUM(b) AS nb FROM cells
    )
    SELECT c.bucket,
           CAST(c.a AS BIGINT) AS n_before,
           CAST(c.b AS BIGINT) AS n_after,
           CAST((CAST(c.a AS HUGEINT) * t.nb
                 - CAST(c.b AS HUGEINT) * t.na)
                * (CAST(c.a AS HUGEINT) * t.nb
                   - CAST(c.b AS HUGEINT) * t.na)
                * 1000000
                // (CAST(t.na AS HUGEINT) * t.nb * (c.a + c.b))
             AS BIGINT) AS chi2_contrib_e6
    FROM cells c CROSS JOIN tot t
    """,
)
def profile_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift gate between two ingest epochs: the exact
    per-bucket χ² homogeneity contribution for the order-priority mix
    before vs after the split date, via the 2xk identity
    ``(a*NB - b*NA)^2 / (NA*NB*(a+b))`` (both cells of a column folded
    into one integer ratio).  The retrain checklist's PSI row, made
    hash-stable: PSI needs ``ln``, χ² is integer products and one
    documented e6 floor division.

    Scale: one orders scan, a 5-bucket hash agg, a broadcast totals
    cross join.  The statistic's cell count is the category domain,
    never the corpus."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate"
    )
    before = F.when(
        F.col("o_orderdate") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1
    ).otherwise(0)
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("bucket")
    ).agg(
        F.sum(before).alias("a"),
        F.sum(1 - before).alias("b"),
    )
    tot = cells.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("a").cast("long").alias("n_before"),
        F.col("b").cast("long").alias("n_after"),
        F.expr(
            f"""CAST((
              (CAST(a AS {_BIG}) * nb - CAST(b AS {_BIG}) * na)
              * (CAST(a AS {_BIG}) * nb - CAST(b AS {_BIG}) * na)
              * 1000000
              - (CAST(a AS {_BIG}) * nb - CAST(b AS {_BIG}) * na)
                * (CAST(a AS {_BIG}) * nb - CAST(b AS {_BIG}) * na)
                * 1000000
                % (CAST(na AS {_BIG}) * nb * (a + b))
            ) / (CAST(na AS {_BIG}) * nb * (a + b)) AS BIGINT)"""
        ).alias("chi2_contrib_e6"),
    )
