"""Revenue-concentration decomposition: the Theil index split into
within-nation and between-nation components.

The Theil T index (Theil 1967; Shorrocks 1980 for the decomposition —
public literature) is the entropy-based inequality measure whose
defining property the Lorenz/Pareto family (``agg_revenue_lorenz``,
``agg_pareto_share``) lacks: it decomposes ADDITIVELY over a partition,

    T = sum_g s_g * T_g  +  sum_g s_g * ln(mu_g / mu)
        \\_____within____/   \\_______between________/

where s_g is group g's revenue share, mu_g its mean customer revenue,
and T_g the index computed inside the group.  "How much of the revenue
inequality lives INSIDE nations vs BETWEEN them" is the exact question
a concentration dashboard asks next after the Lorenz curve.

Cross-engine float discipline (SURVEY §7.6): customer revenue is exact
integer CENTS (the forecast-family convention); every ratio fed to
``ln`` is a shared-text expression over those integers (the
``profile_column_entropy`` / ``text_distinctive_terms`` pinned-ln
idiom), per-group sums of transcendental terms carry ~1e-14
summation-order jitter absorbed by ROUND(4) + 0.0, and the revenue
share is an exact integer floor division in DECIMAL(38,0)/HUGEINT.

Reference parity: no analytics surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's concentration family
(VERDICT r9 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.registry import query
from concurrent_etl_go_spark.sources.readers import read_table

#: Exact integer cents for a customer's lifetime revenue.
_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"

#: Shared float fragments over exact integer columns (cents = customer
#: revenue, rev_g/n_g = group totals, rev_t/n_t = grand totals).
#: x/mu_g == cents * n_g / rev_g; all operands promote to DOUBLE in the
#: same order on both engines.
_TERM = (
    "(CAST(cents AS DOUBLE) * n_g / rev_g)"
    " * ln(CAST(cents AS DOUBLE) * n_g / rev_g)"
)
_BETWEEN = (
    "ROUND((CAST(rev_g AS DOUBLE) / rev_t)"
    " * ln(CAST(rev_g AS DOUBLE) * n_t"
    " / (CAST(rev_t AS DOUBLE) * n_g)), 4) + 0.0"
)


@query(
    "agg_theil_decomposition",
    oracle=f"""
    WITH cust AS MATERIALIZED (
      SELECT o.o_custkey AS custkey, n.n_name AS nation,
             SUM({_CENTS}) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    grp AS MATERIALIZED (
      SELECT nation, COUNT(*) AS n_g, SUM(cents) AS rev_g
      FROM cust GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n_g) AS n_t, SUM(rev_g) AS rev_t FROM grp
    ),
    terms AS MATERIALIZED (
      SELECT c.nation, g.n_g, g.rev_g, t.n_t, t.rev_t,
             {_TERM} AS term
      FROM cust c
      JOIN grp g ON g.nation = c.nation
      CROSS JOIN tot t
    )
    SELECT nation,
           CAST(n_g AS BIGINT) AS n_cust,
           CAST(rev_g AS BIGINT) AS rev_cents,
           CAST(CAST(rev_g AS HUGEINT) * 10000 // rev_t AS BIGINT)
             AS share_bp,
           ROUND(SUM(term) / n_g, 4) + 0.0 AS t_within,
           {_BETWEEN} AS between_term
    FROM terms
    GROUP BY nation, n_g, rev_g, n_t, rev_t
    """,
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Theil decomposition of customer-revenue inequality:
    each nation's customer count, exact revenue cents, revenue share in
    basis points, WITHIN-nation Theil index, and its BETWEEN-nation
    term ``s_g * ln(mu_g / mu)``.  The global index is
    ``sum(share * t_within) + sum(between_term)`` — the additive
    identity a pytest asserts to 1e-6 (it cannot be recomposed exactly
    from the rounded emissions, so the parts are the hash surface).

    Customers with no orders are excluded by construction (the index is
    defined over positive incomes; ln(0) is undefined) — the orders
    scan, not the customer table, drives membership.

    Scale: one orders scan → customer-keyed hash agg (integer cents) →
    nation-keyed agg (25 rows) → one broadcast of the 25-row dimension
    back onto customers for the per-row entropy term → nation-keyed
    float sum.  Two shuffles total, both on natural keys; no window,
    no sort; the grand total is a broadcast scalar."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust_dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    cust = (
        orders.join(
            F.broadcast(cust_dim),
            orders["o_custkey"] == cust_dim["c_custkey"],
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("o_custkey").alias("custkey"), "nation")
        .agg(F.sum(F.expr(_CENTS)).alias("cents"))
    )
    grp = cust.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("rev_g")
    )
    tot = grp.agg(
        F.sum("n_g").alias("n_t"), F.sum("rev_g").alias("rev_t")
    )
    terms = (
        cust.join(F.broadcast(grp), "nation")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation", "n_g", "rev_g", "n_t", "rev_t",
            F.expr(_TERM).alias("term"),
        )
    )
    return terms.groupBy("nation", "n_g", "rev_g", "n_t", "rev_t").agg(
        F.sum("term").alias("sum_term")
    ).select(
        "nation",
        F.col("n_g").cast("long").alias("n_cust"),
        F.col("rev_g").cast("long").alias("rev_cents"),
        F.expr(
            "CAST(CAST(rev_g AS DECIMAL(38,0)) * 10000"
            " div rev_t AS BIGINT)"
        ).alias("share_bp"),
        F.expr("ROUND(sum_term / n_g, 4) + 0.0").alias("t_within"),
        F.expr(_BETWEEN).alias("between_term"),
    )
