"""Item-item collaborative filtering over order baskets — the
recommender family (Sarwar et al. 2001 / Linden et al. 2003, public
literature), built on the ``agg_basket_lift`` co-occurrence pair
machinery.

Similarity is co-occurrence cosine: ``sim(i, j) = n_ij /
sqrt(c_i * c_j)`` over basket sets.  The emitted score is the SQUARED
cosine in basis points — ``cos2_bp = 10000 * n_ij^2 div (c_i * c_j)``
— because squaring removes the sqrt: ranking by cos² is ranking by
cosine (both non-negative), and the whole model stays pure integer
arithmetic (SURVEY §7.6 rule 1), bit-exact under the driver hash.
Products run in DECIMAL(38,0)/HUGEINT: at 100 TB basket counts,
``n_ij² * 10^4`` clears int64 (~1e22) but sits far inside 38 digits.

Two queries:

* ``rec_item_neighbors`` — the item-item MODEL: per anchor item, its
  top similar items (the "customers who bought X also bought Y" table
  every retail surface serves).
* ``rec_user_items`` — the model APPLIED: for the heaviest customers,
  score unowned items by summing cos² over the customer's owned items
  (the standard item-based scoring rule), excluding what they already
  bought.

Scale: the pair table derives from the same capped per-basket
expansion as ``agg_basket_lift`` (quadratic in basket size, linear in
table size, keyed on order/part hash partitions); item counts are a
dimension-sized broadcast; anchors/customers are top-N selections
(TakeOrdered, never a global sort); the user-scoring join fans out
owned-items x their-neighbor-lists — bounded by the min-support model
size, the exact sparsity the item-item literature exploits.

Reference parity: no recommender surface exists in the reference
(etl/main.go); extends SURVEY.md §2.B's retail family (VERDICT r8
item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from concurrent_etl_go_spark.operators.lib import parallelize_narrow_scan
from concurrent_etl_go_spark.operators.registry import query, scoped_persist
from concurrent_etl_go_spark.sources.readers import read_table

_MIN_SUPPORT = 2  # minimum co-basket count for a pair to enter the model

_NBR_TOP = 5  # neighbors kept per anchor item
_ANCHORS = 20  # anchor items (most-ordered first)
_REC_CUSTS = 5  # customers recommended for (most orders first)
_REC_TOP = 3  # recommendations per customer
_NEXT_ANCHORS = 20  # source parts in the next-purchase table
_NEXT_TOP = 3  # next-part rows kept per source part

#: Shared oracle fragment: distinct basket membership, per-item counts,
#: and the symmetric cos²-scored pair model.
_MODEL_SQL = f"""
    li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item AS MATERIALIZED (
      SELECT l_partkey AS pk, COUNT(*) AS c FROM li GROUP BY 1
    ),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_SUPPORT}
    ),
    model AS MATERIALIZED (
      SELECT s.i, s.j, s.n_ab,
             CAST(CAST(s.n_ab AS HUGEINT) * s.n_ab * 10000
                  // (CAST(ci.c AS HUGEINT) * cj.c) AS BIGINT) AS cos2_bp
      FROM (
        SELECT pa AS i, pb AS j, n_ab FROM pairs
        UNION ALL
        SELECT pb AS i, pa AS j, n_ab FROM pairs
      ) s
      JOIN item ci ON ci.pk = s.i
      JOIN item cj ON cj.pk = s.j
    )"""


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) basket membership, derived
    FRESH per call from the lineitem parquet (no cross-run persistence
    — every bench/oracle invocation computes from the inputs).
    Scoped-persisted because most consumers read it more than once
    (self-joins, owned sets)."""
    return scoped_persist(
        parallelize_narrow_scan(
            read_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_partkey"
            ),
            "l_orderkey",
        ).distinct()
    )


def _derive_item(li: DataFrame) -> DataFrame:
    return li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("c")
    )


def _derive_model(li: DataFrame, item: DataFrame) -> DataFrame:
    """The symmetric item-item cosine² model plan — one basket
    self-join on the order key, min-support filter, integer
    basis-point scores."""
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _MIN_SUPPORT)
    )
    sym = pairs.select(
        F.col("pa").alias("i"), F.col("pb").alias("j"), "n_ab"
    ).unionAll(
        pairs.select(F.col("pb").alias("i"), F.col("pa").alias("j"), "n_ab")
    )
    ci = item.select(F.col("pk").alias("i"), F.col("c").alias("c_i"))
    cj = item.select(F.col("pk").alias("j"), F.col("c").alias("c_j"))
    return (
        sym.join(ci, "i")
        .join(cj, "j")
        .select(
            "i",
            "j",
            "n_ab",
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * n_ab * 10000"
                " div (CAST(c_i AS DECIMAL(38,0)) * c_j) AS BIGINT)"
            ).alias("cos2_bp"),
        )
    )


def _model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(model, li, item) where model = (i, j, n_ab, cos2_bp): the
    symmetric item-item cosine² model plus the intermediate frames it
    was built from — distinct basket membership ``li`` and per-item
    counts ``item`` — so callers derive anchors / owned sets from the
    SAME persisted relations instead of re-scanning lineitem and
    re-paying the distinct shuffle (VERDICT r9 advice).

    Derived FRESH per call from the parquet sources (no cross-run
    persistence, no driver-side memo — every bench/oracle invocation
    computes from the inputs); the item and model frames are
    scoped-persisted because consumers read them repeatedly (the model
    join is aliased per owned item, the item counts feed both cosine
    denominators)."""
    li = _baskets(spark, sf_dir)
    item = scoped_persist(_derive_item(li))
    model = scoped_persist(_derive_model(li, item))
    return model, li, item


@query(
    "rec_item_neighbors",
    oracle=f"""
    WITH {_MODEL_SQL},
    anchors AS MATERIALIZED (
      SELECT pk FROM item ORDER BY c DESC, pk LIMIT {_ANCHORS}
    )
    SELECT item, neighbor, n_ab, cos2_bp, nbr_rank FROM (
      SELECT m.i AS item, m.j AS neighbor, m.n_ab, m.cos2_bp,
             CAST(row_number() OVER (
               PARTITION BY m.i ORDER BY m.cos2_bp DESC, m.j
             ) AS BIGINT) AS nbr_rank
      FROM model m JOIN anchors an ON an.pk = m.i
    ) WHERE nbr_rank <= {_NBR_TOP}
    """,
)
def rec_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The item-item model's serving table: for each of the
    ``_ANCHORS`` most-ordered parts, the ``_NBR_TOP`` most similar
    parts by co-occurrence cosine² — "customers who bought X also
    bought Y", with the co-basket count and the integer score, ranked
    deterministically (score DESC, neighbor id).

    The anchor rule (most-ordered first, id tie-break) is derived from
    the data identically in both engines; the per-anchor window runs
    over the anchor's neighbor list only — model-sized, not
    corpus-sized.  Anchors come from the model's own persisted ``item``
    counts — no second lineitem scan or distinct shuffle."""
    model, _li, item = _model(spark, sf_dir)
    anchors = (
        item.orderBy(F.desc("c"), "pk")
        .limit(_ANCHORS)
        .select(F.col("pk").alias("i"))
    )
    w = Window.partitionBy("i").orderBy(F.desc("cos2_bp"), "j")
    return (
        model.join(F.broadcast(anchors), "i")
        .withColumn("nbr_rank", F.row_number().over(w).cast("long"))
        .where(F.col("nbr_rank") <= _NBR_TOP)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            "n_ab",
            "cos2_bp",
            "nbr_rank",
        )
    )


@query(
    "rec_user_items",
    oracle=f"""
    WITH {_MODEL_SQL},
    custs AS MATERIALIZED (
      SELECT o_custkey AS ck FROM orders
      GROUP BY 1 ORDER BY COUNT(*) DESC, ck LIMIT {_REC_CUSTS}
    ),
    owned AS MATERIALIZED (
      SELECT DISTINCT c.ck, l.l_partkey AS pk
      FROM custs c
      JOIN orders o ON o.o_custkey = c.ck
      JOIN li l ON l.l_orderkey = o.o_orderkey
    ),
    scored AS MATERIALIZED (
      SELECT w.ck, m.j AS item,
             CAST(COUNT(*) AS BIGINT) AS n_src,
             CAST(SUM(m.cos2_bp) AS BIGINT) AS score
      FROM owned w
      JOIN model m ON m.i = w.pk
      LEFT JOIN owned o2 ON o2.ck = w.ck AND o2.pk = m.j
      WHERE o2.pk IS NULL
      GROUP BY w.ck, m.j
    )
    SELECT ck AS custkey, item, n_src, score, rec_rank FROM (
      SELECT ck, item, n_src, score,
             CAST(row_number() OVER (
               PARTITION BY ck ORDER BY score DESC, item
             ) AS BIGINT) AS rec_rank
      FROM scored
    ) WHERE rec_rank <= {_REC_TOP}
    """,
)
def rec_user_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based recommendations for the ``_REC_CUSTS`` heaviest
    customers: every unowned part scored by the SUM of cos² similarity
    to the customer's owned parts (the standard item-based CF scoring
    rule — a neighbor reachable from several owned items accumulates
    several contributions), top ``_REC_TOP`` per customer by
    (score DESC, item id).

    Integer score: each contribution is an int64 basis-point value and
    the sum is order-independent, so no float discipline is needed.
    The customer rule (most orders, id tie-break) derives from the
    data.  Scale: owned-set x neighbor-list fan-out is bounded by the
    min-support model's sparsity; the anti-join against owned items
    keys on (customer, part).  The owned set reuses the model's
    persisted distinct-basket relation — no second lineitem scan."""
    return _user_recs(spark, sf_dir)


def _user_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rec_user_items plan, shared verbatim with the coverage
    readout (``rec_coverage``) so both provably score the same lists."""
    model, li, _item = _model(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    custs = (
        orders.groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "ck")
        .limit(_REC_CUSTS)
        .select("ck")
    )
    owned = scoped_persist(
        custs.join(orders, custs["ck"] == orders["o_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .select("ck", F.col("l_partkey").alias("pk"))
        .distinct()
    )
    scored = (
        owned.join(model, owned["pk"] == model["i"])
        .join(
            owned.select("ck", F.col("pk").alias("j")),
            ["ck", "j"],
            "left_anti",
        )
        .groupBy("ck", F.col("j").alias("item"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_src"),
            F.sum("cos2_bp").cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("ck").orderBy(F.desc("score"), "item")
    return (
        scored.withColumn("rec_rank", F.row_number().over(w).cast("long"))
        .where(F.col("rec_rank") <= _REC_TOP)
        .select(
            F.col("ck").alias("custkey"),
            "item",
            "n_src",
            "score",
            "rec_rank",
        )
    )


@query(
    "rec_next_part",
    oracle=f"""
    WITH seq AS MATERIALIZED (
      SELECT o_custkey AS ck, o_orderkey AS okey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    trans AS MATERIALIZED (
      SELECT a.l_partkey AS src_part, b.l_partkey AS next_part,
             COUNT(*) AS n_trans
      FROM seq s1
      JOIN seq s2 ON s2.ck = s1.ck AND s2.rn = s1.rn + 1
      JOIN li a ON a.l_orderkey = s1.okey
      JOIN li b ON b.l_orderkey = s2.okey
      WHERE a.l_partkey != b.l_partkey
      GROUP BY 1, 2
    ),
    anchors AS MATERIALIZED (
      SELECT src_part FROM trans
      GROUP BY 1 ORDER BY SUM(n_trans) DESC, src_part
      LIMIT {_NEXT_ANCHORS}
    )
    SELECT src_part, next_part, n_trans, nxt_rank FROM (
      SELECT t.src_part, t.next_part, CAST(t.n_trans AS BIGINT) AS n_trans,
             CAST(row_number() OVER (
               PARTITION BY t.src_part
               ORDER BY t.n_trans DESC, t.next_part
             ) AS BIGINT) AS nxt_rank
      FROM trans t JOIN anchors an ON an.src_part = t.src_part
    ) WHERE nxt_rank <= {_NEXT_TOP}
    """,
)
def rec_next_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential next-purchase table: for each anchor part, the parts
    most often bought in the customer's NEXT order (consecutive orders
    by date, first-order Markov transition over baskets) — the
    "bought X, next time bought Y" signal that is directional and
    temporal where ``rec_item_neighbors``' co-occurrence cosine is
    symmetric and order-free.  Anchors are the sources with the most
    outgoing transitions (derived rule), top ``_NEXT_TOP`` successors
    each by (count DESC, part id).

    Scale: the order-sequence window partitions by customer (per-group
    rows = that customer's orders); consecutive-pair expansion is one
    equi-join on (customer, seq+1); the basket x basket fan-out is
    bounded by basket-size² (~16 rows per order pair, independent of
    table size); transition counts shuffle once on the (src, next)
    pair key.  Pure integer counts — no float discipline needed.

    The transition table is derived FRESH per call from the parquet
    sources (no cross-run persistence — every bench/oracle invocation
    computes from the inputs) and scoped-persisted for the two reads
    below (anchor selection + the ranked join)."""
    trans = scoped_persist(_derive_trans(spark, sf_dir))
    anchors = (
        trans.groupBy("src_part")
        .agg(F.sum("n_trans").alias("out"))
        .orderBy(F.desc("out"), "src_part")
        .limit(_NEXT_ANCHORS)
        .select("src_part")
    )
    w = Window.partitionBy("src_part").orderBy(
        F.desc("n_trans"), "next_part"
    )
    return (
        trans.join(F.broadcast(anchors), "src_part")
        .withColumn("nxt_rank", F.row_number().over(w).cast("long"))
        .where(F.col("nxt_rank") <= _NEXT_TOP)
        .select(
            "src_part",
            "next_part",
            F.col("n_trans").cast("long").alias("n_trans"),
            "nxt_rank",
        )
    )


def _derive_trans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (src_part, next_part, n_trans) Markov transition plan:
    per-customer order sequencing, consecutive-pair equi-join, basket x
    basket expansion, one pair-keyed count shuffle."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w_seq = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("okey"),
        F.row_number().over(w_seq).alias("rn"),
    )
    li = _baskets(spark, sf_dir)
    s1 = seq.alias("s1")
    s2 = seq.select(
        F.col("ck"), (F.col("rn") - 1).alias("rn"),
        F.col("okey").alias("okey2"),
    ).alias("s2")
    pairs = s1.join(s2, ["ck", "rn"])
    a = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("src_part")
    )
    b = li.select(
        F.col("l_orderkey").alias("okey2"),
        F.col("l_partkey").alias("next_part"),
    )
    return (
        pairs.join(a, "okey")
        .join(b, "okey2")
        .where(F.col("src_part") != F.col("next_part"))
        .groupBy("src_part", "next_part")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )


_NBA_TOP = 3  # next-best-action rows kept per RFM segment

#: The agg_customer_rfm segmentation rule (operators/retail.py), as an
#: oracle fragment: per customer, the 3-digit RFM code.
_RFM_SQL = """
    rfm AS MATERIALIZED (
      SELECT ck,
             (CASE WHEN recency_days <= 180 THEN 3
                   WHEN recency_days <= 720 THEN 2 ELSE 1 END) * 100
             + (CASE WHEN frequency >= 20 THEN 3
                     WHEN frequency >= 10 THEN 2 ELSE 1 END) * 10
             + (CASE WHEN monetary >= 2000000 THEN 3
                     WHEN monetary >= 1000000 THEN 2 ELSE 1 END)
               AS rfm_code
      FROM (
        SELECT o_custkey AS ck,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         DATE '1998-08-03') AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 2) + 0.0 AS monetary
        FROM orders GROUP BY 1
      )
    )"""


@query(
    "rec_rfm_next_action",
    oracle=f"""
    WITH {_MODEL_SQL},
    {_RFM_SQL},
    owned AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS ck, l.l_partkey AS pk
      FROM orders o JOIN li l ON l.l_orderkey = o.o_orderkey
    ),
    scored AS MATERIALIZED (
      SELECT r.rfm_code, m.j AS item,
             CAST(COUNT(*) AS BIGINT) AS n_src,
             CAST(SUM(m.cos2_bp) AS BIGINT) AS score
      FROM owned w
      JOIN rfm r ON r.ck = w.ck
      JOIN model m ON m.i = w.pk
      GROUP BY 1, 2
    )
    SELECT rfm_code, item, n_src, score, rec_rank FROM (
      SELECT rfm_code, item, n_src, score,
             CAST(row_number() OVER (
               PARTITION BY rfm_code ORDER BY score DESC, item
             ) AS BIGINT) AS rec_rank
      FROM scored
    ) WHERE rec_rank <= {_NBA_TOP}
    """,
)
def rec_rfm_next_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM-segment next-best-action table (VERDICT r9 item 6): compose
    the ``agg_customer_rfm`` segmentation with the item-item cosine²
    model — for each 3-digit RFM code, the ``_NBA_TOP`` items whose
    summed similarity to the segment's owned items is highest.  The
    composition proof that the recommender and the segmentation share
    one plan: segment membership comes from the REGISTERED rfm query's
    own DataFrame, the model from ``_model``'s persisted frames.

    Segment-level scoring (not per-customer) is the campaign-planning
    shape — "what do we feature to lapsed big spenders (code 1x3)" —
    and keeps the output a 27-segment dimension table.  All integers:
    the cos² model is integer basis points, scores are integer sums,
    ranking is (score DESC, item id).

    Scale: owned is one distinct (customer, part) projection; the
    model fan-out is bounded by min-support sparsity exactly as
    ``rec_user_items``; the final agg keys on (segment, item) — 27 x
    |parts| at most.  The segmentation is a customer-dimension hash
    agg joined on the customer key."""
    from concurrent_etl_go_spark.operators.retail import agg_customer_rfm

    model, li, _item = _model(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    owned = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    seg = agg_customer_rfm(spark, sf_dir).select(
        F.col("custkey").alias("ck"), "rfm_code"
    )
    scored = (
        owned.join(seg, "ck")
        .join(model, F.col("pk") == model["i"])
        .groupBy("rfm_code", F.col("j").alias("item"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_src"),
            F.sum("cos2_bp").cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("rfm_code").orderBy(F.desc("score"), "item")
    return (
        scored.withColumn("rec_rank", F.row_number().over(w).cast("long"))
        .where(F.col("rec_rank") <= _NBA_TOP)
        .select("rfm_code", "item", "n_src", "score", "rec_rank")
    )


_EVAL_CUSTS = 20  # leave-last-basket-out evaluation customers
_EVAL_K = 5  # recommendations scored per customer


def _eval_split(
    spark: SparkSession, orders: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(custs, held): the deterministic leave-last-basket-out split —
    the ``_EVAL_CUSTS`` heaviest multi-order customers and each one's
    last order key ((date DESC, key DESC) argmax)."""
    custs = (
        orders.groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .orderBy(F.desc("n"), "ck")
        .limit(_EVAL_CUSTS)
        .select("ck")
    )
    w_last = Window.partitionBy("ck").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    held = (
        custs.join(orders, custs["ck"] == orders["o_custkey"])
        .withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("ck", F.col("o_orderkey").alias("held_okey"))
    )
    return custs, held


@query(
    "rec_eval_hit_rate",
    oracle=f"""
    WITH custs AS MATERIALIZED (
      SELECT o_custkey AS ck FROM orders
      GROUP BY 1 HAVING COUNT(*) >= 2
      ORDER BY COUNT(*) DESC, ck LIMIT {_EVAL_CUSTS}
    ),
    held AS MATERIALIZED (
      SELECT ck, o_orderkey AS held_okey FROM (
        SELECT c.ck, o.o_orderkey,
               row_number() OVER (PARTITION BY c.ck
                                  ORDER BY o.o_orderdate DESC,
                                           o.o_orderkey DESC) AS rn
        FROM custs c JOIN orders o ON o.o_custkey = c.ck
      ) WHERE rn = 1
    ),
    li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    train AS MATERIALIZED (
      SELECT l.l_orderkey, l.l_partkey FROM li l
      LEFT JOIN held h ON h.held_okey = l.l_orderkey
      WHERE h.held_okey IS NULL
    ),
    item AS MATERIALIZED (
      SELECT l_partkey AS pk, COUNT(*) AS c FROM train GROUP BY 1
    ),
    pairs AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
      FROM train a
      JOIN train b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_SUPPORT}
    ),
    model AS MATERIALIZED (
      SELECT s.i, s.j,
             CAST(CAST(s.n_ab AS HUGEINT) * s.n_ab * 10000
                  // (CAST(ci.c AS HUGEINT) * cj.c) AS BIGINT) AS cos2_bp
      FROM (
        SELECT pa AS i, pb AS j, n_ab FROM pairs
        UNION ALL
        SELECT pb AS i, pa AS j, n_ab FROM pairs
      ) s
      JOIN item ci ON ci.pk = s.i
      JOIN item cj ON cj.pk = s.j
    ),
    owned AS MATERIALIZED (
      SELECT DISTINCT c.ck, t.l_partkey AS pk
      FROM custs c
      JOIN orders o ON o.o_custkey = c.ck
      JOIN train t ON t.l_orderkey = o.o_orderkey
    ),
    recs AS MATERIALIZED (
      SELECT ck, item FROM (
        SELECT w.ck, m.j AS item,
               row_number() OVER (
                 PARTITION BY w.ck
                 ORDER BY SUM(m.cos2_bp) DESC, m.j
               ) AS rn
        FROM owned w
        JOIN model m ON m.i = w.pk
        LEFT JOIN owned o2 ON o2.ck = w.ck AND o2.pk = m.j
        WHERE o2.pk IS NULL
        GROUP BY w.ck, m.j
      ) WHERE rn <= {_EVAL_K}
    ),
    test AS MATERIALIZED (
      SELECT h.ck, l.l_partkey AS pk
      FROM held h JOIN li l ON l.l_orderkey = h.held_okey
    )
    SELECT h.ck AS custkey,
           CAST((SELECT COUNT(*) FROM test t WHERE t.ck = h.ck)
                AS BIGINT) AS n_test,
           CAST(COUNT(t2.pk) AS BIGINT) AS hits,
           CAST(COUNT(t2.pk) * 10000 // {_EVAL_K} AS BIGINT) AS prec_bp,
           CAST(CASE WHEN COUNT(t2.pk) > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS hit_flag
    FROM held h
    LEFT JOIN recs r ON r.ck = h.ck
    LEFT JOIN test t2 ON t2.ck = r.ck AND t2.pk = r.item
    GROUP BY h.ck
    """,
)
def rec_eval_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-last-basket-out evaluation of the item-item recommender
    (the standard offline CF protocol): for the ``_EVAL_CUSTS``
    heaviest multi-order customers, hold out each one's LAST order,
    rebuild the cosine² model on everything else, recommend top
    ``_EVAL_K`` unowned items, and score hits against the held-out
    basket — precision@k in basis points plus the hit flag, per
    customer.  The recommender family's analogue of the retrieval
    family's ``search_eval_*``: the model's usefulness measured, not
    claimed, under the driver hash.

    All integers (counts, the cos² model, floor-divided precision);
    held-out selection is a deterministic (date DESC, key DESC)
    argmax.  Scale: the train-set model is the ``_model`` plan with
    one extra anti-join on the held-out order keys (a broadcast-sized
    list); evaluation joins touch |custs| x k rows.

    The train-set model is derived FRESH per call (no cross-run
    persistence, no driver memo — every bench/oracle invocation
    computes from the inputs); the held/owned/test frames stay inline
    — they are panel-sized."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    custs, held = _eval_split(spark, orders)
    held = scoped_persist(held)
    li = _baskets(spark, sf_dir)
    train = scoped_persist(
        li.join(
            F.broadcast(held.select(F.col("held_okey").alias("l_orderkey"))),
            "l_orderkey",
            "left_anti",
        )
    )
    model = scoped_persist(
        _derive_model(train, scoped_persist(_derive_item(train))).drop("n_ab")
    )
    owned = scoped_persist(
        custs.join(orders, custs["ck"] == orders["o_custkey"])
        .join(train, F.col("o_orderkey") == train["l_orderkey"])
        .select("ck", F.col("l_partkey").alias("pk"))
        .distinct()
    )
    scored = (
        owned.join(model, owned["pk"] == model["i"])
        .join(
            owned.select("ck", F.col("pk").alias("j")),
            ["ck", "j"],
            "left_anti",
        )
        .groupBy("ck", F.col("j").alias("item"))
        .agg(F.sum("cos2_bp").alias("score"))
    )
    w_rec = Window.partitionBy("ck").orderBy(F.desc("score"), "item")
    recs = (
        scored.withColumn("rn", F.row_number().over(w_rec))
        .where(F.col("rn") <= _EVAL_K)
        .select("ck", F.col("item").alias("pk"))
    )
    test = held.join(
        li, held["held_okey"] == li["l_orderkey"]
    ).select("ck", F.col("l_partkey").alias("pk"))
    test = scoped_persist(test)
    n_test = test.groupBy("ck").agg(
        F.count(F.lit(1)).cast("long").alias("n_test")
    )
    hits = (
        recs.join(test, ["ck", "pk"], "left_semi")
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        held.select("ck")
        .join(n_test, "ck", "left")
        .join(hits, "ck", "left")
        .select(
            F.col("ck").alias("custkey"),
            F.coalesce(F.col("n_test"), F.lit(0))
            .cast("long")
            .alias("n_test"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.expr(
                f"CAST(coalesce(hits, 0) * 10000 div {_EVAL_K} AS BIGINT)"
            ).alias("prec_bp"),
            F.when(F.coalesce(F.col("hits"), F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("hit_flag"),
        )
    )


@query(
    "rec_coverage",
    oracle=f"""
    WITH {_MODEL_SQL},
    custs AS MATERIALIZED (
      SELECT o_custkey AS ck FROM orders
      GROUP BY 1 ORDER BY COUNT(*) DESC, ck LIMIT {_REC_CUSTS}
    ),
    owned AS MATERIALIZED (
      SELECT DISTINCT c.ck, l.l_partkey AS pk
      FROM custs c
      JOIN orders o ON o.o_custkey = c.ck
      JOIN li l ON l.l_orderkey = o.o_orderkey
    ),
    scored AS MATERIALIZED (
      SELECT w.ck, m.j AS item,
             CAST(SUM(m.cos2_bp) AS BIGINT) AS score
      FROM owned w
      JOIN model m ON m.i = w.pk
      LEFT JOIN owned o2 ON o2.ck = w.ck AND o2.pk = m.j
      WHERE o2.pk IS NULL
      GROUP BY w.ck, m.j
    ),
    recs AS MATERIALIZED (
      SELECT ck, item FROM (
        SELECT ck, item,
               row_number() OVER (
                 PARTITION BY ck ORDER BY score DESC, item
               ) AS rec_rank
        FROM scored
      ) WHERE rec_rank <= {_REC_TOP}
    ),
    expo AS MATERIALIZED (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS slots
      FROM recs GROUP BY 1
    ),
    ranked AS MATERIALIZED (
      SELECT item, slots,
             ROW_NUMBER() OVER (ORDER BY slots DESC, item) AS rk
      FROM expo
    ),
    sizes AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(COALESCE(SUM(slots), 0) AS BIGINT) AS n_slots
      FROM expo
    ),
    cat AS (SELECT CAST(COUNT(*) AS BIGINT) AS catalog_parts FROM part),
    users AS (
      SELECT CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_users FROM recs
    ),
    topd AS (
      SELECT CAST(COALESCE(SUM(slots), 0) AS BIGINT) AS top_slots
      FROM ranked CROSS JOIN sizes
      WHERE rk <= (n_items + 9) // 10
    )
    SELECT n_users, n_slots, n_items, catalog_parts,
           CASE WHEN catalog_parts = 0 THEN 0 ELSE
             CAST(n_items * 1000000 // catalog_parts AS BIGINT) END
             AS coverage_e6,
           CASE WHEN n_slots = 0 THEN 0 ELSE
             CAST(top_slots * 1000000 // n_slots AS BIGINT) END
             AS top_decile_share_e6
    FROM sizes CROSS JOIN cat CROSS JOIN users CROSS JOIN topd
    """,
)
def rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage and exposure concentration of the
    recommendation lists (Ge, Delgado-Battenfeld & Jannach 2010
    framing, public literature): how much of the part catalog the
    top-{_REC_TOP} lists for the {_REC_CUSTS}-customer panel actually
    surface, and what share of all recommendation slots the
    top-decile most-recommended items absorb — the beyond-accuracy
    health metrics every recommender platform tracks beside hit rate.

    Shares are exact integer millionths.  Scale: rides the SAME
    persisted plan as ``rec_user_items`` (one extra item-keyed agg and
    a <=panel*k-row window)."""
    recs = scoped_persist(
        _user_recs(spark, sf_dir).select("custkey", "item")
    )
    expo = scoped_persist(
        recs.groupBy("item").agg(
            F.count(F.lit(1)).cast("long").alias("slots")
        )
    )
    ranked = expo.select(
        "item",
        "slots",
        F.row_number()
        .over(Window.orderBy(F.desc("slots"), "item"))
        .alias("rk"),
    )
    sizes = expo.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(F.sum("slots"), F.lit(0)).cast("long").alias("n_slots"),
    )
    cat = (
        read_table(spark, sf_dir, "part")
        .agg(F.count(F.lit(1)).cast("long").alias("catalog_parts"))
    )
    users = recs.agg(
        F.countDistinct("custkey").cast("long").alias("n_users")
    )
    topd = (
        ranked.crossJoin(F.broadcast(sizes))
        .where(F.expr("rk <= (n_items + 9) div 10"))
        .agg(
            F.coalesce(F.sum("slots"), F.lit(0))
            .cast("long")
            .alias("top_slots")
        )
    )
    return (
        sizes.crossJoin(F.broadcast(cat))
        .crossJoin(F.broadcast(users))
        .crossJoin(F.broadcast(topd))
        .select(
            "n_users",
            "n_slots",
            "n_items",
            "catalog_parts",
            F.expr(
                "CASE WHEN catalog_parts = 0 THEN 0 ELSE"
                " CAST(n_items * 1000000 div catalog_parts AS BIGINT) END"
            ).alias("coverage_e6"),
            F.expr(
                "CASE WHEN n_slots = 0 THEN 0 ELSE"
                " CAST(top_slots * 1000000 div n_slots AS BIGINT) END"
            ).alias("top_decile_share_e6"),
        )
    )


#: Shared oracle fragment: the rec_user_items panel lists (custs ->
#: owned -> scored -> recs), verbatim from the rec_coverage oracle so
#: every beyond-accuracy metric provably scores the same lists.
_RECS_SQL = f"""
    custs AS MATERIALIZED (
      SELECT o_custkey AS ck FROM orders
      GROUP BY 1 ORDER BY COUNT(*) DESC, ck LIMIT {_REC_CUSTS}
    ),
    owned AS MATERIALIZED (
      SELECT DISTINCT c.ck, l.l_partkey AS pk
      FROM custs c
      JOIN orders o ON o.o_custkey = c.ck
      JOIN li l ON l.l_orderkey = o.o_orderkey
    ),
    scored AS MATERIALIZED (
      SELECT w.ck, m.j AS item,
             CAST(SUM(m.cos2_bp) AS BIGINT) AS score
      FROM owned w
      JOIN model m ON m.i = w.pk
      LEFT JOIN owned o2 ON o2.ck = w.ck AND o2.pk = m.j
      WHERE o2.pk IS NULL
      GROUP BY w.ck, m.j
    ),
    recs AS MATERIALIZED (
      SELECT ck, item FROM (
        SELECT ck, item,
               row_number() OVER (
                 PARTITION BY ck ORDER BY score DESC, item
               ) AS rec_rank
        FROM scored
      ) WHERE rec_rank <= {_REC_TOP}
    )"""


@query(
    "rec_novelty_epc",
    oracle=f"""
    WITH {_MODEL_SQL},
    {_RECS_SQL},
    ranked AS MATERIALIZED (
      SELECT pk,
             row_number() OVER (ORDER BY c DESC, pk) AS r,
             COUNT(*) OVER () AS n_items
      FROM item
    )
    SELECT r.ck AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_recs,
           CAST(SUM((rk.r - 1) * 1000000 // (rk.n_items - 1))
                // COUNT(*) AS BIGINT) AS mean_novelty_e6
    FROM recs r JOIN ranked rk ON rk.pk = r.item
    GROUP BY r.ck
    """,
)
def rec_novelty_epc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based novelty of each customer's recommendation list (the
    integer-exact expected-popularity-complement variant of Vargas &
    Castells 2011): every catalog item gets a popularity rank
    (order-count DESC, id tie-break); a recommended item's novelty is
    its normalized rank position in millionths — 0 for the most
    popular item, 1e6 for the rarest — and the readout is the
    floor-mean per customer.  Popular-item echo chambers score near 0;
    long-tail explorers near 1e6.  Complements ``rec_coverage``'s
    catalog-level concentration with a per-user readout.

    Scale: rides the SAME persisted plan as ``rec_user_items`` plus a
    part-dimension rank window and a panel*k-row join."""
    model, _li, item = _model(spark, sf_dir)
    recs = scoped_persist(
        _user_recs(spark, sf_dir).select("custkey", "item")
    )
    w_all = Window.orderBy(F.desc("c"), "pk").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = item.select(
        "pk",
        F.row_number().over(Window.orderBy(F.desc("c"), "pk")).alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n_items"),
    )
    return (
        recs.join(ranked, recs["item"] == ranked["pk"])
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_recs"),
            F.expr(
                "CAST(SUM((CAST(r AS BIGINT) - 1) * 1000000"
                " div (n_items - 1)) div COUNT(*) AS BIGINT)"
            ).alias("mean_novelty_e6"),
        )
    )


@query(
    "rec_intra_list_diversity",
    oracle=f"""
    WITH {_MODEL_SQL},
    {_RECS_SQL}
    SELECT r1.ck AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(10000 - COALESCE(m.cos2_bp, 0)) // COUNT(*)
             AS BIGINT) AS ild_e4
    FROM recs r1
    JOIN recs r2 ON r2.ck = r1.ck AND r1.item < r2.item
    LEFT JOIN model m ON m.i = r1.item AND m.j = r2.item
    GROUP BY r1.ck
    """,
)
def rec_intra_list_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-list diversity (Ziegler et al. 2005): the floor-mean
    pairwise DISSIMILARITY ``1e4 - cos2_bp`` inside each customer's
    top-{_REC_TOP} list, using the same item-item cosine² model the
    recommendations were scored with.  A list of three accessories for
    one product scores near 0; three unrelated departments near 1e4.
    Item pairs absent from the min-support model have no co-purchase
    evidence and count as fully dissimilar (COALESCE 0) — the standard
    sparse-model convention.  Customers with a single recommendation
    have no pairs and are out of scope (pair self-join).

    Scale: the pair fan-out is panel * C(k,2) rows (k={_REC_TOP});
    everything else rides the persisted model/recs frames."""
    model, _li, _item = _model(spark, sf_dir)
    recs = scoped_persist(
        _user_recs(spark, sf_dir).select("custkey", "item")
    )
    r1 = recs.alias("r1")
    r2 = recs.select(
        F.col("custkey"), F.col("item").alias("item2")
    ).alias("r2")
    pairs = r1.join(
        r2,
        (F.col("r1.custkey") == F.col("r2.custkey"))
        & (F.col("r1.item") < F.col("item2")),
    )
    m = model.select(
        F.col("i").alias("item"),
        F.col("j").alias("item2"),
        "cos2_bp",
    )
    return (
        pairs.join(m, ["item", "item2"], "left")
        .groupBy(F.col("r1.custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.expr(
                "CAST(SUM(10000 - COALESCE(cos2_bp, 0)) div COUNT(*)"
                " AS BIGINT)"
            ).alias("ild_e4"),
        )
    )
