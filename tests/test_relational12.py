"""Invariants for relational pack 12 (funnel latency, position-based
attribution, column entropy, integer WMA)."""

from __future__ import annotations

import math

from concurrent_etl_go_spark.operators.relational12 import (
    _ENTROPY_COLS,
    agg_funnel_latency,
    join_attribution_position,
    profile_column_entropy,
    window_wma,
)


def test_funnel_latency_shares_total(spark, sf_dir):
    rows = agg_funnel_latency(spark, sf_dir).collect()
    assert rows
    assert sum(r.n_users for r in rows) > 0
    # shares are basis points of the conversion total; floor division
    # loses at most (bands - 1) bp
    total_bp = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) < total_bp <= 10000
    orders = {r.band: r.band_order for r in rows}
    assert len(set(orders.values())) == len(orders)


def test_position_attribution_credit_conserved(spark, sf_dir):
    from pyspark.sql import functions as F

    from concurrent_etl_go_spark.sources.readers import read_table

    rows = join_attribution_position(spark, sf_dir).collect()
    assert {r.event_type for r in rows} <= {"view", "click"}
    total_credit = sum(r.credit_bp for r in rows)
    # every attributed conversion hands out <= 10000 bp (floor loss on
    # the middle split only); conversions with zero prior touches hand
    # out nothing — so total credit <= 10000 * attributed conversions
    ev = read_table(spark, sf_dir, "events")
    n_conv = ev.where(F.col("event_type") == "purchase").count()
    assert 0 < total_credit <= 10000 * n_conv


def test_entropy_bounds(spark, sf_dir):
    rows = {r.column_name: r for r in profile_column_entropy(
        spark, sf_dir).collect()}
    assert set(rows) == {label for label, _, _ in _ENTROPY_COLS}
    for r in rows.values():
        assert r.n_distinct >= 1 and r.n_rows >= r.n_distinct
        # 0 <= H <= ln(k), within the emission rounding
        assert -1e-4 <= r.entropy <= math.log(r.n_distinct) + 1e-4


def test_wma_between_min_and_max_of_window(spark, sf_dir):
    rows = window_wma(spark, sf_dir).orderBy("day").collect()
    assert rows
    cents = {r.day: r.cents for r in rows}
    days = sorted(cents)
    for r in rows:
        window = [
            cents[d] for d in days
            if d <= r.day and (r.day - d).days < 7
        ]
        assert min(window) - 1 <= r.wma_cents <= max(window)


def test_stock_clamp_bounds(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational12 import (
        _STOCK_PARTS,
        window_stock_clamp,
    )

    rows = window_stock_clamp(spark, sf_dir).collect()
    assert len(rows) == _STOCK_PARTS
    for r in rows:
        # the clamp keeps on-hand in [0, total_in]; it is also >= the
        # unclamped net (clamping can only raise the balance)
        assert 0 <= r.on_hand <= r.total_in
        assert r.on_hand >= r.total_in - r.total_out
        assert r.n_days >= 1


def test_dup_transactions_pairs_are_oriented_and_banded(spark, sf_dir):
    from concurrent_etl_go_spark.operators.relational12 import (
        _DUP_WINDOW_DAYS,
        profile_dup_transactions,
    )

    rows = profile_dup_transactions(spark, sf_dir).collect()
    # calibrated to be non-empty at sf0.01 and sf0.1 (the driver's
    # correctness scales); sf0.001 may legitimately emit 1 row
    seen = set()
    for r in rows:
        assert r.okey_a < r.okey_b
        assert 0 <= r.gap_days <= _DUP_WINDOW_DAYS
        key = (r.custkey, r.okey_a, r.okey_b)
        assert key not in seen
        seen.add(key)
