"""Safety net over the whole registry: every query (including rows-only
ones) runs at sf0.001, has unique sane column names (the driver sorts
columns by name before hashing), and a stable schema across calls."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod

ALL = sorted(entry_mod.queries())


def test_oracles_are_subset_of_queries():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # rows-only queries are the documented non-SQL-expressible set
    assert set(qs) - set(os_) == {
        "agg_approx",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "similarity_ivf_topk",
        "similarity_kmeans",
        "sample_fraction",
        "text_langid",
    }


@pytest.mark.parametrize("name", ALL)
def test_query_runs_with_sane_schema(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, sf_dir)
    cols = df.columns
    assert len(set(cols)) == len(cols), f"duplicate column names: {cols}"
    for c in cols:
        assert re.fullmatch(r"[a-z][a-z0-9_]*", c), f"unsane column name: {c}"
    # stable schema across invocations
    assert df.schema == fn(spark, sf_dir).schema
    assert df.count() >= 0
