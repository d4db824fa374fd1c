#!/usr/bin/env python
"""Generate a BUILDER-LOCAL scale-stress dataset that mimics the
driver's testdata distributions at a larger scale factor.

The driver's parquet under /root/testdata is read-only and capped at
sf0.1; VERDICT r8 item 2 asks for one measured decade of scaling to
back the 100 TB extrapolations.  This script synthesizes sf1 (10x
sf0.1) with the SAME schema and closely matched distributions —
measured from sf0.1 (uniform priorities/segments/types, ~4 lineitems
per order with the observed long tail, the 31-term document vocabulary
with near-uniform frequencies, 10 labeled embedding clusters, 30-day
event span) — under a fixed seed, so scaling runs are reproducible.

This data is for SCALING MEASUREMENT ONLY (BENCH_SF1.json): it is not
driver data, and correctness hashes are never compared against it.

    python scripts/gen_sf.py [--sf 1] [--out /root/repo/localdata/sf1]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: Row counts at sf=1 (10x the driver's sf0.1 counts).
BASE = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = 25
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNOUNS = ["ring", "bolt", "screw", "washer", "cog", "gear", "pin", "rod"]
PADJ = ["large", "hot", "small", "cold", "soft", "hard", "new", "old"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = (["en"] * 8 + ["de", "es", "fr", "zh"] * 2 + ["es", "fr", "zh"])
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "group", "agg", "sort",
    "scan", "hash", "query", "row", "key", "batch", "part", "line",
    "order", "fast", "slow", "big", "a", "dedup", "sample", "shuffle",
]


def _vocab(sf: float) -> list[str]:
    """Corpus vocabulary, Heaps-law grown: the driver's sf0.1 corpus
    holds 31 terms; real corpora grow vocabulary ~n^0.5, and holding it
    FIXED while scaling 10x makes shingle document frequencies grow
    linearly — which degenerates any df-sparsity-dependent plan
    (prefix-filter joins) for a reason no real corpus exhibits.  At
    sf<=0.1 this returns exactly the driver's 31 terms."""
    target = max(len(VOCAB), round(len(VOCAB) * (sf / 0.1) ** 0.5))
    extra = [f"tok{i}" for i in range(target - len(VOCAB))]
    return VOCAB + extra

DAY_US = 86_400_000_000


def _ts_col(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us.astype("int64"), type=pa.timestamp("us"))


def gen(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n = {t: max(1, int(c * sf)) for t, c in BASE.items()}

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int64()),
                "r_name": REGIONS,
            }
        ),
        f"{out}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(NATIONS), pa.int64()),
                "n_name": [f"NATION_{i:02d}" for i in range(NATIONS)],
                "n_regionkey": pa.array(
                    [i % 5 for i in range(NATIONS)], pa.int64()
                ),
            }
        ),
        f"{out}/nation.parquet",
    )

    nc = n["customer"]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(nc), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(nc)],
                "c_nationkey": pa.array(
                    rng.integers(0, NATIONS, nc), pa.int64()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, nc), 2),
                "c_mktsegment": [
                    SEGMENTS[i] for i in rng.integers(0, 5, nc)
                ],
            }
        ),
        f"{out}/customer.parquet",
    )

    ns = n["supplier"]
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(ns), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
                "s_nationkey": pa.array(
                    rng.integers(0, NATIONS, ns), pa.int64()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, ns), 2),
            }
        ),
        f"{out}/supplier.parquet",
    )

    npart = n["part"]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(npart), pa.int64()),
                "p_name": [
                    f"{PADJ[a]} {PNOUNS[b]}"
                    for a, b in zip(
                        rng.integers(0, len(PADJ), npart),
                        rng.integers(0, len(PNOUNS), npart),
                    )
                ],
                "p_brand": [
                    f"Brand#{i}" for i in rng.integers(1, 26, npart)
                ],
                "p_type": [PTYPES[i] for i in rng.integers(0, 6, npart)],
                "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
                "p_retailprice": np.round(
                    rng.uniform(900.0, 999.9, npart), 2
                ),
            }
        ),
        f"{out}/part.parquet",
    )

    no = n["orders"]
    o_start = np.datetime64("1995-01-01").astype(
        "datetime64[us]"
    ).astype("int64")
    o_span_days = 2404  # 1995-01-01 .. 2001-08-01
    odate_us = o_start + rng.integers(0, o_span_days, no) * DAY_US
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(no), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
                "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, no)],
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500000.0, no), 2
                ),
                "o_orderdate": _ts_col(odate_us),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.integers(0, 5, no)
                ],
            }
        ),
        f"{out}/orders.parquet",
    )

    # lineitem: per-order count ~ 1 + Poisson(3), clipped to <= 17
    per_order = np.clip(1 + rng.poisson(3.0, no), 1, 17)
    nl = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(no), per_order)
    linenumber = np.concatenate([np.arange(1, k + 1) for k in per_order])
    l_odate = np.repeat(odate_us, per_order)
    shipdate_us = l_odate + rng.integers(1, 96, nl) * DAY_US
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, npart, nl), pa.int64()
                ),
                "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
                "l_linenumber": pa.array(linenumber, pa.int64()),
                "l_quantity": rng.integers(1, 51, nl).astype("float64"),
                "l_extendedprice": np.round(
                    rng.uniform(901.0, 104999.0, nl), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
                "l_returnflag": [
                    "ANR"[i] for i in rng.integers(0, 3, nl)
                ],
                "l_linestatus": ["OF"[i] for i in rng.integers(0, 2, nl)],
                "l_shipdate": _ts_col(shipdate_us),
            }
        ),
        f"{out}/lineitem.parquet",
    )

    ne = n["events"]
    e_start = np.datetime64("2024-01-01").astype(
        "datetime64[us]"
    ).astype("int64")
    ets = np.sort(
        e_start + rng.integers(0, 30 * DAY_US, ne, dtype=np.int64)
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(ne), pa.int64()),
                "ts": _ts_col(ets),
                "user_id": pa.array(
                    rng.integers(0, nc // 10, ne), pa.int64()
                ),
                "event_type": [
                    EVENT_TYPES[i] for i in rng.integers(0, 5, ne)
                ],
                "value": np.round(rng.uniform(0.0, 560.0, ne), 2),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, ne)
                ],
            }
        ),
        f"{out}/events.parquet",
    )

    nd = n["documents"]
    lens = rng.integers(8, 105, nd)
    vocab = np.array(_vocab(sf))
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens
    ]
    # a slice of near-dups, as in the driver data (4992/5000 distinct)
    for i in range(0, nd // 500):
        texts[nd - 1 - i] = texts[i]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(nd), pa.int64()),
                "text": texts,
                "lang": [
                    LANGS[i] for i in rng.integers(0, len(LANGS), nd)
                ],
                "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int32()
                ),
            }
        ),
        f"{out}/documents.parquet",
    )

    nv = n["embeddings"]
    labels = rng.integers(0, 10, nv)
    centers = rng.normal(0.0, 0.09, (10, 64))
    vecs = (
        centers[labels] + rng.normal(0.0, 0.08, (nv, 64))
    ).astype("float32")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(nv), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    counts = {t: pq.read_metadata(f"{out}/{t}.parquet").num_rows
              for t in ("region", "nation", "customer", "supplier",
                        "part", "orders", "lineitem", "events",
                        "documents", "embeddings")}
    print(json.dumps({"sf": sf, "out": out, "rows": counts}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/repo/localdata/sf1")
    args = ap.parse_args()
    gen(args.sf, args.out)
