#!/usr/bin/env python
"""Round-15 optimization probe: where does the ~1.2 s/round constant of
the iterative graph kernels go, and which restructuring removes it?

Times graph_ppr-equivalent variants at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], asserting all variants produce the IDENTICAL
result rows (the driver-hash invariant) before reporting timings.

Variants:
  v0_current   : per-round eager localCheckpoint, sym+deg joined in-loop
                 (the committed shape)
  v1_hoist     : loop-invariant sym-join-deg hoisted + persisted; eager
                 localCheckpoint per round
  v2_lazy      : v1 + fully lazy linear chain (ranks referenced once per
                 round), single terminal action, no per-round persist
  v3_bcast     : v2 + explicit broadcast() hint on the per-round ranks
                 join (rank table is node-dimension)

Run AFTER the correctness sweeps finish (quiet host).
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from concurrent_etl_go_spark.session import get_spark

    spark = get_spark(
        app_name="exp_ppr",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from concurrent_etl_go_spark.operators import graph2
    from concurrent_etl_go_spark.operators.registry import (
        release_caches,
        scoped_persist,
    )

    ROUNDS = graph2._PPR_ROUNDS
    DAMP = graph2._PPR_DAMPING

    def build_base():
        edges = graph2._copurchase_edges(spark, sf_dir)
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("n_deg")
        )
        return sym, deg

    def v0_current():
        return graph2.graph_ppr(spark, sf_dir)  # the committed query as-is

    def v1_hoist():
        sym, deg = build_base()
        deg = scoped_persist(deg)
        nodes = scoped_persist(deg.select("id"))
        contrib = scoped_persist(
            sym.join(deg, sym["src"] == deg["id"]).select(
                "dst", F.col("src").alias("cid"), "n_deg"
            )
        )
        source = sym.agg(F.min("src")).first()[0]
        is_src = F.when(F.col("id") == source, 1.0).otherwise(0.0)
        ranks = nodes.select("id", is_src.alias("rank"))
        for _ in range(ROUNDS):
            inflow = (
                contrib.join(
                    ranks.select(
                        F.col("id").alias("rid"), F.col("rank").alias("r")
                    ),
                    F.col("cid") == F.col("rid"),
                )
                .select("dst", (F.col("r") / F.col("n_deg")).alias("c"))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = (
                nodes.join(inflow, "id", "left")
                .select(
                    "id",
                    (
                        F.lit(1 - DAMP) * is_src
                        + F.lit(DAMP) * F.coalesce(F.col("inflow"), F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks.select(
            "id", (F.round("rank", 6) + F.lit(0.0)).alias("rank")
        )

    def _lazy(broadcast_ranks: bool):
        sym, deg = build_base()
        deg = scoped_persist(deg)
        nodes = scoped_persist(deg.select("id"))
        contrib = scoped_persist(
            sym.join(deg, sym["src"] == deg["id"]).select(
                "dst", F.col("src").alias("cid"), "n_deg"
            )
        )
        source = sym.agg(F.min("src")).first()[0]
        is_src = F.when(F.col("id") == source, 1.0).otherwise(0.0)
        ranks = nodes.select("id", is_src.alias("rank"))
        for _ in range(ROUNDS):
            r = ranks.select(
                F.col("id").alias("rid"), F.col("rank").alias("r")
            )
            if broadcast_ranks:
                r = F.broadcast(r)
            inflow = (
                contrib.join(r, F.col("cid") == F.col("rid"))
                .select("dst", (F.col("r") / F.col("n_deg")).alias("c"))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = nodes.join(inflow, "id", "left").select(
                "id",
                (
                    F.lit(1 - DAMP) * is_src
                    + F.lit(DAMP) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        return ranks.select(
            "id", (F.round("rank", 6) + F.lit(0.0)).alias("rank")
        )

    def v2_lazy():
        return _lazy(False)

    def v3_bcast():
        return _lazy(True)

    variants = [
        ("v0_current", v0_current),
        ("v1_hoist", v1_hoist),
        ("v2_lazy", v2_lazy),
        ("v3_bcast", v3_bcast),
    ]

    # correctness: identical rows across variants
    baseline_rows = None
    for name, fn in variants:
        df = fn()
        rows = sorted((r.id, r.rank) for r in df.collect())
        release_caches()
        if baseline_rows is None:
            baseline_rows = rows
        else:
            assert rows == baseline_rows, f"{name} rows differ!"
        print(f"{name}: rows ok ({len(rows)})")

    # timing: cold already paid above; 3 warm reps each, min
    for name, fn in variants:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.perf_counter()
            release_caches()
            times.append(round(t1 - t0, 3))
        print(f"{name}: min {min(times):.3f}  samples {times}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
