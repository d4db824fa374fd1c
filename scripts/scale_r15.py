#!/usr/bin/env python
"""Decade scale evidence for the round-15 query additions: one
sf0.1 -> sf1 step (builder-generated tables, seed 42, same generator as
BENCH_SF1.json) for the privacy/drift/quota/survival queries, recording
e2e + action-only times and the decade exponent
``exp = log10(t_sf1 / t_sf0.1)`` (1.0 = linear in corpus size; these
are dimension-scale aggregations, so well under 1.0 is expected).

    python scripts/scale_r15.py [--runs 2]
Writes SCALE_R15.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

NEW_R15 = (
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_generalization_ladder",
    "privacy_pii_density",
    "window_page_hinkley",
    "agg_cvm_test",
    "profile_chi2_drift",
    "dataset_quota_sample",
    "agg_survival_na",
    "agg_logrank_test",
)

SF_DIRS = {
    "sf0.1": os.path.join(REPO_ROOT, "localdata", "sf0.1"),
    "sf1": os.path.join(REPO_ROOT, "localdata", "sf1"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from concurrent_etl_go_spark.operators.registry import release_caches
    from concurrent_etl_go_spark.session import get_spark

    spark = get_spark(
        app_name="scale-r15", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    def run_once(name: str, sf_dir: str) -> tuple[float, float]:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        release_caches()
        return t2 - t0, t2 - t1

    results: dict[str, dict] = {}
    for name in NEW_R15:
        per_sf: dict[str, tuple[float, float]] = {}
        for sf, sf_dir in SF_DIRS.items():
            run_once(name, sf_dir)  # warm-up (codegen, footers)
            best = min(
                (run_once(name, sf_dir) for _ in range(args.runs)),
                key=lambda t: t[0],
            )
            per_sf[sf] = (round(best[0], 3), round(best[1], 3))
        e2e1, act1 = per_sf["sf0.1"]
        e2e2, act2 = per_sf["sf1"]
        results[name] = {
            "sf0.1_e2e": e2e1,
            "sf0.1_act": act1,
            "sf1_e2e": e2e2,
            "sf1_act": act2,
            "exp_e2e": round(
                math.log10(max(e2e2, 1e-3) / max(e2e1, 1e-3)), 3
            ),
            "exp_act": round(
                math.log10(max(act2, 1e-3) / max(act1, 1e-3)), 3
            ),
        }
        print(name, results[name], flush=True)

    out = {
        "step": "sf0.1->sf1 (10x, builder generator seed 42)",
        "runs": args.runs,
        "queries": results,
    }
    with open(os.path.join(REPO_ROOT, "SCALE_R15.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("written SCALE_R15.json")
    spark.stop()


if __name__ == "__main__":
    main()
