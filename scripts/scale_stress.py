#!/usr/bin/env python
"""One measured decade of scaling: run the slowest headline queries at
two builder-generated scales (mimic sf0.1 and sf1, scripts/gen_sf.py —
SAME generator at both points, so the ratio isolates data-volume
scaling from distribution differences) and record per-query scaling
exponents in BENCH_SF1.json.

exponent = log10(e2e_sf1 / e2e_sf01); 1.0 = linear, and anything up to
~1.15 is linear x log-ish at one decade.  Iterative kernels carry a
large FIXED per-round job-latency cost at these scales, so their
exponents undershoot (fixed cost amortizes; that direction is fine).
Action-only exponents are recorded alongside: at toy scale e2e is
dominated by planning + job latency, so action-only is the honest
volume-scaling signal.

    python scripts/scale_stress.py [--runs 2]
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

#: The 15 slowest BENCH_r08 headline queries + the round-9 additions.
QUERIES = (
    "graph_ppr",
    "graph_bfs_hops",
    "graph_sssp_weighted",
    "graph_kcore",
    "dedup_prefix_filter_jaccard",
    "dedup_survivor_corpus",
    "graph_jaccard_neighbors",
    "graph_label_propagation",
    "join_fuzzy_names",
    "dedup_survivor_portable",
    "graph_common_neighbors",
    "graph_hits",
    "agg_basket_lift",
    "cdc_apply_changes",
    "profile_table_stats",
    # round-9 additions
    "search_eval_recall_at_k",
    "search_eval_ndcg_at_k",
    "search_eval_mmr_arm",
    "rec_item_neighbors",
    "rec_user_items",
    "graph_closeness_centrality",
    "agg_holt_forecast",
    "text_distinctive_terms",
    "search_eval_mrr",
    "agg_time_decay_score",
    "rec_next_part",
    "graph_betweenness_sampled",
    "agg_funnel_latency",
    "join_attribution_position",
    "profile_column_entropy",
    "window_wma",
    "window_stock_clamp",
    "rec_eval_hit_rate",
    "agg_forecast_backtest",
    "agg_survival_km",
    "dataset_weighted_sample",
    "graph_clustering_coeff",
    "profile_dup_transactions",
    "graph_eccentricity_sample",
    "text_term_burstiness",
)

SF_DIRS = {
    "sf0.1": os.path.join(REPO_ROOT, "localdata", "sf0.1"),
    "sf1": os.path.join(REPO_ROOT, "localdata", "sf1"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--headline-missing",
        action="store_true",
        help="measure every bench.py HEADLINE query not already in "
        "BENCH_SF1.json and MERGE the results in (round-10 advice 7: "
        "every headline query gets a measured exponent)",
    )
    args = ap.parse_args()

    queries_to_run = QUERIES
    prior: dict = {}
    if args.headline_missing:
        import bench

        path = os.path.join(REPO_ROOT, "BENCH_SF1.json")
        if os.path.exists(path):
            with open(path) as f:
                prior = json.load(f).get("queries", {})
        queries_to_run = tuple(
            n for n in bench.HEADLINE if n not in prior
        )
        print(f"measuring {len(queries_to_run)} headline queries "
              f"not yet in BENCH_SF1.json", flush=True)

    from concurrent_etl_go_spark.operators.registry import release_caches
    from concurrent_etl_go_spark.session import get_spark

    spark = get_spark(
        app_name="scale-stress", master="local[32]", shuffle_partitions=32
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

    results: dict[str, dict] = dict(prior)
    for name in queries_to_run:
        row: dict = {}
        for tag, sf_dir in SF_DIRS.items():
            best_e2e, best_act = math.inf, math.inf
            run_once(name, sf_dir)  # warm-up (codegen, footers)
            for _ in range(args.runs):
                e2e, act = run_once(name, sf_dir)
                best_e2e, best_act = min(best_e2e, e2e), min(best_act, act)
            row[tag] = {"e2e": round(best_e2e, 3), "act": round(best_act, 3)}
            print(f"{name:32s} {tag:6s} e2e={best_e2e:7.2f}s "
                  f"act={best_act:7.2f}s", flush=True)
        row["exp_e2e"] = round(
            math.log10(max(row["sf1"]["e2e"], 1e-3)
                       / max(row["sf0.1"]["e2e"], 1e-3)), 3
        )
        row["exp_act"] = round(
            math.log10(max(row["sf1"]["act"], 1e-3)
                       / max(row["sf0.1"]["act"], 1e-3)), 3
        )
        results[name] = row

    from concurrent_etl_go_spark.operators.registry import SCALE_CLASS

    for name, row in results.items():
        row["scale_class"] = SCALE_CLASS.get(name, "production")
    prod = {
        n: r for n, r in results.items()
        if r["scale_class"] == "production"
    }
    out = {
        "metric": "scale_stress_decade",
        "generator": "scripts/gen_sf.py seed=42 (builder mimic data; "
        "same generator at both points)",
        "points": {k: v for k, v in SF_DIRS.items()},
        "runs": args.runs,
        "timing": "best-of-n after one warm-up, serialized",
        "queries": results,
        "worst_exp_act": max(r["exp_act"] for r in prod.values()),
        "worst_exp_act_production": max(
            r["exp_act"] for r in prod.values()
        ),
        "oracle_twin_exponents": {
            n: r["exp_act"] for n, r in results.items()
            if r["scale_class"] == "oracle_twin"
        },
        "note": "worst_exp_act covers PRODUCTION queries only; "
        "oracle_twin rows are deliberately simpler (often O(n^2)-"
        "blocked) correctness twins, bounded-input by contract — "
        "their exponents are listed separately, not headline.",
    }
    with open(os.path.join(REPO_ROOT, "BENCH_SF1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "worst_exp_act": out["worst_exp_act"],
        "worst_exp_e2e": max(r["exp_e2e"] for r in results.values()),
    }))


if __name__ == "__main__":
    main()
