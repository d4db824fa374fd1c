#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Round-14 protocol (the spike fix, VERDICT r13 §Next #1): each query runs
once cold, then ``$SPARK_GRAFT_BENCH_N`` (default 3) PASS-MAJOR warm
passes — the WHOLE headline list runs once per pass (not 3 back-to-back
passes per query) — and the recorded per-query number is the MIN of the
warm passes.  Two fixes in one:

* MIN, not median: round 11's median-of-3 absorbed one contended pass
  but not two — round 13 committed a 0.3 s query as 2.39 s from samples
  [3.35, 2.39, 0.28].  Host contention is strictly additive, so the min
  converges on the uncontended plan cost.
* PASS-MAJOR, not query-major: this host's contention comes in bursts of
  tens of seconds — longer than 3 consecutive warm passes of one query —
  so query-major sampling let a single burst inflate ALL of a query's
  samples (two round-14 sessions each flagged a different burst-struck
  contiguous stretch at 2-3x with clean neighbors; BENCH_AB_r14.json has
  the code-A/B exoneration).  Interleaving decorrelates bursts from
  per-query sampling at identical session cost.

All samples, the per-pass 1-minute loadavg, and corpus row counts (so
data regeneration can't masquerade as a regression either) are written
to BENCH_LOCAL.json (committed per round);
``scripts/bench_regression_gate.py`` re-derives the min from raw samples
on BOTH sides so it compares protocol-independently against older
median-era baselines.

The printed line is COMPACT and must stay UNDER ~1800 chars: the driver's
artifact records only the last ~2000 chars of stdout, and the r10 attempt
to inline all per-query arrays overflowed that tail and made the artifact
unparseable (BENCH_r10.json "parsed": null).  stdout therefore carries
totals + the slowest queries only; the full per-query record lives in the
committed BENCH_LOCAL.json.

Timing uses the noop sink so the full plan executes (no column pruning from
a count) without sink overhead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = (
    "agg_pricing_summary",     # TPC-H Q1 shape: scan + 8 aggs
    # agg_percentiles (exact quantiles) buffers every value per group in
    # the agg buffer — the correct ORACLE TWIN for verification, but not a
    # 100 TB plan. The headline slot times the approx_percentile form (one
    # bounded sketch per group, mergeable map-side); the exact twin stays
    # timed right below for the per-round delta history.
    "agg_approx",              # approx quantiles/distinct (scale path)
    "agg_percentiles",         # exact quantiles (oracle twin)
    "join_inner_broadcast",    # star join, broadcast dims
    "join_q3_top_shipping",    # selective join + agg + top-k
    "join_q5_local_supplier",  # 6-table star join
    "window_running_sum",      # window over 600k lineitem
    "window_tumbling",         # event-time windows
    "window_session",          # gaps-and-islands sessionization
    "join_asof",               # as-of join events->orders
    "etl_transform_flat",      # reference-parity transform
    "text_quality",            # text analysis scan
    "text_tfidf",              # explode + tf/df joins
    "dedup_minhash_lsh",       # MinHash+LSH near-dup
    "similarity_topk",         # brute-force cosine top-k
    "similarity_pairs",        # label-blocked cosine pairs
    "similarity_rp_lsh",       # random-projection LSH pairs (production)
    "agg_retention_cohort",    # weekly cohort retention over events
    "agg_funnel",              # ordered conversion funnel
    "text_sequence_pack",      # token-budget sequence packing
    "split_train_val_test",    # deterministic hash split
    "corpus_clean",            # composed quality-gate + dedup pipeline
    "join_q10_returns",        # TPC-H Q10 shape: 4-table star, top-20
    "sessionize_events",       # 30-min-gap sessionization over events
    "similarity_knn_join",     # k-NN join, two-phase partial top-k
    "dedup_survivor_corpus",   # end-to-end dedup funnel (LSH->CC->keep)
    "agg_q9_profit",           # TPC-H Q9 shape: 5-table star + 2-key agg
    "corpus_decontaminate",    # eval-overlap shingle join
    "join_interval_bucketed",  # pure interval join via hour-bucket equi-join
    "join_fuzzy_names",        # blocked levenshtein entity resolution
    "agg_salted_skew",         # salted two-phase aggregation (round 4)
    "join_null_skew_outer",    # null-key routing around the outer join
    "text_boilerplate_ngrams", # cross-doc repeated-span detection
    "agg_daily_zscore",        # volume-anomaly score over daily rollup
    "agg_trailing_distinct_hll",  # rolling DAU via mergeable sketches
    "profile_table_stats",     # single-scan column profile
    "text_bm25_search",        # BM25 retrieval (inverted-index plan)
    "text_unigram_nll",        # unigram-LM perplexity proxy
    "dataset_epoch_shuffle",   # seeded epoch shard permutation
    "layout_zorder",           # Morton-key layout profile
    "similarity_ivfpq_topk",   # IVF-PQ ANN (build + probe + re-rank)
    "corpus_pretrain_funnel",  # composed corpus build, one wide pass
    "join_attribution_last_touch",  # lookback-window event credit
    "profile_constraint_check",  # declarative DQ constraint report
    "agg_session_conversion",  # sessionize + in-session funnel
    # round 5: exact scalable twins of the single-partition global windows
    "window_ntile_cume_scalable",   # distributed rank, no global sort
    "window_power_users_scalable",  # histogram threshold, no window
    # round 6: lifecycle proofs + retail shapes + portable MinHash
    "cdc_apply_changes",            # versioned diff + replay end-to-end
    "ivm_incremental_rollup",       # 3-append incremental view refresh
    "agg_market_basket",            # co-ordered pair affinity (self-join)
    "agg_cross_channel_rollup",     # union + ROLLUP
    "agg_customer_rfm",             # customer segmentation hash agg
    "window_top_movers",            # broadcast dim + per-brand LAG
    "dedup_minhash_candidates",     # banded LSH with portable base hash
    "corpus_file_dedup",            # loose-file ingest + exact dedup
    "join_asof_nearest",            # backward+forward cogroup composition
    "text_keywords_tfidf",          # per-doc argmax keyword
    "agg_pareto_share",             # revenue concentration report
    # round 7: portable ANN serving twins + BFS + surface pack
    "embeddings_pq_assign_portable",  # frozen-codebook IVF-PQ encoding
    "similarity_ivfpq_portable",    # probe->ADC->re-rank serving twin
    "graph_bfs_hops",               # frontier BFS over co-purchase graph
    "agg_rollup_revenue_rank",      # ROLLUP x window hybrid
    "agg_repeat_purchase_intervals",  # per-customer gap distribution
    "text_vocab_growth",            # Heaps-law vocabulary profile
    "embeddings_norm_histogram",    # integer norm histogram
    "graph_common_neighbors",       # wedge-join link prediction
    "graph_kcore",                  # fixed-round 2-core peel
    "dataset_dedup_cross_split",    # split contamination report
    "window_streak_lengths",        # day-grain gaps-and-islands
    "multimodal_frame_sample",      # binary frame-window sampling
    "agg_cohort_ltv_curve",         # cohort x age LTV (integer units)
    "agg_shipping_delay_histogram", # order->ship delay bands
    "window_daily_backlog",         # sweep-line open-order series
    "dedup_survivor_portable",      # end-to-end proven dedup funnel
    "sketch_bloom_membership",      # relational Bloom filter probe
    "text_feature_hashing",         # hashing-trick featurization
    # round 8: Lloyd's-step proof + weighted SSSP + hierarchy + sampling
    "similarity_kmeans_step_portable",  # two integer Lloyd's rounds
    "graph_sssp_weighted",          # min-plus delta relaxation
    "agg_hierarchy_rollup",         # self-referencing subtree rollup
    "sample_block_hash",            # deterministic block sampling
    "graph_label_propagation",      # synchronous LPA communities
    "similarity_matryoshka_topk",   # MRL prefix-dim funnel
    "text_zipf_profile",            # rank-frequency vocabulary curve
    "agg_basket_lift",              # association-rule lift scoring
    "agg_pareto_frontier",          # skyline over supplier metrics
    "join_bom_explosion",           # multiplicative path closure
    "profile_key_islands",          # scalable gaps-and-islands DQ
    "agg_event_transitions",        # Markov transition matrix
    "dedup_prefix_filter_jaccard",  # exact sub-quadratic set join
    "graph_ppr",                    # personalized PageRank
    "search_hybrid_rrf",            # lexical+semantic RRF fusion
    "graph_jaccard_neighbors",      # neighborhood-Jaccard link prediction
    "window_cusum",                 # CUSUM change-point series
    "agg_ab_test",                  # A/B two-proportion + SRM readout
    "text_bpe_apply",               # frozen-merge BPE tokenizer apply
    "graph_hits",                   # all-integer fixed-round HITS
    "text_dup_ngram_coverage",      # duplicated-span coverage (Lee et al.)
    "search_mmr_rerank",            # MMR diversified re-rank
    "embeddings_centroid_drift",    # exact-integer domain-shift detector
    # round 9: retrieval evaluation + recommender + centrality + forecast
    "search_eval_recall_at_k",      # recall@k of all ANN arms vs truth
    "search_eval_ndcg_at_k",        # integer-relevance NDCG@k
    "search_eval_mrr",              # reciprocal rank per arm
    "search_eval_mmr_arm",          # MMR arm recall+NDCG (unrolled picks)
    "rec_item_neighbors",           # item-item cosine^2 neighbor table
    "rec_user_items",               # item-based user recommendations
    "rec_next_part",                # sequential next-purchase table
    "graph_closeness_centrality",   # sampled-source closeness+harmonic
    "graph_betweenness_sampled",    # Brandes sampled betweenness
    "agg_holt_forecast",            # Brown double-exponential forecast
    "agg_time_decay_score",         # hyperbolic time-decayed spend
    "text_distinctive_terms",       # log-odds corpus diff
    "agg_funnel_latency",           # time-to-convert bands
    "join_attribution_position",    # U-shaped multi-touch credit
    "profile_column_entropy",       # categorical entropy profile
    "window_wma",                   # integer weighted moving average
    "window_stock_clamp",           # zero-clamped inventory fold
    "rec_eval_hit_rate",            # leave-one-out recommender eval
    "agg_forecast_backtest",        # Holt vs seasonal-naive backtest
    "agg_survival_km",              # Kaplan-Meier churn curve
    "dataset_weighted_sample",      # per-row-rate deterministic sample
    "graph_clustering_coeff",       # local clustering coefficient
    "profile_dup_transactions",     # banded duplicate-charge probe
    "graph_eccentricity_sample",    # sampled diameter lower bound
    "text_term_burstiness",         # Church-Gale VMR dispersion
    # round-10 additions
    "agg_ab_cuped",                 # CUPED variance-reduced A/B readout
    "agg_ab_did",                   # difference-in-differences twin
    "agg_theil_decomposition",      # within/between-nation Theil index
    "rec_rfm_next_action",          # RFM-segment recommendation table
    "agg_funnel_source_split",      # funnel latency by first touch
    "window_macd",                  # EMA12-EMA26 + signal series
    "window_bollinger",             # rolling mean/sigma/breach bands
    "window_vwap",                  # integer cents-per-unit VWAP
    "window_rsi",                   # Wilder RSI fold
    "graph_assortativity",          # degree-degree Pearson r
    "graph_two_hop_reach",          # friends-of-friends reach
    "text_js_divergence",           # per-lang JSD vs rest of corpus
    "text_simpson_diversity",       # integer Simpson repeat-rate
    "join_basket_substitutes",      # negative-lift substitute pairs
    "agg_abc_classification",       # cumulative revenue ABC classes
    "agg_rolling_retention",        # day-grain 7-day retention
    "profile_category_drift",       # event-mix drift between halves
    "search_eval_map_at_k",         # integer MAP of the retrieval arms
    "text_pmi_pairs",               # PMI collocations over the dictionary
    "dataset_curriculum_order",     # curriculum phase assignment
    "agg_price_elasticity",         # log-log demand slope per brand
    "agg_top_quintile_share",       # 80/20 revenue concentration
    "agg_chi_square",               # contingency chi-square + Cramer's V
    "agg_mann_whitney",             # rank-sum U / AUC / z, tie-corrected
    "agg_ks_test",                  # integer-lattice two-sample KS
    "agg_anova_f",                  # one-way ANOVA on exact cents
    "agg_spearman_corr",            # rank correlation, bounded domains
    "window_autocorr",              # ACF lags 1-7 via position self-join
    "window_stochastic_osc",        # integer %K/%D oscillator
    "agg_croston",                  # intermittent-demand dual SES folds
    "text_mutual_information",      # lang x source MI, floor-integer total
    "text_rake_keywords",           # RAKE degree/freq keyword scores
    "text_novelty_curve",           # per-source shingle novelty deciles
    "graph_transitivity",           # global 3T/W closure ratio
    "agg_srm_check",                # sample-ratio-mismatch chi-square
    "agg_gini_split",               # decision-stump best split (CART)
    "agg_brand_transitions",        # consecutive-order brand lift
    "rec_coverage",                 # rec-list catalog coverage/exposure
    "similarity_range_search",      # int8-code cosine radius search
    "agg_sprt_ab",                  # Wald SPRT daily monitor
    "agg_weekday_seasonality",      # weekday revenue index
    "search_eval_auc",              # within-list ROC AUC per arm
    "agg_capture_recapture",        # Chapman population estimate
    "agg_effect_size",              # Cohen's d across arms
    "agg_seasonal_strength",        # weekday eta^2 of detrended series
    "graph_rich_club",              # hub-core density phi(k)
    "agg_runs_test",                # Wald-Wolfowitz randomness check
    "agg_wilcoxon_signed_rank",     # paired week-over-week shift test
    # round-11 additions
    "window_obv",                   # signed-volume cumulative line
    "window_donchian",              # prior-14-day channel + breakouts
    "window_atr",                   # Wilder average true range
    "window_sharpe",                # rolling mean/sigma of daily diffs
    "window_beta",                  # rolling covariance vs market
    "agg_adstock",                  # geometric-decay media carryover
    "agg_welch_t",                  # unequal-variance mean comparison
    "agg_kendall_tau",              # bounded-cell concordance matrix
    "agg_kruskal_wallis",           # k-group rank ANOVA, no global sort
    "agg_cohens_kappa",             # chance-corrected rater agreement
    "agg_jarque_bera",              # shifted-lattice normality check
    "graph_resource_allocation",    # 1/deg wedge link prediction
    "graph_edge_embeddedness",      # per-edge triangle support histogram
    "graph_katz_centrality",        # fixed-round integer Katz
    "agg_bounce_rate",              # single-event sessions by entry type
    "agg_dwell_time_bands",         # session-duration engagement bands
    "agg_rfm_migration",            # frequency-segment flow matrix
    "rec_markov_next_event",        # argmax of the transition matrix
    "agg_cusum_changepoint",        # integer-lattice CUSUM argmax
    "text_hapax_ratio",             # shingle long-tail diversity
    "text_lexical_density",         # content-vs-function word mix
    # round-11 additions the round-11 HEADLINE omitted (ADVICE r11 low)
    "agg_theil_sen",                # median-of-slopes robust trend
    "agg_mann_kendall",             # monotonic-trend S statistic
    "window_ichimoku",              # four-line cloud from rolling extremes
    "window_keltner",               # EMA midline +/- 2x ATR bands
    # round-12 additions
    "agg_price_index_laspeyres",    # fixed-basket price index
    "agg_basket_size_distribution", # order line-count profile
    "agg_hhi_concentration",        # Herfindahl market concentration
    "agg_gini_coefficient",         # exact rank-weighted Gini
    "dataset_pack_efficiency",      # next-fit bin-fill report
    "search_cross_encoder_rerank",  # coverage/tf/proximity rerank
    "dedup_gate_flags",             # match-any-predecessor dup gate
    "search_eval_interpolated_pr",  # 11-point P-R curve per arm
    "search_eval_rbo",              # rank-biased overlap of rankings
    "agg_trimmed_mean",             # 10%-tail-trimmed robust mean
    "agg_winsorized_mean",          # tail-clamped robust mean
    "window_parkinson_vol",         # high-low range volatility
    "text_dedup_rate_by_source",    # dup rate per provenance feed
    "text_readability_fk",          # Flesch-Kincaid grade per doc
    "agg_bootstrap_ci",             # counter-hash percentile bootstrap
    "agg_decile_lift_table",        # spend-decile gains/lift table
    "dataset_contrastive_triples",  # hard-negative training triples
    "embeddings_top_component",     # integer power-iteration PCA
    "dataset_tokenizer_fertility",  # subwords/word under frozen BPE
    "dataset_mix_temperature_weights",  # tau=0.7 sampling mix
    "text_bigram_entropy_rate",     # conditional entropy, micro-nats
    "dedup_cluster_size_histogram", # dup-cluster size distribution
    # round-13 additions
    "agg_trimmed_mean_scalable",    # grouped distributed-rank twin
    "agg_winsorized_mean_scalable", # grouped distributed-rank twin
    "window_amihud_illiquidity",    # |dP|/volume price-impact series
    "agg_kelly_fraction",           # Kelly f* from daily diff series
    "window_drawdown_duration",     # longest below-peak spells
    "text_gopher_rules",            # per-rule corpus quality gate
    "text_ttr_prefix_profile",      # prefix type-token diversity
    "dataset_cluster_balanced_sample",  # 1/cluster-size keep sampling
    "agg_uplift_qini",              # uplift Qini curve over deciles
    "agg_latency_slo_hourly",       # exact-rank p50/p95/p99 + breaches
    "agg_median_polish",            # Tukey two-way robust decomposition
    "embeddings_remove_top_component",  # All-but-the-Top postprocess
    "agg_ulcer_index",              # mean-squared drawdown depth
    "dataset_mix_waterfill",        # capped temperature-mix allocation
    "graph_modularity_labels",      # Newman-Girvan Q of LPA communities
    "dedup_minhash_calibration",    # sketch-vs-exact error histogram
    "text_langid_confusion",        # language-ID confusion matrix
    "dataset_epoch_coverage",       # loader permutation audit
    # round-14 additions
    "agg_omega_ratio",              # gains-over-losses risk ratio
    "agg_sortino_sq",               # squared Sortino components
    "window_hurst_rs",              # rescaled-range long-memory stat
    "text_rarity_score",            # tf-weighted mean df per doc
    "text_burstiness",              # variance-to-mean per token
    "dedup_bloom_prefilter",        # bloom FPR calibration
    "agg_expected_shortfall",       # exact-rank CVaR tail mean
    "sketch_count_min_calibration", # CMS overestimate vs exact
    "dataset_leakage_safe_split",   # cluster-consistent split
    "corpus_decontaminate_bloom",   # bloom-prefiltered decontaminate
    "agg_shapley_attribution",      # exact Shapley channel credit
    "agg_pettitt_changepoint",      # rank changepoint test
    "agg_grubbs_outlier",           # max-deviation outlier test
    # round-15 additions
    "privacy_k_anonymity",          # QI equivalence-class histogram
    "privacy_l_diversity",          # distinct-sensitive-value classes
    "privacy_generalization_ladder",  # k vs suppression trade-off
    "privacy_pii_density",          # per-source PII hits / 10k chars
    "window_page_hinkley",          # mean-shift drift detector
    "agg_cvm_test",                 # integrated ECDF distance
    "profile_chi2_drift",           # epoch chi-square drift gate
    "dataset_quota_sample",         # per-source hash-ranked quota
    "agg_survival_na",              # integer Nelson-Aalen hazard
    "agg_logrank_test",             # segment survival chi-square
    "rec_novelty_epc",              # rank-based list novelty
    "rec_intra_list_diversity",     # pairwise list dissimilarity
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    from concurrent_etl_go_spark.session import get_spark

    # Keep the status store small: even with the UI disabled the
    # AppStatusListener retains per-job/stage/task rows (defaults: 1000
    # jobs / 1000 stages / 100k tasks / 1000 SQL executions), and a
    # 219-query x 4-pass session accumulates enough of them to matter
    # inside the single 8g local-mode JVM (round-13 drift forensics).
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.retainedJobs": "50",
            "spark.ui.retainedStages": "100",
            "spark.ui.retainedTasks": "2000",
            "spark.sql.ui.retainedExecutions": "20",
            "spark.worker.ui.retainedExecutors": "10",
        },
    )

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # warm the session (JVM/codegen/parquet footer caches)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(name: str) -> tuple[float, float]:
        # e2e time runs from the query FUNCTION call, not just the final
        # action: iterative queries (connected components, k-means, IVF)
        # do eager driver-coordinated work inside the function, and timing
        # only the returned DataFrame's action would silently exclude it.
        # The action-only time is reported alongside for comparability
        # with rounds 1-2, which timed only the action.
        start = time.perf_counter()
        df = queries[name](spark, sf_dir)
        mid = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        end = time.perf_counter()
        return round(end - start, 3), round(end - mid, 3)

    # Per query: one cold pass (codegen compile, footer cache), then n
    # warm passes whose per-query MIN is the recorded number (round 14:
    # contention is strictly additive, so the min estimates the
    # uncontended plan cost; the median chased double-spikes in r13).
    # release_caches() between passes so no query's internal scoped
    # persist carries results across runs (and the tracked-cache list
    # doesn't grow across the bench session).
    import statistics

    from concurrent_etl_go_spark.operators.registry import release_caches

    n_warm = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    # Smoke/debug subset: comma-separated names (never set by the driver).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = (
        tuple(n for n in HEADLINE if n in set(only.split(",")))
        if only
        else HEADLINE
    )
    # Round-13 drift forensics (VERDICT r12 §Next #1): round 12's
    # committed bench slowed a median 1.28x on UNCHANGED queries with
    # samples rising within the session.  Instrumentation to separate
    # session-state accumulation from host noise, recorded in
    # BENCH_LOCAL.json:
    # - per-query JVM state (heap, persistent-RDD count) sampled every
    #   SENTINEL_EVERY queries;
    # - a SENTINEL re-run of the first queries at session end — if the
    #   same query in the same session is now slower, the session got
    #   heavier (accumulation); if it matches, mid-run slowness was
    #   host noise;
    # - SPARK_GRAFT_BENCH_DEEP_CLEAN=1 additionally runs python-gc +
    #   JVM System.gc() between queries so ContextCleaner can release
    #   localCheckpoint RDD blocks whose py4j handles are unreachable.
    import gc as _gc

    deep_clean = os.environ.get(
        "SPARK_GRAFT_BENCH_DEEP_CLEAN", ""
    ).lower() in ("1", "true")

    def clean_between() -> None:
        release_caches()
        if deep_clean:
            spark.catalog.clearCache()
            _gc.collect()
            spark._jvm.java.lang.System.gc()  # noqa: SLF001

    def jvm_probe() -> dict:
        rt = spark._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
        jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001
        return {
            "heap_mb": round(
                (rt.totalMemory() - rt.freeMemory()) / (1 << 20), 1
            ),
            "rdds": jsc.getPersistentRDDs().size(),
        }

    SENTINEL_N = 8  # first-N queries re-timed at session end
    SENTINEL_EVERY = 25  # JVM probe cadence (every N queries)

    # PASS-MAJOR interleaving (round 14, v3.1): the host's contention
    # comes in bursts of tens of seconds — longer than 3 back-to-back
    # warm passes of one query, so query-major sampling let a burst
    # inflate ALL of a query's samples at once (two full sessions this
    # round each flagged a different burst-struck stretch at 2-3x with
    # clean neighbors).  Running the whole headline list once per pass
    # decorrelates bursts from per-query sampling: a burst lands on
    # DIFFERENT queries in different passes and the per-query min
    # recovers the uncontended cost.  Session cost is identical (same
    # total work, different order).
    cold: dict[str, float] = {}
    samples_e2e: dict[str, list[float]] = {}
    samples_act: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    timings_median: dict[str, float] = {}
    action_only: dict[str, float] = {}
    loadavg1: dict[str, list[float]] = {}
    jvm_trace: list[dict] = []
    for name in headline:
        samples_e2e[name], samples_act[name] = [], []
        loadavg1[name] = []
    for qi, name in enumerate(headline):
        cold[name], _ = run_once(name)
        clean_between()
        if qi % SENTINEL_EVERY == 0 or qi == len(headline) - 1:
            probe = jvm_probe()
            probe["after_query_idx"] = qi
            jvm_trace.append(probe)
    for _pass in range(n_warm):
        for name in headline:
            loadavg1[name].append(round(os.getloadavg()[0], 2))
            e2e, act = run_once(name)
            clean_between()
            samples_e2e[name].append(e2e)
            samples_act[name].append(act)
    for name in headline:
        timings[name] = round(min(samples_e2e[name]), 3)
        timings_median[name] = round(statistics.median(samples_e2e[name]), 3)
        action_only[name] = round(min(samples_act[name]), 3)

    # sentinel re-run: the first SENTINEL_N headline queries again, at
    # the END of the (now maximally heavy) session
    sentinel: dict[str, float] = {}
    for name in headline[:SENTINEL_N]:
        reruns = []
        for _ in range(n_warm):
            e2e, _act = run_once(name)
            clean_between()
            reruns.append(e2e)
        sentinel[name] = round(min(reruns), 3)
    sentinel_base = sum(timings[n] for n in sentinel)
    sentinel_drift = (
        round(sum(sentinel.values()) / sentinel_base, 3)
        if sentinel_base > 0
        else None
    )

    # Corpus stats alongside the timings: a regenerated or differently
    # sized localdata corpus shifts candidate-bound queries (dedup/
    # similarity) and would otherwise masquerade as a perf regression.
    corpus: dict[str, int] = {}
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        try:
            corpus[t] = spark.read.parquet(
                os.path.join(sf_dir, f"{t}.parquet")
            ).count()
        except Exception:
            corpus[t] = -1

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "action_only": action_only,
        "action_only_total": round(sum(action_only.values()), 3),
        "cold_total": round(sum(cold.values()), 3),
        "cold": cold,
        "queries_median": timings_median,
        "samples_e2e": samples_e2e,
        "samples_act": samples_act,
        "loadavg1": loadavg1,
        "sentinel_rerun": sentinel,
        "sentinel_drift": sentinel_drift,
        "jvm_trace": jvm_trace,
        "deep_clean": deep_clean,
        "n_warm": n_warm,
        # FROZEN at v3 (round 15, VERDICT r14 §Next #2): three protocol
        # changes in three rounds broke per-query round-over-round
        # comparability each time (action-only -> median-of-3
        # query-major -> min-of-3 pass-major).  v3 = min-of-n_warm
        # PASS-MAJOR is final; the regression gate refuses
        # cross-protocol baselines unless --allow-cross-protocol.
        "protocol_version": 3,
        "protocol": "per-query MIN of n_warm PASS-MAJOR warm passes "
        "(whole headline list per pass, so multi-second host bursts "
        "land on different queries in different passes and the min "
        "recovers the uncontended cost) after one cold pass per query; "
        "medians + raw samples + per-pass loadavg recorded; e2e = "
        "query build + eager coordination + action",
        "corpus_rows": corpus,
        "sf": sf,
    }
    # Full named per-query maps live in a committed file: the driver's
    # artifact records only the LAST ~2000 chars of stdout, and inlining
    # per-query arrays overflowed that tail in rounds 5, 6 AND 10
    # (BENCH_r10.json "parsed": null).  stdout stays comfortably inside
    # the tail so the artifact's JSON parse succeeds.
    with open(os.path.join(REPO_ROOT, "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    )
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(headline),
        "n_warm": n_warm,
        "protocol": "per-query min of n_warm pass-major warm passes; "
        "full per-query maps + samples + loadavg + corpus rows in "
        "committed BENCH_LOCAL.json",
        "queries": slowest,
        "act_total": full["action_only_total"],
        "cold_total": full["cold_total"],
        "sentinel_drift": sentinel_drift,
        "corpus_rows": corpus,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
