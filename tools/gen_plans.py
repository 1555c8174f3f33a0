"""Generate PLANS.md: formatted physical plans for the headline
queries, so scale-critical plan properties (broadcast chains, pushed
filters, partial aggregation, TakeOrderedAndProject) are reviewable
as a committed artifact instead of only via live .explain() calls.

Run: python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "agg_pricing_summary",
    "topk_orders_by_revenue",
    "join_multiway_tpch_q5",
    "window_top3_per_user",
    "tumbling_1h_agg",
    "sessionize_gap30m_batch",
    "json_extract_props",
    "knn_cosine_topk",
    "dedup_exact_distinct",
    "llm_corpus_prep_pipeline",
    "cdc_latest_by_key",
    "cep_sequence_chain",
    "gapfill_hourly_locf",
    "geoip_range_enrich",
    "funnel_3step_conversion",
    "dq_checks_events",
    "gopher_repetition_quality",
    "contamination_ngram_overlap",
    "heavy_hitters_tokens",
    "multimodal_png_header_parse",
    "join_multiway_tpch_q7_shape",
    "subquery_tpch_q21_shape",
    "line_dedup_reassemble",
    "attribution_linear_multitouch",
    "source_similarity_tf",
    "sequence_packing_concat",
    # L2/L4 money paths (VERDICT r01 item 5): the plans that must never
    # regress into cross joins
    "neardup_minhash_candidates",
    "neardup_cluster_cc",
    "neardup_dedup_end_to_end",
    "neardup_embedding_lsh",
    "ann_lsh_recall_probe",
    "ann_ivf_recall_probe",
    "agg_decile_equidepth",
    "pagerank_fixed_iterations",
    # round-2 additions
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q15_top_supplier",
    "tpch_q18_large_orders",
    "triangle_count_graph",
    "char_entropy_quality",
    "semantic_cluster_assign",
    "multiline_reassemble_logs",
    "kcore_peel_rounds",
    "sketch_accuracy_gates",
    "semantic_dedup_end_to_end",
    # round-2 continuation: iterative ML + monitoring family
    "kmeans_lloyd_rounds",
    "label_propagation_communities",
    "counter_rate_resets",
    "anomaly_mad_outliers",
    "aggregate_task_correlate",
    "log_template_signature",
    # round-2 continuation: retrieval / SIEM / breadth family
    "bm25_topk_docs",
    "unigram_surprisal_quality",
    "containment_quote_pairs",
    "profile_columns_events",
    "streak_islands_by_user",
    "impossible_travel_speed",
    "interval_coverage_merge",
    "rfm_segment_census",
    "markov_transition_matrix",
    "mmr_diverse_topk",
    "welch_t_test",
    "mann_whitney_u",
    "chi_square_independence",
    "promql_histogram_quantile",
    "hits_two_rounds",
    "key_skew_profile",
    "recursive_cte_hierarchy_walk",
    "quality_filter_ablation",
    "dau_wau_mau_actives",
    "net_revenue_retention_monthly",
    "pareto_revenue_deciles",
    "embedding_drift_by_label",
    "token_kl_divergence_sources",
    "session_stats_summary",
    "attribution_first_last_compare",
    "seasonal_residual_outliers",
    "incremental_dedup_vs_reference",
    "basket_copurchase_lift",
    "community_modularity_score",
    # round-3 additions: completed TPC-H sweep + grok roundtrip
    "tpch_q2_min_cost_supplier",
    "tpch_q9_profit_decomposition",
    "tpch_q11_important_stock_share",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_excess_shippers",
    "grok_apache_combined",
    "betweenness_sampled_brandes",
    "closeness_harmonic_sampled",
    "personalized_pagerank_seeds",
    "bellman_ford_rounds",
    "spatial_grid_join_pairs",
    "ks_two_sample_test",
    "session_path_clusters",
    "histogram_quantile_gate",
    "countmin_error_gate",
    "holt_linear_reference_check",
    "multimodal_jpeg_sof_parse",
    "pagerank_weighted_edges",
    "louvain_first_sweep",
    "geohash_cell_census",
    "tdigest_quantile_gate",
    "winnowing_fingerprint_pairs",
    "bloom_prefilter_semi_join",
    "cc_star_components_census",
    "contamination_winnowing_bipartite",
    "weighted_jaccard_pairs",
    "hll_intersection_gate",
    "louvain_coarsened_two_level",
    "hll_sketch_persist_roundtrip",
    "spatial_knn_wrapped_probe",
    "tdigest_band_classification",
    "icws_weighted_minhash_gate",
    # round-4 additions: stint-2 heavies (VERDICT r3 #6) + the
    # self-certified sketch/sampling conversions
    "markov_removal_attribution",
    "louvain_full_loop_gate",
    "hilbert_cell_census",
    "zonemap_skipping_census",
    "twap_daily_by_type",
    "hll_sliding_window_distinct_gate",
    "ab_wilson_interval",
    "clamped_running_balance",
    "zipf_rank_frequency_fit",
    "multimodal_gif_header_parse",
    "jaro_winkler_blocked_pairs",
    "kll_tdigest_shootout_gate",
    "agg_distinct_hll_mergeable",
    "tablesample_repeatable",
    # round-4 families
    "pr_auc_average_precision",
    "confusion_threshold_sweep",
    "cohens_kappa_rules",
    "psi_score_stability",
    "ohlc_daily_bars",
    "max_drawdown_path",
    "rsi_cutler_14",
    "beaconing_interval_regularity",
    "dga_domain_entropy_score",
    "rare_pair_novelty",
    "local_clustering_coefficient",
    "degree_assortativity",
    "ktruss_support_rounds",
    "shapley_channel_attribution",
    "adstock_geometric_fold",
    "alert_flap_suppression_fsm",
    "rake_keyword_phrases",
    "langid_char_trigram_confusion",
    "ndcg_at_10_eval",
    "holt_winters_seasonal_check",
    "snapshot_diff_audit",
    "sequence_gap_islands",
    "weighted_median_by_flag",
    "decision_stump_train",
    "sprt_sequential_ab",
    "bh_fdr_cell_screen",
    # round-4 stint 3: feature-engineering / inference / density
    "kalman_level_filter_check",
    "target_encode_oof_kfold",
    "theil_index_inequality",
    "periodogram_beacon_peak",
    "compaction_binpack_plan",
    "leiden_refine_connectivity",
    "kruskal_wallis_h",
    "anova_oneway_f",
    "jackknife_loo_day_means",
    "poisson_bootstrap_ci",
    "croston_sba_intermittent",
    "newsvendor_critical_fractile",
    "safety_stock_reorder_eoq",
    "capm_beta_alpha",
    "sortino_calmar_ratios",
    "var_cvar_historical",
    "woe_iv_decile_binning",
    "vif_collinearity_triple",
    "pca_leading_component_power",
    "seasonal_decompose_classic",
    "dbscan_grid_clusters",
    # round-4 stint 4: in-engine training / diagnostics / ops
    "naive_bayes_train_eval",
    "ucb1_policy_replay",
    "isotonic_calibration_maxmin",
    "little_law_consistency",
    "hmm_burst_forward_filter",
    "hurst_rescaled_range",
    "granger_lag1_causality",
    "tukey_hsd_pairwise",
    "kendall_tau_daily",
    "boxcox_lambda_scan",
    "ridge_regression_closed_form",
    "binary_segmentation_changepoint",
    "ljung_box_whiteness",
    "runs_test_randomness",
    "soundex_phonetic_blocking",
    # round-4 stint 5: forecasting / paired tests / linkage / SLO
    "yule_walker_ar2",
    "forecast_backtest_scorecard",
    "slo_multiwindow_burn_timeline",
    "mcnemar_paired_test",
    "cochran_armitage_trend",
    "fellegi_sunter_match_weights",
    "kaplan_meier_survival",
    "logrank_two_group_test",
    "attribution_time_decay",
    "erlang_c_staffing",
    "trajectory_distance_census",
    "hhi_concentration_daily",
    "geofence_containment_census",
    "matrix_profile_daily",
    "partition_layout_advisor",
    "trimmed_mean_by_type",
    "hodges_lehmann_location",
    "poisson_dispersion_test",
    "empirical_bayes_shrinkage",
    "conformal_interval_coverage",
    "abc_xyz_classification",
    "revenue_bridge_price_volume",
    "recsys_mrr_at_10",
    "randomized_response_debias",
    "scd2_point_in_time_join",
    "max_concurrency_sweep",
    "watermark_delay_tradeoff",
    "functional_dependency_census",
    "last_digit_uniformity",
    "apdex_score_daily",
    "vocabulary_overlap_matrix",
    "session_gap_sensitivity",
    "parquet_merge_schema_roundtrip",
    "csv_corrupt_record_census",
    "kaplan_meier_by_group",
    "mann_kendall_trend",
    "benford_second_digit",
    "energy_distance_pairs",
    "gini_mean_difference_daily",
]

INTERESTING = (
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "HashAggregate",
    "TakeOrderedAndProject",
    "Exchange",
    "PushedFilters",
    "PartitionFilters",
    "WholeStageCodegen",
    "Expand",
    "Window",
    "Scan parquet",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from eventstreams_spark import registry
    from eventstreams_spark.session import get_spark

    spark = get_spark("gen-plans")
    registry._ensure_loaded()

    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        f"Generated by tools/gen_plans.py at {sf_dir} "
        "(regenerate after plan-affecting changes; plan-shape TESTS in",
        "tests/test_plans.py are the enforced contract — this file is the",
        "human-readable companion).",
        "",
    ]
    for name in HEADLINE:
        spec = registry.REGISTRY[name]
        df = spec.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip per-run noise (plan ids vary, paths are absolute)
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = plan.replace(sf_dir, "<sf>")
        ops = [ln for ln in plan.splitlines() if any(k in ln for k in INTERESTING)]
        out += [f"## {name}", "", "```", *ops[:40], "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
