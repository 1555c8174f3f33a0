"""Per-family benchmark: warm wall time for ~24 representative
queries spanning every operator family, at $SPARK_GRAFT_SF_DIR
(default sf0.1). Output: a markdown table (pasted into SCALE.md §8)
plus one JSON line for machines.

Run: python tools/bench_families.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPRESENTATIVE = [
    ("scan+agg", "agg_pricing_summary"),
    ("join 6-way", "join_multiway_tpch_q5"),
    ("join 8-way ratio", "tpch_q8_market_share"),
    ("semi join (EXISTS)", "tpch_q4_late_ship_priority"),
    ("top-k", "tpch_q10_returned_items"),
    ("window sessionize", "sessionize_gap30m_batch"),
    ("sessionize two-level", "sessionize_two_level_skew_safe"),
    ("rolling window corr", "rolling_trend_corr"),
    ("rollup cascade", "rollup_cascade_1h_1d"),
    ("cube/gsets", "agg_cube_grouping_sets"),
    ("equi-depth rank", "agg_decile_equidepth"),
    ("as-of join", "join_asof_last_event_before_order"),
    ("range join (geoip)", "geoip_range_enrich"),
    ("CEP sequence", "cep_sequence_chain"),
    ("exact dedup", "dedup_exact_distinct"),
    ("minhash candidates", "neardup_minhash_candidates"),
    ("neardup end-to-end", "neardup_dedup_end_to_end"),
    ("semantic dedup e2e", "semantic_dedup_end_to_end"),
    ("knn exact", "knn_cosine_topk"),
    ("ann lsh probe", "ann_lsh_recall_probe"),
    ("tfidf", "tfidf_top_terms"),
    ("inverted index", "inverted_index_postings"),
    ("fuzzy blocked join", "fuzzy_blocked_typo_pairs"),
    ("pagerank 3 iter", "pagerank_fixed_iterations"),
    ("triangles", "triangle_count_graph"),
    ("multiline codec", "multiline_reassemble_logs"),
    ("sketch gates", "sketch_accuracy_gates"),
    # round-2 continuation families
    ("kmeans 2 rounds", "kmeans_lloyd_rounds"),
    ("bm25 retrieval", "bm25_topk_docs"),
    ("unigram surprisal", "unigram_surprisal_quality"),
    ("containment pairs", "containment_quote_pairs"),
    ("column profile", "profile_columns_events"),
    ("streak islands", "streak_islands_by_user"),
    ("impossible travel", "impossible_travel_speed"),
    ("interval coverage", "interval_coverage_merge"),
    ("markov matrix", "markov_transition_matrix"),
    ("rfm census", "rfm_segment_census"),
    ("bitmap distinct", "bitmap_distinct_gate"),
    ("tz conversion", "timezone_conversion_suite"),
    ("bpe pair census", "bpe_first_merge_census"),
    # final round-2 wave
    ("incremental dedup", "incremental_dedup_vs_reference"),
    ("basket lift", "basket_copurchase_lift"),
    ("dau/wau/mau", "dau_wau_mau_actives"),
    ("ndr monthly", "net_revenue_retention_monthly"),
    ("pareto deciles", "pareto_revenue_deciles"),
    ("modularity", "community_modularity_score"),
    ("mmr rerank", "mmr_diverse_topk"),
    ("stats tests", "welch_t_test"),
    ("cusum gate", "cusum_reference_check"),
    ("bmp headers", "multimodal_bmp_header_parse"),
    # round-8: track the heaviest checkpointed-DP constructions so
    # their inherent-cost claim is a measured trend (VERDICT r7 #10)
    ("sw traceback", "smith_waterman_traceback_alignment"),
    ("repeat families", "repeat_family_census"),
    ("suffix-array gate", "suffix_array_doubling_gate"),
    ("lcp-interval tree", "lcp_interval_tree_nodes"),
    ("fm-index search", "fm_index_backward_search"),
]


def main() -> None:
    from pyspark.sql import SparkSession

    from eventstreams_spark import registry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("bench-families")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()

    rows = []
    timings = {}
    for family, name in REPRESENTATIVE:
        builder = registry.REGISTRY[name].builder
        builder(spark, sf_dir).collect()  # warm (plan + cache + JIT)
        t0 = time.time()
        n = len(builder(spark, sf_dir).collect())
        dt = time.time() - t0
        timings[name] = round(dt, 4)
        rows.append((family, name, dt, n))
        print(f"  {family:<22} {name:<34} {dt:7.3f}s  {n} rows", file=sys.stderr)

    print("| Family | Query | warm s | rows |")
    print("|---|---|---|---|")
    for family, name, dt, n in rows:
        print(f"| {family} | `{name}` | {dt:.3f} | {n} |")
    print(
        json.dumps(
            {
                "metric": "family_warm_total",
                "value": round(sum(t for _, _, t, _ in rows), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
