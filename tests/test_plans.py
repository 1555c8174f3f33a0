"""Plan-shape regression tests (SCALE.md contract).

These lock in the physical-plan properties that make each operator
100 TB-safe: broadcast enrichment chains, pushdown + pruning at the
scan, TakeOrderedAndProject for top-k, two-phase aggregation, and the
absence of cartesian products outside the explicitly-quarantined
brute-force baselines.
"""

from __future__ import annotations

import pytest

from eventstreams_spark import registry
from eventstreams_spark.plans import (
    assert_all_joins_broadcast,
    assert_has_operator,
    assert_no_operator,
    assert_read_schema_at_most,
    operator_counts,
    pushed_filters,
)

registry._ensure_loaded()


@pytest.fixture(autouse=True)
def _pristine_cache(spark):
    """Static-plan assertions depend on cache state: a subtree left
    persisted by an earlier test substitutes InMemoryRelation (or
    blocks substitution mid-analysis), changing scan counts
    (VERDICT r2: test_cramers_v_census_only flaked at suite position
    with 6 parquet scans vs 3 solo). Clearing before each plan test
    makes every assertion order-independent; builders that persist
    within a query still do so fresh inside the test."""
    spark.catalog.clearCache()
    yield


def q(name, spark, sf_dir):
    return registry.REGISTRY[name].builder(spark, sf_dir)


def count_prefix(counts: dict[str, int], prefix: str) -> int:
    return sum(n for name, n in counts.items() if name.startswith(prefix))


def test_q5_is_pure_broadcast_chain(spark, sf_dir):
    df = q("join_multiway_tpch_q5", spark, sf_dir)
    assert_all_joins_broadcast(df)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") == 5  # 6-table join
    # two-phase agg: partial + final
    assert count_prefix(counts, "HashAggregate") == 2


def test_q5_pushdown_and_pruning(spark, sf_dir):
    df = q("join_multiway_tpch_q5", spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed  # date predicate reached the scan
    assert_read_schema_at_most(
        df,
        "l_orderkey",
        {"l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"},
    )


def test_topk_uses_heap_not_global_sort(spark, sf_dir):
    df = q("topk_orders_by_revenue", spark, sf_dir)
    assert_has_operator(df, "TakeOrderedAndProject")
    assert_all_joins_broadcast(df)


def test_pricing_summary_two_phase_agg(spark, sf_dir):
    df = q("agg_pricing_summary", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "HashAggregate") == 2
    assert "l_shipdate" in " ".join(pushed_filters(df))


def test_project_compute_prunes_scan(spark, sf_dir):
    df = q("project_compute", spark, sf_dir)
    assert_read_schema_at_most(
        df,
        "l_orderkey",
        {
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_quantity",
        },
    )
    assert "l_orderkey" in " ".join(pushed_filters(df))


def test_enrichment_join_broadcasts_dim(spark, sf_dir):
    df = q("join_broadcast_enrich", spark, sf_dir)
    assert_all_joins_broadcast(df)


def test_minhash_has_no_cross_join(spark, sf_dir):
    df = q("neardup_minhash_candidates", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")


def test_sessionize_single_shuffle_by_user(spark, sf_dir):
    df = q("sessionize_gap30m_batch", spark, sf_dir)
    # lag-gap + running-sum reuse ONE hash partitioning by user_id:
    # adjacent window functions over the same (partition, order) spec
    # must not re-shuffle.
    counts = operator_counts(df)
    assert counts.get("Exchange", 0) <= 2  # one for the window, one final agg/sort


def test_chunking_columnar_no_python(spark, sf_dir):
    df = q("chunk_text_columnar_parity", spark, sf_dir)
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython", "PythonUDTF")


def test_llm_corpus_prep_single_shuffle(spark, sf_dir):
    """The composed corpus-prep chain must keep exactly one Exchange
    (the dedup hash shuffle) — chunk explode and filters add none."""
    df = q("llm_corpus_prep_pipeline", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Exchange") == 1
    assert_no_operator(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_cube_single_shuffle_over_expand(spark, sf_dir):
    """CUBE = Expand (4 grouping sets) + ONE partial+final hash agg;
    dims joined by broadcast so the only exchange is the final agg's."""
    df = q("agg_cube_grouping_sets", spark, sf_dir)
    assert_all_joins_broadcast(df)
    counts = operator_counts(df)
    assert count_prefix(counts, "Expand") >= 1
    assert count_prefix(counts, "HashAggregate") == 2
    assert count_prefix(counts, "Exchange") == 1


def test_intersect_all_no_join(spark, sf_dir):
    """INTERSECT/EXCEPT ALL plan as aggregate+generate (multiplicity
    replication), not a join — no row explosion at scale."""
    df = q("setop_intersect_except_all", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") + count_prefix(counts, "BroadcastNestedLoop") == 0


def test_gopher_single_scan_two_exchanges(spark, sf_dir):
    """The tagged-stream rewrite's contract: ONE documents scan and
    exactly two Exchanges (gram counts, per-doc rollup) — the naive
    two-branch formulation costs double on both."""
    df = q("gopher_repetition_quality", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1
    assert count_prefix(counts, "Exchange") == 2
    assert count_prefix(counts, "SortMergeJoin") == 0


def test_contamination_single_scan_no_join(spark, sf_dir):
    """Per-gram flag aggregation: one scan, no join operator at all."""
    df = q("contamination_ngram_overlap", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1
    for op in counts:
        assert "Join" not in op, counts


def test_corpus_mix_broadcasts_rate_dim(spark, sf_dir):
    """Membership filter joins only against the broadcast rate dim —
    the corpus itself is never shuffled for the resample."""
    df = q("corpus_mix_resample", spark, sf_dir)
    assert_all_joins_broadcast(df)


def test_decile_equidepth_no_global_sort_window(spark, sf_dir):
    """VERDICT r01 perf-weak fix: the equi-depth deciles must not plan
    an unpartitioned window (single-partition global sort). The exact
    rank comes from bucket-partitioned row_number + offsets, so no
    Exchange may be SinglePartition."""
    df = q("agg_decile_equidepth", spark, sf_dir)
    assert_no_operator(df, "SinglePartition")
    # window runs partitioned by range-bucket
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 1


def test_neardup_end_to_end_no_cartesian(spark, sf_dir):
    """The L2 money path: candidate pairs come only from band-bucket
    joins — a regression to all-pairs (CartesianProduct / broadcast
    nested loop over the corpus) is the one thing that cannot ship."""
    df = q("neardup_dedup_end_to_end", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    # exactly one BroadcastNestedLoopJoin is legitimate: the final
    # 1-row scalar-count (n_before) crossJoin — never an all-pairs over
    # the corpus (those would be additional BNLJ/Cartesian nodes)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts


def test_neardup_cluster_cc_no_cartesian(spark, sf_dir):
    df = q("neardup_cluster_cc", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_ann_ivf_no_cartesian(spark, sf_dir):
    """L4: IVF probe joins per-bucket candidates only; the coarse
    centroid assignment is a bounded broadcast, never an all-pairs."""
    df = q("ann_ivf_recall_probe", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")


def test_ann_lsh_bucket_join_no_cartesian(spark, sf_dir):
    df = q("ann_lsh_recall_probe", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")


def test_embedding_lsh_neardup_no_cartesian(spark, sf_dir):
    """Candidate pairs come only from the sign-LSH bucket equi-join."""
    df = q("neardup_embedding_lsh", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_q6_pushdown_all_predicates(spark, sf_dir):
    """Q6 is the pushdown showcase: every predicate reaches the scan
    and ReadSchema is exactly the 4 referenced columns."""
    df = q("tpch_q6_forecast_revenue", spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    assert_read_schema_at_most(
        df,
        "l_shipdate",
        {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"},
    )
    counts = operator_counts(df)
    assert count_prefix(counts, "HashAggregate") == 2


def test_q8_dims_broadcast_one_fact_shuffle(spark, sf_dir):
    """Q8's only big shuffle is lineitem><orders; the six dimension
    joins all broadcast."""
    df = q("tpch_q8_market_share", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 6, counts
    assert count_prefix(counts, "CartesianProduct") == 0


def test_q10_take_ordered_top20(spark, sf_dir):
    df = q("tpch_q10_returned_items", spark, sf_dir)
    assert_has_operator(df, "TakeOrderedAndProject")
    assert "l_returnflag" in " ".join(pushed_filters(df))


def test_q15_argmax_no_single_partition_window(spark, sf_dir):
    """Q15's max-revenue must come from a broadcast scalar join, not a
    global window over the per-supplier frame."""
    df = q("tpch_q15_top_supplier", spark, sf_dir)
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 0, counts


def test_q18_qualifying_set_broadcasts(spark, sf_dir):
    """The HAVING-filtered orderkey set is tiny by construction and
    must broadcast into the semi join."""
    df = q("tpch_q18_large_orders", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert_has_operator(df, "TakeOrderedAndProject")


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Compact-forward triangle counting: wedges come from the oriented
    edge self-equi-join on the low endpoint; the only BNLJ nodes are the
    final three 1-row scalar crossJoins."""
    df = q("triangle_count_graph", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 2, counts


def test_char_entropy_no_python_no_join(spark, sf_dir):
    """Entropy is pure Catalyst: explode + two hash aggs; no Python
    eval, no join over the corpus."""
    df = q("char_entropy_quality", spark, sf_dir)
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython")
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts


def test_semantic_cluster_assign_broadcast_centroids(spark, sf_dir):
    """The k-centroid E-step must broadcast the centroids (bounded k)
    and keep the argmax window partitioned by vector."""
    df = q("semantic_cluster_assign", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "SortMergeJoin")
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 1


def test_multiline_single_shuffle_no_joins(spark, sf_dir):
    """Multiline reassembly is the sessionize shape: the doc_id
    shuffle feeds both the running-sum window and the reassembly agg —
    no join, no second exchange for the groupBy."""
    df = q("multiline_reassemble_logs", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 1
    assert count_prefix(counts, "Exchange") == 1, counts


def test_join_strategy_hints_respected(spark, sf_dir):
    """§4 optimizer control surface: users migrating hand-tuned
    queries need join-strategy hints to stick. merge → SortMergeJoin,
    shuffle_hash → ShuffledHashJoin, broadcast → BroadcastHashJoin,
    regardless of size estimates."""
    from eventstreams_spark.catalog import load_table
    from eventstreams_spark.plans import operator_counts

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for hint, op in (
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
        ("broadcast", "BroadcastHashJoin"),
    ):
        df = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        counts = operator_counts(df)
        assert count_prefix(counts, op) == 1, (hint, counts)


def test_semantic_dedup_end_to_end_bucketed_pairs(spark, sf_dir):
    """The L4 capstone: duplicate pairs must come only from the
    in-cluster equi-join (bucketed), never an all-pairs; the only BNLJ
    is the 8-row centroid broadcast."""
    df = q("semantic_dedup_end_to_end", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    # the printed tree repeats the persisted `assigned` lineage under
    # each of the summary branches; every BNLJ in it is the same 8-row
    # centroid broadcast (once per assigned/dup_pairs reference, ≤6) —
    # a corpus-level all-pairs would also show as CartesianProduct,
    # asserted absent above
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 6, counts


def test_kcore_semi_join_shape(spark, sf_dir):
    """k-core peeling must plan the survivor restriction as semi
    joins — never an all-pairs or a window over the vertex set."""
    df = q("kcore_peel_rounds", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    # the only BNLJ nodes are the four 1-row scalar crossJoins
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 4, counts


def test_two_level_sessionize_shape(spark, sf_dir):
    """Skew-safe sessionize: two window stages — event-level windows
    partitioned by (user, day), stitch windows over the summary frame
    — and never an unpartitioned window."""
    df = q("sessionize_two_level_skew_safe", spark, sf_dir)
    assert_no_operator(df, "SinglePartition")
    counts = operator_counts(df)
    # 2 Window operators per level (lag flag and running sum carry
    # different frames, so Catalyst plans them as separate nodes over
    # the SAME exchange) — the partitioning is what matters
    assert counts.get("Window", 0) == 4, counts
    for op in counts:
        assert "Join" not in op, counts


def test_fuzzy_blocked_no_cartesian(spark, sf_dir):
    """The mask-index fuzzy join must candidate-generate via the
    (klen, pos, mask) equi-join — never the V×V product the brute
    force oracle uses."""
    df = q("fuzzy_blocked_typo_pairs", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_scd2_single_shuffle_no_join(spark, sf_dir):
    """SCD2 interval building is one lead() window by key — no
    self-join, one exchange."""
    df = q("scd2_intervals_from_changelog", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 1
    assert count_prefix(counts, "Exchange") == 1, counts


def test_winsorize_broadcasts_cuts(spark, sf_dir):
    """The per-group quantile cuts broadcast back onto the fact scan;
    the corpus shuffles only for the final group agg."""
    df = q("winsorize_by_group", spark, sf_dir)
    assert_all_joins_broadcast(df)


def test_stratified_sample_group_limit_pushdown(spark, sf_dir):
    """Per-stratum top-5 must plan the rank filter as a
    WindowGroupLimit (partial+final) so rows beyond rank 5 never
    fully sort."""
    df = q("weighted_sample_stratified", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "WindowGroupLimit") == 2, counts
    for op in counts:
        assert "Join" not in op, counts


def test_line_dedup_no_joins(spark, sf_dir):
    """Global span keep-first is a window + reassembly aggregation —
    no self-join on the corpus."""
    df = q("line_dedup_reassemble", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 1
    # the occ=1 filter plans as a group-limit pushed below the window
    # (partial+final) — rows beyond the first per span never sort
    assert count_prefix(counts, "WindowGroupLimit") == 2


def test_kmeans_rounds_broadcast_both_estep(spark, sf_dir):
    """Both Lloyd E-steps must broadcast their k-row centroid side —
    the corpus never shuffles for assignment; the only aggregation
    shuffles are the bounded (cid, dim) M-step and the final tiny
    per-centroid joins. No cartesian anywhere."""
    df = q("kmeans_lloyd_rounds", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    # exactly the two E-step broadcast crossJoins; both argmax windows
    # partitioned by vec_id (SinglePartition appears only inside
    # Catalyst's injected runtime bloom-filter agg — bounded buffers,
    # not a data-path repartition, so it is not asserted against)
    # formatted plans re-render cached (persist) subtrees under each
    # InMemoryTableScan, so node counts overcount — assert SHAPE, not
    # multiplicity: every nested-loop join must be a broadcast Cross
    for op, n in counts.items():
        if op.startswith("BroadcastNestedLoopJoin"):
            assert "Cross Build" in op, counts
    assert counts.get("Window", 0) >= 2, counts


def test_lpa_no_cartesian_windows_per_node(spark, sf_dir):
    """LPA rounds are join + count + per-node argmax — no cartesian,
    no unpartitioned window."""
    df = q("label_propagation_communities", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    assert_no_operator(df, "SinglePartition")
    counts = operator_counts(df)
    assert counts.get("Window", 0) >= 2, counts


def test_counter_rate_exchange_reuse(spark, sf_dir):
    """PromQL rate: the series-key shuffle must feed both the lag
    window and the per-series aggregation — one exchange, no join."""
    df = q("counter_rate_resets", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 1
    assert count_prefix(counts, "Exchange") == 1, counts


def test_mad_outliers_keyed_only(spark, sf_dir):
    """Median/MAD passes are keyed aggregations joined back on the
    series key — no window at all, no cartesian."""
    df = q("anomaly_mad_outliers", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin", "Window")


def test_aggregate_correlate_single_key_shuffles(spark, sf_dir):
    """Logstash-aggregate analog: all three passes are keyed on
    user_id — no window, no cartesian; join count is exactly the
    start + end correlation joins (plus their exchange reuse)."""
    df = q("aggregate_task_correlate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin", "Window")


def test_template_signature_single_agg_no_explode(spark, sf_dir):
    """Drain-lite signature: a pure projection + ONE map-side-
    combinable aggregation — no explode/Generate, no join, no window."""
    df = q("log_template_signature", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Generate" not in op, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts


def test_bm25_broadcast_scalars_no_cartesian_blowup(spark, sf_dir):
    """BM25: df and (n_docs, avgdl) are broadcast 1-row/tiny sides;
    the only nested-loop joins are those scalar broadcasts; doc join
    is keyed; top-15 via heap, not a global sort."""
    df = q("bm25_topk_docs", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert_has_operator(df, "TakeOrderedAndProject")
    # every BNLJ present must be a broadcast of the scalar stats frame
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts


def test_unigram_surprisal_token_join_keyed(spark, sf_dir):
    """Surprisal: the tokens-vocab join is keyed (shuffle or broadcast
    hash — NEVER nested-loop except the 1-row total), one per-doc agg."""
    df = q("unigram_surprisal_quality", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    assert_has_operator(df, "TakeOrderedAndProject")


def test_profile_single_scan_expand(spark, sf_dir):
    """Column profile: ONE scan of events feeds the multi-distinct
    Expand — no joins, no windows, no re-reads."""
    df = q("profile_columns_events", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Expand") == 1, counts


def test_streak_islands_one_exchange(spark, sf_dir):
    """Gaps-and-islands: both row_numbers and the groupBy ride ONE
    user_id exchange (sessionize-class shape); no joins."""
    df = q("streak_islands_by_user", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert count_prefix(counts, "Exchange") == 1, counts


def test_impossible_travel_pure_window(spark, sf_dir):
    """Impossible travel: one lag window over the user_id shuffle and
    codegen trig — no joins, no UDF eval nodes."""
    df = q("impossible_travel_speed", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 1, counts
    assert count_prefix(counts, "BatchEvalPython") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 0, counts


def test_containment_no_doc_cross_product(spark, sf_dir):
    """Containment: candidates only from the rare-gram equi-join —
    no cartesian/BNLJ anywhere in the plan."""
    df = q("containment_quote_pairs", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_xml_roundtrip_no_shuffle_added_by_parse(spark, sf_dir):
    """from_xml runs inside the projection: plan is scan → project →
    two-phase agg → sort, with exactly the agg exchange."""
    df = q("xml_extract_roundtrip", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts


def test_regression_family_single_agg(spark, sf_dir):
    """regr_* family: one scan, two-phase moment aggregate, no joins
    or windows — same cost class as avg."""
    df = q("agg_regression_family", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts


def test_bitmap_gate_no_expand_on_bitmap_path(spark, sf_dir):
    """Bitmap distinct: the bitmap branch aggregates bytes (no
    Expand); only the exact-side count_distinct contributes one."""
    df = q("bitmap_distinct_gate", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Expand") <= 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_interval_coverage_one_exchange(spark, sf_dir):
    """Interval merge: running-max window, island sum, and both aggs
    all ride ONE user_id exchange."""
    df = q("interval_coverage_merge", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    # one user_id hash exchange on the data path + the final orderBy's
    # range exchange (presentation only)
    assert count_prefix(counts, "Exchange") <= 2, counts


def test_acf_single_window_single_agg(spark, sf_dir):
    """ACF: all three lags from ONE Window node, one moment agg."""
    df = q("acf_lag_profile", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 1, counts


def test_markov_window_on_tiny_matrix(spark, sf_dir):
    """Markov: lead window shuffles by user; the normalization window
    runs AFTER the aggregate (tiny frame), so exactly two Windows and
    no joins."""
    df = q("markov_transition_matrix", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 2, counts


def test_journey_paths_group_limit_pushdown(spark, sf_dir):
    """Journey paths: rn <= 3 must push as WindowGroupLimit so each
    user ships at most 3 rows into the path aggregation."""
    df = q("journey_top_paths", spark, sf_dir)
    assert_has_operator(df, "WindowGroupLimit")
    assert_has_operator(df, "TakeOrderedAndProject")


def test_rfm_no_single_partition_sort(spark, sf_dir):
    """RFM: the monetary quintile must come from the bucketed exact
    rank — no SinglePartition window over the customer frame."""
    import re

    df = q("rfm_segment_census", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Window .*SinglePartition", plan), plan[:2000]
    assert_no_operator(df, "CartesianProduct")


def test_pseudonymize_single_scan(spark, sf_dir):
    """Pseudonymize: projection + one (expanded) aggregate over one
    scan; no joins/windows."""
    df = q("pseudonymize_stable_ids", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "Scan parquet") == 1, counts


def test_mmr_bounded_pool_only(spark, sf_dir):
    """MMR: every nested-loop join is a bounded broadcast (query vec /
    picked set); no CartesianProduct. The pool build (cosine + top-12
    heap) now executes inside a truncate_lineage boundary — its
    TakeOrderedAndProject ran at checkpoint time and the visible plan
    reads the materialized RDD, so the assertion here is on the
    still-visible greedy rounds only."""
    df = q("mmr_diverse_topk", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan ExistingRDD") >= 1, counts


def test_welch_t_single_aggregate_over_scan(spark, sf_dir):
    """Welch t: one (partial+final) moment aggregate; the only join is
    the final 1-row × 1-row combine."""
    df = q("welch_t_test", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") == 0, counts
    assert count_prefix(counts, "Scan parquet") <= 2, counts


def test_mann_whitney_window_on_buckets_only(spark, sf_dir):
    """Mann-Whitney: the prefix-sum window may be global BUT runs on
    the distinct-bucket frame (post-aggregation), never raw events —
    assert the window sits above a HashAggregate in the plan."""
    df = q("mann_whitney_u", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the aggregate reducing events to buckets must be below the window
    assert plan.index("Window") < plan.rindex("HashAggregate"), plan[:2000]


def test_chi_square_windows_on_census(spark, sf_dir):
    """Chi-square: windows partition by et/dow over the tiny census."""
    df = q("chi_square_independence", spark, sf_dir)
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 2, counts
    # census scan + the 1-row grand-total branch (broadcast scalar)
    assert count_prefix(counts, "Scan parquet") <= 2, counts


def test_promql_histq_no_sort_no_window(spark, sf_dir):
    """histogram_quantile: conditional aggregate + scalar CASE — no
    window, no sort before the final ORDER BY, no join."""
    df = q("promql_histogram_quantile", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts


def test_hits_keyed_joins_only(spark, sf_dir):
    """HITS rounds: every join is keyed (src/dst) — no cartesian, no
    nested loop; rounds are joins + combinable aggregates."""
    df = q("hits_two_rounds", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    assert_has_operator(df, "TakeOrderedAndProject")


def test_key_skew_profile_broadcast_totals(spark, sf_dir):
    """Skew profiler: the only nested-loop joins are the 1-row total
    broadcasts (one per profiled column)."""
    df = q("key_skew_profile", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 2, counts


def test_ablation_single_scan(spark, sf_dir):
    """Ablation census: one documents scan, one two-phase aggregate."""
    df = q("quality_filter_ablation", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "Scan parquet") == 1, counts


def test_aes_roundtrip_stays_in_codegen(spark, sf_dir):
    """AES roundtrip: no Python eval nodes — encrypt/decrypt are JVM
    expressions inside the projection."""
    df = q("aes_roundtrip_identity", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BatchEvalPython") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 0, counts
    for op in counts:
        assert "Join" not in op, counts


def test_dau_contribution_explode_no_selfjoin(spark, sf_dir):
    """DAU/WAU/MAU: trailing actives from the contribution explode —
    no fact self-join, no sliding distinct window; the only join is
    days × per-day aggregates."""
    df = q("dau_wau_mau_actives", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    assert counts.get("Window", 0) == 0, counts
    assert count_prefix(counts, "Generate") == 1, counts  # the explode


def test_new_vs_returning_keyed_join(spark, sf_dir):
    """first-seen join rides the user_id partitioning; no windows."""
    df = q("new_vs_returning_daily", spark, sf_dir)
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_ndr_copartitioned_selfjoin(spark, sf_dir):
    """NDR: (customer, month) aggregate self-joined on the customer
    key — no cartesian/BNLJ, no window."""
    df = q("net_revenue_retention_monthly", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    assert counts.get("Window", 0) == 0, counts


def test_pareto_no_single_partition_rank(spark, sf_dir):
    """Pareto: rank from the bucketed construction; the only
    unpartitioned window runs on the 10-row decile frame (cum share)."""
    import re

    df = q("pareto_revenue_deciles", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # legitimate SinglePartitions: the 10-row decile cum-share window,
    # the 1-row grand total, and exact_global_rank's bounded bucket-
    # count metadata — never the customer-frame rank itself (its
    # Window partitions by range bucket)
    assert plan.count("SinglePartition") <= 3, plan[:2000]
    assert "row_number" in plan


def test_embedding_drift_keyed_joins(spark, sf_dir):
    df = q("embedding_drift_by_label", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_token_kl_single_token_shuffle(spark, sf_dir):
    """KL: one conditional count keyed by token + 1-row broadcast
    total; no window."""
    df = q("token_kl_divergence_sources", spark, sf_dir)
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 0, counts
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts


def test_session_stats_reuses_w8_shape(spark, sf_dir):
    """Session stats: same single user_id exchange feeding both
    windows as sessionize_gap30m_batch."""
    df = q("session_stats_summary", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) >= 1, counts


def test_attribution_range_join_keyed(spark, sf_dir):
    """First/last-touch: conversion × touch join is keyed on user_id
    (range predicate within partitions), never nested-loop."""
    df = q("attribution_first_last_compare", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_seasonal_outliers_census_then_broadcast(spark, sf_dir):
    """Seasonal z: fact reduces to the hourly census once; baseline
    joins back broadcast."""
    df = q("seasonal_residual_outliers", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") <= 2, counts
    assert_no_operator(df, "CartesianProduct")


def test_basket_pairs_within_order_only(spark, sf_dir):
    """Basket lift: pair join keyed on l_orderkey; part dim broadcast;
    no cartesian anywhere."""
    df = q("basket_copurchase_lift", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    # scalar order-count broadcast is the only BNLJ
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    assert_has_operator(df, "TakeOrderedAndProject")


def test_percentile_bands_pushdown(spark, sf_dir):
    """Bands: the time filter must reach the scan."""
    df = q("hourly_percentile_bands", spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "ts" in pushed, pushed
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts


def test_rapid_fire_single_exchange(spark, sf_dir):
    """Rapid-fire audit: lag window + census ride the (user,type)
    exchange; top-k via heap."""
    df = q("rapid_fire_duplicates", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert_has_operator(df, "TakeOrderedAndProject")


def test_rank_movers_partitioned_ranks(spark, sf_dir):
    """Movers: row_number partitions by week (never SinglePartition
    over the user frame); movers join keyed on user_id."""
    df = q("rank_movers_week_over_week", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert not re.search(r"Exchange SinglePartition[\s\S]{0,400}Window", plan), (
        plan[:2000]
    )
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_modularity_keyed_joins_only(spark, sf_dir):
    """Modularity: every join keyed (node/community) except the 1-row
    edge-count broadcast."""
    df = q("community_modularity_score", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts


def test_incremental_dedup_bipartite_only(spark, sf_dir):
    """Incremental dedup: the ONLY nested-loop is the broadcast seed
    frame (and the final 1-row census crossJoins); candidates come
    from the bipartite band equi-join — no ref×ref, no CartesianProduct."""
    df = q("incremental_dedup_vs_reference", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    # seeds ×2 sides + 3 scalar-census combines
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 5, counts


def test_path_trigrams_one_window(spark, sf_dir):
    """Trigrams: both leads from ONE window; census keyed bounded."""
    df = q("path_trigrams_census", spark, sf_dir)
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 1, counts
    for op in counts:
        assert "Join" not in op, counts


def test_relative_risk_two_aggregates(spark, sf_dir):
    """2×2 exposure census: per-user flags + global fold, no joins."""
    df = q("exposure_outcome_relative_risk", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts


def test_cramers_v_census_only(spark, sf_dir):
    # three census consumers in the STATIC plan (obs/tot/chi); the
    # builder persists obs so only one scan runs at execution time —
    # unexecuted plans don't show InMemoryRelation, hence <= 3 here
    df = q("cramers_v_lang_source", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "Scan parquet") <= 3, counts


def test_aging_buckets_single_pass(spark, sf_dir):
    df = q("orders_aging_buckets", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts


def test_dedup_savings_digest_keyed(spark, sf_dir):
    """Storage savings: hash-keyed group + 1-row fold; text bytes
    never shuffle beyond the digest aggregate's input."""
    df = q("dedup_storage_savings", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op and "Window" not in op, counts


def test_funnel_by_segment_broadcast_dim(spark, sf_dir):
    """Segment funnel: customer dim joins broadcast; stage joins
    keyed on user_id — no cartesian."""
    df = q("funnel_by_segment", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_bmp_parse_python_only_in_map(spark, sf_dir):
    """BMP: exactly one Python stage (the Arrow mapInPandas header
    parse); construction and aggregation stay JVM-side."""
    df = q("multimodal_bmp_header_parse", spark, sf_dir)
    counts = operator_counts(df)
    python_nodes = sum(
        n
        for name, n in counts.items()
        if "Python" in name or "Arrow" in name or "MapInPandas" in name
    )
    assert python_nodes == 1, counts


def test_hits_normalized_no_cartesian(spark, sf_dir):
    df = q("hits_normalized_scores", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")


# ---------------------------------------------------------- TPC-H r3 wave


def test_q2_decorrelated_min_join(spark, sf_dir):
    """Q2 shape: the correlated min-cost subquery must decorrelate to
    aggregate + equi-join — no nested-loop re-execution per row, dims
    broadcast, top-100 via TakeOrderedAndProject (no global sort)."""
    df = q("tpch_q2_min_cost_supplier", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    # offers (partkey,suppkey) + best (partkey): two 2-phase aggs
    assert count_prefix(counts, "HashAggregate") >= 4, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 2, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_q9_single_big_shuffle(spark, sf_dir):
    """Q9 shape: part/supplier/nation broadcast; the only non-broadcast
    join is lineitem><orders on orderkey."""
    df = q("tpch_q9_profit_decomposition", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 3, counts
    non_broadcast = sum(
        n for name, n in counts.items()
        if "Join" in name and not name.startswith("Broadcast")
    )
    assert non_broadcast <= 1, counts


def test_q11_scalar_share_broadcast(spark, sf_dir):
    """Q11 shape: the global-total scalar subquery decorrelates to a
    1-row broadcast over the per-part frame — at most ONE nested-loop
    join (the quarantined 1-row scalar), never a real cartesian."""
    df = q("tpch_q11_important_stock_share", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    # per-part agg + global-total agg, both two-phase
    assert count_prefix(counts, "HashAggregate") >= 4, counts


def test_q16_not_in_is_broadcast_anti(spark, sf_dir):
    """Q16 shape: NOT IN over the non-null complaint-supplier set must
    plan as a broadcast LEFT ANTI hash join; distinct-pair extraction
    and distinct supplier counts stay hash aggregates."""
    df = q("tpch_q16_supplier_part_counts", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_q20_nested_semi_no_reexecution(spark, sf_dir):
    """Q20 shape: nested correlated aggregates decorrelate to two
    grouped aggregates joined on partkey; the supplier membership test
    is a broadcast LEFT SEMI. The 1997 predicate pushes to the scan."""
    df = q("tpch_q20_excess_shippers", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]
    assert "l_shipdate" in " ".join(pushed_filters(df))
    counts = operator_counts(df)
    assert count_prefix(counts, "HashAggregate") >= 4, counts


# ------------------------------------------- r2 heavy hitters (VERDICT #4)


def test_bm25_postings_shapes(spark, sf_dir):
    """BM25: tf explode is filtered to query terms BEFORE any shuffle;
    df joins broadcast; the only nested-loop is the 1-row (n_docs,
    avgdl) scalar; top-15 is a heap, not a global sort."""
    df = q("bm25_topk_docs", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_incremental_dedup_bipartite_only(spark, sf_dir):
    """Incremental (crawl-update) dedup: candidate pairs come from
    band-bucket equi joins between NEW and REF only — no cartesian;
    the bounded nested-loops are the documented tiny scalar frames."""
    df = q("incremental_dedup_vs_reference", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 5, counts
    # the anti/semi joins that subtract ref-dups must all broadcast
    assert count_prefix(counts, "BroadcastHashJoin LeftAnti") >= 1, counts


def test_kmeans_estep_broadcast_centroids(spark, sf_dir):
    """Lloyd rounds: every points×centroids E-step is a broadcast of
    the k-row codebook (bounded BNLJ count), never a cartesian of the
    points against themselves."""
    df = q("kmeans_lloyd_rounds", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 7, counts


def test_containment_pairs_equi_join_only(spark, sf_dir):
    """Rare-gram blocking: candidate pairs exist ONLY inside a
    rare-gram equi join — zero nested-loop/cartesian anywhere."""
    df = q("containment_quote_pairs", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_interval_coverage_single_user_shuffle(spark, sf_dir):
    """Interval merge: the running-max window, island-id window and
    both aggs all reuse ONE user_id hash partitioning (+1 exchange for
    the final presentation sort); no joins at all."""
    df = q("interval_coverage_merge", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    assert counts.get("Window", 0) == 2, counts
    assert count_prefix(counts, "Exchange") <= 2, counts


# --------------------------------------------------- r3 breadth queries


def test_betweenness_level_joins_no_cartesian(spark, sf_dir):
    """Sampled Brandes: every level is a frontier><edges equi join;
    the only broadcasts are the source sample and small frontiers —
    no cartesian, no nested loop."""
    df = q("betweenness_sampled_brandes", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_session_path_one_user_shuffle(spark, sf_dir):
    """Path clustering reuses ONE user_id partitioning for the gap
    flag, session ids and per-session collection; the cluster census
    shuffles only (cluster, path) keys."""
    df = q("session_path_clusters", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert counts.get("Window", 0) >= 3, counts  # gap lag, sid sum, rn, exemplar


def test_ks_window_over_distinct_values_only(spark, sf_dir):
    """KS: the cumulative window runs over per-DISTINCT-value steps
    (one HashAggregate BEFORE the window), never over raw rows."""
    df = q("ks_two_sample_test", spark, sf_dir)
    counts = operator_counts(df)
    assert counts.get("Window", 0) == 1, counts
    assert count_prefix(counts, "HashAggregate") >= 2, counts
    assert_no_operator(df, "CartesianProduct")


def test_countmin_cells_broadcast_probe(spark, sf_dir):
    """CMS gate: sketch cells aggregate map-side; the probe slice
    joins by equi key — no cartesian beyond the 1-row N scalar."""
    df = q("countmin_error_gate", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts


def test_histogram_gate_bucket_window_bounded(spark, sf_dir):
    """Histogram quantile gate: windows run over the 128-bucket frames
    (bounded by sketch width, not rows); bounds join broadcast."""
    df = q("histogram_quantile_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_closeness_shares_bfs_shape(spark, sf_dir):
    """Closeness reuses the sampled-BFS levels: frontier joins only,
    no cartesian/nested-loop; one agg over the level union."""
    df = q("closeness_harmonic_sampled", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_pk_census_single_expand_pass(spark, sf_dir):
    """PK census: all four distinct counts in ONE Expand + two-phase
    agg over one scan — not four scans."""
    df = q("pk_candidate_census", spark, sf_dir)
    counts = operator_counts(df)
    for op in counts:
        assert "Join" not in op, counts
    # union of 4 presentation rows re-reads the 1-row agg, not the table
    assert count_prefix(counts, "Scan parquet") <= 4, counts
    assert count_prefix(counts, "Expand") >= 1, counts


def test_gdpr_purge_broadcast_anti_semi(spark, sf_dir):
    """Purge audit: deletion list broadcasts into anti/semi joins;
    only the two 1-row count scalars cross-join."""
    df = q("gdpr_purge_audit", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan[:1500]


def test_spatial_grid_join_equi_only(spark, sf_dir):
    """Spatial join: candidates exist only inside the 9-neighbor cell
    equi join — never point×point."""
    df = q("spatial_grid_join_pairs", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert sum(n for op, n in counts.items() if "Join" in op) == 1, counts


def test_ppr_pregel_layout(spark, sf_dir):
    """Personalized PageRank keeps the PageRank Pregel layout: edges
    cached pre-partitioned by src, one equi join + one combinable agg
    per iteration, no cartesian/nested-loop; top-15 via heap."""
    df = q("personalized_pagerank_seeds", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_bellman_ford_one_join_one_agg_per_round(spark, sf_dir):
    """Bellman-Ford: frontier><edges + min-agg per round, heap top-25,
    no cartesian. Round 1's frontier is the literal 1-row source, so
    Catalyst constant-folds its join key away — at most that ONE
    benign 1-row nested loop; later rounds stay equi joins."""
    df = q("bellman_ford_rounds", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_weighted_pagerank_pregel_layout(spark, sf_dir):
    """Weighted PageRank: weights fold into the existing Pregel layout
    — edge-count groupBy once, one equi join + one combinable sum per
    iteration, heap top-25, no cartesian/nested-loop anywhere."""
    df = q("pagerank_weighted_edges", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_louvain_adjacency_joins_only(spark, sf_dir):
    """Louvain first sweep: gains come from adjacency⋈degree equi
    joins (never node×node); the only cross join is the broadcast of
    the 1-row Q_num scalar; argmax move is a per-node window."""
    df = q("louvain_first_sweep", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts  # 1-row q_num
    # the argmax window runs inside the labels truncate_lineage
    # boundary (VERDICT r5 plan-bloat fix); the visible plan reads the
    # checkpointed labels RDD and must stay equi-join + rollup only
    assert count_prefix(counts, "Scan ExistingRDD") >= 1, counts


def test_geohash_single_count_shuffle(spark, sf_dir):
    """Geohash census: stateless map over ONE customer scan + one
    count aggregate — no join at all; the bit interleave stays inside
    whole-stage codegen (no Python UDF node)."""
    df = q("geohash_cell_census", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    for bad in ("Join", "BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_tdigest_two_level_pandas_then_broadcast_probe(spark, sf_dir):
    """t-digest gate: two FlatMapGroupsInPandasWithState-free batch
    stages (shard digest + merge = 2 FlatMapGroupsInPandas), estimates
    re-joined to events as a broadcast; no cartesian, no sort of the
    raw values on the Spark side."""
    df = q("tdigest_quantile_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "FlatMapGroupsInPandas") == 2, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_winnowing_bucket_join_only(spark, sf_dir):
    """Winnowing: gram hashing + window mins are map-side array
    transforms; pairs exist only inside the df-capped fingerprint
    equi join — no cartesian/BNLJ, no Python UDF node."""
    df = q("winnowing_fingerprint_pairs", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_bloom_probe_is_all_broadcast(spark, sf_dir):
    """Bloom prefilter: the fact side must NEVER shuffle — every join
    in the probe (3 position tests + the truth flag) is a broadcast
    hash join, and the only exchange left is the 1-row final agg."""
    df = q("bloom_prefilter_semi_join", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") == 4, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "ShuffledHashJoin") == 0, counts


def test_contamination_bipartite_broadcast_bench_side(spark, sf_dir):
    """Winnowing contamination: the benchmark fingerprint side must
    BROADCAST into the bucket join (eval sets are small by
    construction) and nothing may pair train×train — no cartesian,
    no BNLJ, no sort-merge on the fingerprint join."""
    df = q("contamination_winnowing_bipartite", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_hll_intersection_single_scan_sketch_side(spark, sf_dir):
    """HLL inclusion-exclusion gate: the sketch side is ONE aggregate
    over one scan (3 conditional HLLs, no self-join); the only
    nested-loop is the broadcast of that 1-row estimate frame."""
    df = q("hll_intersection_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "SortMergeJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts  # 1-row est
    assert count_prefix(counts, "Scan parquet") == 2, counts


def test_weighted_jaccard_blocked_pairs_only(spark, sf_dir):
    """Weighted Jaccard: candidates exist only through the df-capped
    rare-token bucket join; Σmin is (doc, token) equi joins — no
    cartesian/BNLJ anywhere, heap for the top-20."""
    df = q("weighted_jaccard_pairs", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_louvain_two_level_no_cartesian(spark, sf_dir):
    """Two-level Louvain: both sweeps and the coarsening relabel are
    adjacency equi joins + window argmaxes; the only cross join is the
    broadcast 1-row Q_num scalar."""
    df = q("louvain_coarsened_two_level", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    # both sweeps' argmax windows execute inside truncate_lineage
    # boundaries (VERDICT r5); the final plan reads checkpointed RDDs
    assert count_prefix(counts, "Scan ExistingRDD") >= 1, counts


def test_knn_wrapped_probe_broadcast_cells(spark, sf_dir):
    """Antimeridian kNN: the 9-cell probe frame broadcasts into the
    cell equi join; top-5 via heap; no cartesian anywhere."""
    df = q("spatial_knn_wrapped_probe", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "TakeOrderedAndProject") >= 1, counts


def test_hll_persist_roundtrip_two_scans(spark, sf_dir):
    """Sketch persistence: one raw-events scan for the direct/exact
    side; the merged side reads the PARQUET ROLLUP (not raw events
    again) — the whole point of storing sketches."""
    df = q("hll_sketch_persist_roundtrip", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 2, counts


def test_tdigest_band_broadcast_dimension(spark, sf_dir):
    """Digest-as-dimension: the 5-row cut table broadcasts onto the
    fact scan; banding is map-side; no cartesian/BNLJ/SMJ on the
    classification path."""
    df = q("tdigest_band_classification", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_icws_sketch_no_pair_work_before_collision(spark, sf_dir):
    """ICWS: the only cross join is the broadcast 16-row seed frame;
    sketches meet in an equi join on (doc, k); argmin is a per-(doc,k)
    window, never a global sort."""
    df = q("icws_weighted_minhash_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    # the 16-row seed broadcast appears once per sketch consumer in
    # the STATIC plan (persist materializes only at runtime)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 2, counts
    assert count_prefix(counts, "Window") >= 1, counts


def test_knn_ring_expansion_broadcast_probe_and_cut(spark, sf_dir):
    """Ring-expansion kNN: the 25-cell probe AND the 1-row rings_used
    cut both broadcast; candidates come from the cell equi join; the
    re-rank is a heap, never a global sort; no cartesian on data."""
    df = q("spatial_knn_ring_expansion", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    # the 1-row cut frame crossJoins via broadcast NLJ — bounded by 2
    # static-plan copies of the persisted candidate subtree
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 2, counts
    assert count_prefix(counts, "TakeOrderedAndProject") >= 1, counts


def test_psl_census_all_joins_broadcast_no_explode(spark, sf_dir):
    """PSL longest-match: 4 broadcast rule joins, no explode (Generate)
    and no shuffle before the census aggregate's own exchange."""
    df = q("tld_psl_join_census", spark, sf_dir)
    assert_all_joins_broadcast(df)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") == 4, counts
    assert count_prefix(counts, "Generate") == 0, counts


def test_theil_sen_pairs_on_daily_aggregate_only(spark, sf_dir):
    """Theil-Sen: exactly one raw-events scan feeding the daily
    aggregate; the quadratic pair join runs on the persisted daily
    frame (static plan shows the reused subtree, never a second
    events scan); no cartesian."""
    df = q("theil_sen_daily_slope", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_xcorr_lag_join_on_metadata_frame(spark, sf_dir):
    """Lag scan: the 15-row lag frame broadcast-joins the ~30-row
    daily aggregate; the raw scan collapses in one two-phase agg."""
    df = q("xcorr_lag_scan", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_percentile_band_single_scan_single_agg(spark, sf_dir):
    """Daily band: ONE events scan, one groupBy(day) aggregate; the
    trailing windows run on the bounded day frame."""
    df = q("percentile_band_daily", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Window") >= 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_qdigest_gate_broadcast_estimates(spark, sf_dir):
    """q-digest gate: sketch build is applyInPandas (FlatMapGroups);
    the 5-row estimate frame broadcasts back onto the probe scan."""
    df = q("qdigest_quantile_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "FlatMapGroupsInPandas") >= 2, counts


def test_kll_shootout_gate_broadcast_estimates(spark, sf_dir):
    """KLL shootout: both sketches are two-stage FlatMapGroups builds;
    the joined estimate frame broadcasts onto the rank probe."""
    df = q("kll_tdigest_shootout_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")
    counts = operator_counts(df)
    assert count_prefix(counts, "FlatMapGroupsInPandas") >= 4, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_markov_attribution_count_pipeline_shape(spark, sf_dir):
    """Markov removal effect: the distributed piece is journeys →
    pairs → counts. Pin the pair construction: windows over user
    partitions, no cartesian, unions of the four pair sources."""
    from eventstreams_spark import registry as _r

    # builder returns literals AFTER collecting the bounded count
    # table; assert on the final frame shape instead of the plan
    df = q("markov_removal_attribution", spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 4
    shares = [r.attribution_share for r in rows]
    assert abs(sum(shares) - 1.0) <= 1e-4
    assert all(r.removal_effect >= 0 for r in rows)


def test_hilbert_census_pure_codegen_single_scan(spark, sf_dir):
    """Hilbert keys: pure Column integer arithmetic — no Python UDF
    (BatchEvalPython/ArrowEvalPython), one customer scan, no joins."""
    df = q("hilbert_cell_census", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "BatchEvalPython") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_zonemap_census_two_scans_no_joins(spark, sf_dir):
    """Zone-map census: the two layouts are a unionAll of the same
    scan; zero joins anywhere; two-phase rollups."""
    df = q("zonemap_skipping_census", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 2, counts
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_twap_single_scan_day_partitioned_window(spark, sf_dir):
    """TWAP: one scan, the lead window partitioned by (type, day),
    no joins at all."""
    df = q("twap_daily_by_type", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Window") >= 1, counts
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_hll_sliding_gate_window_over_daily_sketches(spark, sf_dir):
    """Sliding HLL: the union window runs over the ~30-row day frame;
    the exact twin's explode is the only Generate; the est↔exact meet
    is an equi join."""
    df = q("hll_sliding_window_distinct_gate", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") >= 1, counts
    assert count_prefix(counts, "Generate") >= 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_wilson_interval_pure_aggregate_no_joins(spark, sf_dir):
    """Wilson bounds: two stacked aggregates (user grain, variant
    rollup), all closed-form column math — no joins, no windows."""
    df = q("ab_wilson_interval", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "HashAggregate") >= 2, counts
    assert count_prefix(counts, "Window") == 0, counts
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_clamped_balance_single_grouped_fold(spark, sf_dir):
    """Clamped fold: exactly one FlatMapGroupsInPandas over the user
    shuffle; no window reconstruction; one scan."""
    df = q("clamped_running_balance", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "FlatMapGroupsInPandas") == 1, counts
    assert count_prefix(counts, "Window") == 0, counts
    assert count_prefix(counts, "Scan parquet") == 1, counts


def test_zipf_topk_heap_then_bounded_window(spark, sf_dir):
    """Zipf fit: vocabulary top-200 via TakeOrdered heap (never a
    global vocab sort); the rank window runs on the 200-row frame."""
    df = q("zipf_rank_frequency_fit", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "TakeOrderedAndProject") >= 1, counts
    assert count_prefix(counts, "Generate") >= 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_gif_parse_bytes_stay_mapside(spark, sf_dir):
    """GIF parse: construction + sniff are codegen; the only Python
    stage is the Arrow-batched header parse; the exchange carries
    aggregates, not bytes."""
    df = q("multimodal_gif_header_parse", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "MapInPandas") == 1, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_cohort_ltv_window_on_triangle_sizes_broadcast(spark, sf_dir):
    """LTV triangle: cumulative window runs after the (cohort, week)
    rollup — one Window — and cohort sizes join back broadcast."""
    df = q("cohort_ltv_cumulative", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") == 1, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_slo_burn_rate_single_scan_hour_frame_window(spark, sf_dir):
    """SLO burn rates: one scan, hourly rollup, burn windows on the
    hour frame, final 1-row census — no joins anywhere."""
    df = q("slo_burn_rate_alerts", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Window") == 1, counts
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_rrf_fusion_heaps_and_bounded_fusion_join(spark, sf_dir):
    """Hybrid RRF: each modality tops out through a TakeOrdered heap
    (never a global sort), rank windows run on 50-row frames, and the
    only non-broadcast join is the 50×50 full-outer fusion."""
    df = q("hybrid_rrf_fusion", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "TakeOrderedAndProject") >= 2, counts
    assert_no_operator(df, "CartesianProduct")


def test_cuped_three_stacked_aggregates_no_window(spark, sf_dir):
    """CUPED: user-grain conditional agg, 1-row pooled-stats
    broadcast, variant rollup — no windows, no shuffled joins."""
    df = q("ab_cuped_adjustment", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "HashAggregate") >= 4, counts
    assert count_prefix(counts, "Window") == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_roc_auc_windows_on_score_bucket_frame(spark, sf_dir):
    """ROC/KS scorecard: rank math runs on the distinct-score-bucket
    frame (windows after the bucket aggregate), totals broadcast."""
    df = q("roc_auc_ks_scorecard", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") >= 1, counts
    assert count_prefix(counts, "HashAggregate") >= 4, counts
    assert_no_operator(df, "CartesianProduct")


def test_calibration_bins_pure_aggregate(spark, sf_dir):
    """Calibration: integer-division binning + one 10-ary aggregate;
    no windows; the only join is the 1-row total broadcast."""
    df = q("calibration_bins_brier", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") == 0, counts
    assert count_prefix(counts, "HashAggregate") >= 4, counts
    assert_no_operator(df, "CartesianProduct")


def test_gini_single_scan_bucket_frame_window(spark, sf_dir):
    """Gini: one orders scan -> customer rollup -> distinct-dollar
    buckets; the ONLY window is the prefix count over that bucket
    frame — no global rank of customers."""
    df = q("gini_revenue_concentration", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Window") == 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_kaplan_meier_duration_frame_windows(spark, sf_dir):
    """KM churn: user-grain aggregate + 1-row horizon broadcast; risk
    sets and the survival product run on the duration-day frame."""
    df = q("kaplan_meier_churn", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") >= 1, counts
    assert count_prefix(counts, "HashAggregate") >= 4, counts
    assert_no_operator(df, "CartesianProduct")


def test_mase_gapfilled_spine_single_window(spark, sf_dir):
    """MASE: day spine via sequence+explode (Generate), both lags
    share one calendar-frame window, final 1-row scorecard."""
    df = q("seasonal_naive_mase", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Generate") == 1, counts
    assert count_prefix(counts, "Window") == 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_mutual_information_margins_on_cell_frame(spark, sf_dir):
    """MI: one type×hour aggregate; margins are windows over the
    ≤120-cell frame; total is a 1-row broadcast."""
    df = q("mutual_information_type_hour", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") >= 1, counts
    assert count_prefix(counts, "HashAggregate") >= 2, counts
    assert_no_operator(df, "CartesianProduct")


def test_readability_explode_single_rollup_no_joins(spark, sf_dir):
    """Readability: explode + one source-grain aggregate; zero joins,
    zero windows — the whole query is codegen string math."""
    df = q("syllable_readability_profile", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Generate") == 1, counts
    assert count_prefix(counts, "Window") == 0, counts
    assert_no_operator(
        df, "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"
    )


def test_permutation_test_replica_explode_then_aggregate(spark, sf_dir):
    """Permutation test: one Generate (replica explode) feeding a
    combinable per-replica aggregate; observed stat is a 1-row
    broadcast; no windows."""
    df = q("permutation_test_mean_diff", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Generate") == 1, counts
    assert count_prefix(counts, "Window") == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_luhn_census_pure_codegen_single_scan(spark, sf_dir):
    """Luhn census: minted-digit checksum math is all codegen string/
    integer expressions — one events scan, one two-phase aggregate,
    zero joins, zero windows, zero Python."""
    df = q("luhn_validity_census", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "HashAggregate") == 2, counts
    assert count_prefix(counts, "Window") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 0, counts
    assert_no_operator(
        df, "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"
    )


def test_jaro_winkler_pairs_blocked_equi_join(spark, sf_dir):
    """JW matching: the pair generator is an EQUI join on the block
    key (never all-pairs), the UDF is Arrow-vectorized, and the final
    top-25 is a heap."""
    df = q("jaro_winkler_blocked_pairs", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_adamic_adar_wedge_join_no_allpairs(spark, sf_dir):
    """AA link prediction: candidate pairs come from the wedge join
    keyed on the common-neighbor node id; existing edges leave via a
    join (anti); top-20 is a TakeOrdered heap — no cartesian shapes
    anywhere."""
    df = q("adamic_adar_link_prediction", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_phrase_match_generate_window_broadcast(spark, sf_dir):
    """Phrase query: one tokenize Generate feeds per-doc lead windows
    (partitioned — fully parallel); the top-1 phrase joins back as a
    broadcast; doc ranking is a heap. The 1-row phrase attach is the
    only nested-loop (broadcast-of-one) allowed."""
    df = q("phrase_bigram_positional_match", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Generate") >= 1, counts
    assert count_prefix(counts, "Window") >= 1, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    # 3 heaps: the top-1 phrase (built once per consumer) + final top-10
    assert count_prefix(counts, "TakeOrderedAndProject") >= 1, counts
    assert count_prefix(counts, "Sort ") == 0, counts  # no global sort
    assert_no_operator(df, "CartesianProduct")


def test_louvain_full_loop_per_round_shape(spark, sf_dir):
    """Full Louvain loop (VERDICT r3 #6 tripwire): the returned gate
    frame must stay join-light — no cartesian/node×node anywhere, the
    final contract row assembled from bounded scalar aggregates. The
    per-round sweep machinery (equi joins + window argmax) runs inside
    the build; its no-cartesian property is inherited because any
    cartesian would surface in the collected rounds' jobs, which this
    call executes."""
    df = q("louvain_full_loop_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    # the only nested-loop joins allowed are 1-row scalar broadcasts
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 6, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_adstock_fold_stays_jvm_side(spark, sf_dir):
    """Geometric adstock: the fold must run as a JVM aggregate() over
    packed arrays — no Python eval node, no join at all; one rollup
    shuffle + one pack shuffle."""
    df = q("adstock_geometric_fold", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "Join") == 0, counts
    assert count_prefix(counts, "Scan parquet") == 1, counts


def test_alert_fsm_fold_stays_jvm_side(spark, sf_dir):
    """Alert-flap FSM: same contract as adstock — the state machine
    lives in whole-stage codegen, not a Python worker; the only join
    is the broadcast of the per-type mean."""
    df = q("alert_flap_suppression_fsm", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert count_prefix(counts, bad) == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_shapley_constant_size_lattice(spark, sf_dir):
    """Shapley: one scan rollup feeding a persisted 16-row coalition
    frame (the cached lineage's scan still prints, so ≤2 scans appear
    in the formatted plan); the coalition algebra is broadcast joins
    over ≤16-row frames — no cartesian blowup, no shuffle join."""
    df = q("shapley_channel_attribution", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") <= 2, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_ktruss_triangle_join_shape(spark, sf_dir):
    """k-truss rounds: triangle enumeration must stay an equi join
    (two-hop + closing edge) — no cartesian/BNLJ beyond the 1-row
    scalar crossJoins of the final census."""
    df = q("ktruss_support_rounds", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "CartesianProduct") == 0, counts
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 2, counts


def test_weighted_median_single_shuffle_window(spark, sf_dir):
    """Weighted median: one window pass on the group key; no join,
    no TakeOrdered of raw rows, no Python."""
    df = q("weighted_median_by_flag", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Join"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "Window") >= 1, counts


def test_langid_profile_broadcasts(spark, sf_dir):
    """Trigram lang-ID: the profile must broadcast into the scoring
    join (the gram stream never shuffles for the join)."""
    df = q("langid_char_trigram_confusion", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_beaconing_single_entity_shuffle(spark, sf_dir):
    """Beaconing: the lag window and CV agg share the entity-key
    partitioning; ranking is a TakeOrdered heap, never a global
    sort; no join, no Python."""
    df = q("beaconing_interval_regularity", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Join"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "TakeOrderedAndProject") == 1, counts


def test_skyline_single_sweep_window(spark, sf_dir):
    """Skyline: ONE running-max window computes the frontier — no
    join, no self-product (the naive skyline is O(n²))."""
    df = q("skyline_pareto_frontier", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Join") == 0, counts
    assert count_prefix(counts, "Window") >= 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_snapshot_diff_joins_snapshots_not_events(spark, sf_dir):
    """Snapshot diff: the full-outer join runs on the two keep-latest
    SNAPSHOT frames (post-aggregation), and the day-15 filter is
    pushed to its scan."""
    df = q("snapshot_diff_audit", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin FullOuter") \
        + count_prefix(counts, "ShuffledHashJoin FullOuter") >= 1, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_matryoshka_single_scan_broadcast_query(spark, sf_dir):
    """Matryoshka recall: both rankings derive from ONE candidate
    scan with the 1-row query vector broadcast; the zip_with cosine
    stays JVM-side (no Python eval)."""
    df = q("matryoshka_prefix_recall", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts


def test_negative_sampling_vocab_broadcasts(spark, sf_dir):
    """Negative sampling: the cumulative-weight vocabulary must
    BROADCAST into the interval join against the draw stream (a
    shuffle range-join here would shuffle every draw)."""
    df = q("negative_sampling_pairs", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") >= 1, counts
    assert count_prefix(counts, "CartesianProduct") == 0, counts


def test_poisson_bootstrap_stays_jvm_and_collapses_mapside(spark, sf_dir):
    """Poisson bootstrap: the rows×B fan-out must collapse map-side —
    two-phase HashAggregate over the replicate keys, zero Python
    evals (weights are pure codegen md5/CASE), and no shuffle joins
    (the full-mean side is a 1-row broadcast)."""
    df = q("poisson_bootstrap_ci", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "HashAggregate") >= 2, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_kalman_fold_no_python_no_join(spark, sf_dir):
    """Kalman JVM fold: the whole walk is one rollup + collect_list +
    aggregate() lambda — no join anywhere, no Python worker."""
    df = q("kalman_level_filter_check", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Join") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_target_encode_all_joins_broadcast(spark, sf_dir):
    """OOF target encoding: the per-category totals are a
    broadcast-size dim — the join must broadcast, with two-phase
    aggregation below it."""
    df = q("target_encode_oof_kfold", spark, sf_dir)
    assert_all_joins_broadcast(df)
    counts = operator_counts(df)
    assert count_prefix(counts, "HashAggregate") >= 2, counts


def test_periodogram_broadcasts_top_users(spark, sf_dir):
    """Periodogram: the top-5 user set broadcasts into the event scan
    (a shuffle join here would shuffle every event) and the period
    fan-out is an explode, not a join."""
    df = q("periodogram_beacon_peak", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_croston_topp_broadcasts(spark, sf_dir):
    """Croston: the top-part filter broadcasts into the
    lineitem⋈orders stream; the fold itself is a JVM aggregate()
    (no Python worker)."""
    df = q("croston_sba_intermittent", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_capm_market_join_broadcasts(spark, sf_dir):
    """CAPM: the day-grain market-return frame is bounded — it must
    broadcast back onto the per-type return frame, and the tick scan
    feeds ONE bar rollup (windows run on the bar frame)."""
    df = q("capm_beta_alpha", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts


def test_seasonal_decompose_dow_means_broadcast(spark, sf_dir):
    """Seasonal decomposition: the dow-seasonal table (≤7 rows/type)
    broadcasts back onto the detrended frame; trend/seasonal windows
    run post-rollup only."""
    df = q("seasonal_decompose_classic", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "Window") >= 2, counts


def test_vif_pca_single_moment_pass(spark, sf_dir):
    """VIF + PCA: ONE moment aggregate over the facts, then 1-row
    algebra — no join against the fact table, no Python eval, no
    second scan."""
    for name in ("vif_collinearity_triple", "pca_leading_component_power"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)
        assert count_prefix(counts, "SortMergeJoin") == 0, (name, counts)
        scans = count_prefix(counts, "Scan parquet")
        assert scans <= 3, (name, counts)


def test_naive_bayes_model_joins_broadcast(spark, sf_dir):
    """Naive Bayes: the likelihood/prior tables are model-sized —
    scoring must broadcast them against test tokens (model-as-a-
    table deployment), with zero Python evals."""
    df = q("naive_bayes_train_eval", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "CartesianProduct") == 0, counts


def test_ucb1_fold_single_rollup_no_python(spark, sf_dir):
    """UCB1 replay: one rollup to the daily reward matrix, the
    decision fold in a JVM aggregate() — no Python worker, no
    shuffle join."""
    df = q("ucb1_policy_replay", spark, sf_dir)
    counts = operator_counts(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts


def test_granger_single_scan_closed_form(spark, sf_dir):
    """Granger: ONE fact scan feeds the daily frame; both directions
    reuse it via union; the fit is closed-form (no joins against
    facts, no Python)."""
    df = q("granger_lag1_causality", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "Scan parquet") <= 2, counts


def test_ridge_boxcox_single_moment_pass(spark, sf_dir):
    """Ridge + Box-Cox: one moment aggregate over the facts, 1-row /
    5-row algebra after — no joins against the fact table."""
    for name in ("ridge_regression_closed_form", "boxcox_lambda_scan"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "SortMergeJoin") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)
        assert count_prefix(counts, "Scan parquet") <= 2, (name, counts)


def test_kendall_pairs_at_calendar_grain(spark, sf_dir):
    """Kendall τ-b: the O(n²) pair join runs on the daily frame and
    broadcasts one side — never a shuffle join over raw events."""
    df = q("kendall_tau_daily", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") >= 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts


def test_hmm_hurst_post_rollup_only(spark, sf_dir):
    """HMM burst filter + Hurst R/S: the fact scan ends at the
    rollup; folds/windows run on bounded frames, JVM-side."""
    for name in ("hmm_burst_forward_filter", "hurst_rescaled_range"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)
        assert count_prefix(counts, "SortMergeJoin") == 0, (name, counts)


def test_isotonic_interval_joins_broadcast(spark, sf_dir):
    """Isotonic minimax: the interval table is B²-sized (bin grain) —
    all joins must broadcast; nothing rescans facts."""
    df = q("isotonic_calibration_maxmin", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "Scan parquet") <= 2, counts


def test_forecast_family_broadcast_only(spark, sf_dir):
    """Yule-Walker + backtest: the fact scan ends at the daily
    rollup; train-stats join back is broadcast; no Python evals."""
    for name in ("yule_walker_ar2", "forecast_backtest_scorecard"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "SortMergeJoin") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)
        assert count_prefix(counts, "Scan parquet") <= 2, (name, counts)


def test_slo_timeline_single_scan(spark, sf_dir):
    """SLO burn timeline: ONE fact scan feeds the hourly rollup; the
    multiwindow pass runs on the bounded hours frame."""
    df = q("slo_multiwindow_burn_timeline", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_paired_trend_tests_integer_censuses(spark, sf_dir):
    """McNemar + Cochran-Armitage: 1-row stat frames broadcast back;
    never a shuffle join; no Python."""
    for name in ("mcnemar_paired_test", "cochran_armitage_trend"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "SortMergeJoin") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)


def test_fellegi_sunter_no_pair_join(spark, sf_dir):
    """F-S weights: parameter estimation must never enumerate record
    pairs — only hash aggregates (the u identity Σc(c−1)/R(R−1));
    every join is a 1-row broadcast."""
    df = q("fellegi_sunter_match_weights", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "CartesianProduct") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_survival_family_single_sessionize(spark, sf_dir):
    """KM + log-rank: ONE user-partitioned sessionize pass off the
    fact scan; the curve algebra runs on the bounded durations frame;
    no Python, no shuffle join."""
    for name in ("kaplan_meier_survival", "logrank_two_group_test",
                 "kaplan_meier_by_group"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        # 2 scans: the sessionize lineage + the end-of-corpus max
        # (ts-column-only, rowgroup-stat prunable)
        assert count_prefix(counts, "Scan parquet") <= 2, (name, counts)
        assert count_prefix(counts, "SortMergeJoin") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)


def test_time_decay_attribution_range_join(spark, sf_dir):
    """Time-decay attribution: the touch join is user-keyed (never a
    cross product); credits are integer DIV — no Python evals."""
    df = q("attribution_time_decay", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "CartesianProduct") == 0, counts
    assert (
        count_prefix(counts, "BroadcastHashJoin")
        + count_prefix(counts, "SortMergeJoin")
        + count_prefix(counts, "ShuffledHashJoin")
    ) >= 1, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_erlang_c_jvm_fold_no_python(spark, sf_dir):
    """Erlang-C: the B-recursion is a JVM aggregate() fold — no
    Python worker, no joins against facts, one scan."""
    df = q("erlang_c_staffing", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_geofence_broadcast_fences(spark, sf_dir):
    """Geofence containment: the fence dimension broadcasts; the fact
    side never shuffles for the join."""
    df = q("geofence_containment_census", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") >= 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_matrix_profile_calendar_grain(spark, sf_dir):
    """Matrix profile: the O(n²) pair join and the 7-way dot-product
    fan-out run at calendar grain (post-rollup) — the fact table is
    scanned once per distinct lineage, never pair-joined."""
    df = q("matrix_profile_daily", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "CartesianProduct") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts
    assert count_prefix(counts, "Scan parquet") <= 3, counts


def test_partition_advisor_single_scan(spark, sf_dir):
    """Layout advisor: ONE scan with map-side candidate explode —
    a per-candidate union would rescan orders 3x."""
    df = q("partition_layout_advisor", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "Generate") >= 1, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_robust_stats_family_shapes(spark, sf_dir):
    """Trimmed/HL/dispersion/EB: pair joins only at calendar grain,
    broadcast stat frames, no Python; the EB user frame derives at
    most twice (prior + display)."""
    limits = {
        "trimmed_mean_by_type": 2,
        "hodges_lehmann_location": 2,
        "poisson_dispersion_test": 1,
        "empirical_bayes_shrinkage": 2,
    }
    for name, max_scans in limits.items():
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "Scan parquet") <= max_scans, (name, counts)
        assert count_prefix(counts, "CartesianProduct") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)


def test_conformal_supply_family_shapes(spark, sf_dir):
    """Conformal + ABC-XYZ + revenue bridge: fact scans bounded,
    q-hat/months frames broadcast, no Python evals anywhere."""
    limits = {
        "conformal_interval_coverage": 2,
        "abc_xyz_classification": 2,
        "revenue_bridge_price_volume": 2,
    }
    for name, max_scans in limits.items():
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "Scan parquet") <= max_scans, (name, counts)
        assert count_prefix(counts, "CartesianProduct") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)


def test_recsys_cached_interactions(spark, sf_dir):
    """Recsys MRR: the interactions/train frames are persisted (one
    derivation of orders x lineitem), pair work is item-item, no
    Python evals."""
    df = q("recsys_mrr_at_10", spark, sf_dir)
    counts = operator_counts(df)
    assert (
        count_prefix(counts, "InMemoryTableScan")
        + count_prefix(counts, "TableCacheQueryStage")
    ) >= 2, counts
    assert count_prefix(counts, "CartesianProduct") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_cached_plans_get_aqe_replanning(spark):
    """Tripwire for the r10 sim-wall fix: persist()ed subplans are
    compiled WITHOUT adaptive execution unless
    canChangeCachedPlanOutputPartitioning is on — on a vanilla
    driver session that means every exchange under a cached frame
    runs at the raw 200 shuffle partitions (association_rules was
    2x slower for it). The conf must ride _RUNTIME_CONFS so
    catalog.load_table applies it to ANY session, including the
    driver's."""
    from eventstreams_spark.session import _RUNTIME_CONFS, apply_runtime_confs

    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    assert _RUNTIME_CONFS.get(key) == "true"
    apply_runtime_confs(spark)
    assert spark.conf.get(key) == "true"


def test_warehouse_ops_family_shapes(spark, sf_dir):
    """PIT join is user-keyed (no cross product); the concurrency
    sweep and watermark census are single-scan; no Python evals."""
    limits = {
        "scd2_point_in_time_join": 2,
        "max_concurrency_sweep": 2,
        "watermark_delay_tradeoff": 1,
    }
    for name, max_scans in limits.items():
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "Scan parquet") <= max_scans, (name, counts)
        assert count_prefix(counts, "CartesianProduct") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)


def test_profiling_ops_family_shapes(spark, sf_dir):
    """FD census / last-digit / Apdex / vocab overlap / gap sweep:
    censuses stay map-side-combinable aggregates; pair work only on
    the token-keyed vocabulary frame; no Python."""
    limits = {
        "functional_dependency_census": 3,
        "last_digit_uniformity": 2,
        "apdex_score_daily": 1,
        "session_gap_sensitivity": 1,
    }
    for name, max_scans in limits.items():
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert count_prefix(counts, "Scan parquet") <= max_scans, (name, counts)
        assert count_prefix(counts, "CartesianProduct") == 0, (name, counts)
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert count_prefix(counts, bad) == 0, (name, counts)
    # vocab overlap persists the tokenize+distinct pass: execution
    # must read the CACHE for its 4 consumers (the raw "Scan parquet"
    # occurrences in the plan text live inside InMemoryRelation's
    # stored plan and materialize once)
    df = q("vocabulary_overlap_matrix", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "InMemoryTableScan") >= 3, counts
    assert count_prefix(counts, "CartesianProduct") == 0, counts
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert count_prefix(counts, bad) == 0, counts


def test_frequent_triples_level_wise_bounded_joins(spark, sf_dir):
    """Apriori 3-itemsets: every candidate-generation join is an
    equi-join on l_orderkey; the level dims (f1 brands, f2 pairs,
    n_orders) attach broadcast; no cartesian anywhere. The
    checkpointed lines/lf/f2 frames (round-8 truncate_lineage pass,
    budget 62 -> 0 printed scans) show as Scan ExistingRDD leaves —
    the level subtrees are materialized once, never re-printed."""
    df = q("frequent_triples_apriori", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 3, counts
    assert_no_operator(df, "CartesianProduct")
    # only the pair-gen + triple-gen orderkey joins remain in the
    # returned plan; lf/f2 materialized behind the checkpoints
    assert count_prefix(counts, "SortMergeJoin") <= 5, counts
    assert count_prefix(counts, "Scan ExistingRDD") >= 2, counts


def test_conformal_monitor_prefix_join_at_calendar_grain(spark, sf_dir):
    """Online conformal timeline: ONE fact scan feeds the daily
    rollup; the prefix self-join runs on the rolled-up frame (days²
    per key), with rank/count windows on the pair frame."""
    df = q("conformal_monitor_timeline", spark, sf_dir)
    counts = operator_counts(df)
    # 1 executed scan; the persisted resid's child plan is printed
    # under both prefix-join consumers (display-only repeat)
    assert count_prefix(counts, "Scan parquet") <= 2, counts
    assert count_prefix(counts, "InMemoryTableScan") >= 2, counts
    assert count_prefix(counts, "Window") >= 2, counts
    assert_no_operator(df, "CartesianProduct")


def test_matrix_profile_mass_single_materialized_series(spark, sf_dir):
    """MASS gate: the dense hourly series is persisted (one
    InMemoryRelation feeding both the JVM window pass and the MASS
    applyInPandas); the certifier pair join is an equi-join on
    event_type over window arrays; exactly one ArrowEvalPython-free
    UDF surface (FlatMapGroupsInPandas for MASS)."""
    df = q("matrix_profile_mass_gate", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "FlatMapGroupsInPandas") == 1, counts
    assert count_prefix(counts, "InMemoryTableScan") >= 2, counts
    # the persisted series' child (2 scans of events) prints under
    # each of its 3 consumers; 1 materialization executes. String
    # count varies with cache-display state — the scan-budget gate
    # (budget 6) owns the exact number; here just bound it.
    assert count_prefix(counts, "Scan parquet") <= 6, counts
    assert_no_operator(df, "CartesianProduct")


def test_fisher_exact_census_then_bounded_terms(spark, sf_dir):
    """Fisher exact: ONE fact scan collapses to the contingency
    census (persisted — it feeds the lf range, the k-span and the
    terms frame); the log-factorial table and all nine lookup joins
    are broadcast; tail terms stay bounded by the smaller margin."""
    df = q("fisher_exact_weekend_value", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 9, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct")


def test_source_mixing_single_rollup_no_shuffle_joins(spark, sf_dir):
    """Hamilton apportionment: one rollup to |sources| rows; totals
    attach as 1-row broadcasts; the remainder ranking is one bounded
    window. No shuffle join anywhere."""
    df = q("source_mixing_largest_remainder", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "Window") >= 1, counts
    # 1 executed scan: per_src is persisted; its child plan prints
    # under each of its 4 consumers (display-only repeats)
    assert count_prefix(counts, "Scan parquet") <= 4, counts
    assert count_prefix(counts, "InMemoryTableScan") >= 3, counts


def test_dtw_pairs_arrays_carried_no_fact_rejoin(spark, sf_dir):
    """Banded DTW: one rollup to |channels|×28, arrays carried into
    the pair frame (broadcast pair join on the tiny side), the DP in
    one Arrow-batched pandas UDF — nothing joins back to the facts."""
    df = q("dtw_banded_channel_pairs", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_holt_winters_single_scan_jvm_fold(spark, sf_dir):
    """Holt-Winters: one fact scan → rollup → array-packed fold in
    whole-stage codegen (aggregate over the series; seeds derived
    from the SAME packed array, no second scan); no joins at all."""
    df = q("holt_winters_additive_fit", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_path_trigrams_one_window_pass_broadcast_dims(spark, sf_dir):
    """Path trigrams: BOTH leads come from one persisted window pass;
    the count frames join on broadcast |types|-sized dims; the facts
    are never rejoined."""
    df = q("path_trigrams_markov_lift", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 3, counts
    assert_no_operator(df, "CartesianProduct")


def test_gsp_user_cogrouped_joins_broadcast_pattern_dims(spark, sf_dir):
    """GSP triples: candidate frames join on user_id; the pattern
    dims (f1/f2/minsup) attach broadcast; the only shuffle joins are
    the user-keyed containment joins."""
    df = q("gsp_subsequence_triples", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastHashJoin") >= 4, counts
    assert_no_operator(df, "CartesianProduct")


def test_packing_census_single_scan_jvm_fold(spark, sf_dir):
    """Packing census: one documents scan → per-source array pack →
    integer greedy fold in whole-stage codegen; no joins, no second
    scan (totals come off the same aggregate)."""
    df = q("packing_efficiency_census", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan parquet") == 1, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert_no_operator(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_nw_alignment_arrays_carried_no_fact_rejoin(spark, sf_dir):
    """NW alignment: rollup + rank windows produce per-channel symbol
    arrays; the pair frame is a broadcast join; one Arrow-batched
    pandas UDF runs the DP — nothing rejoins the facts."""
    df = q("nw_alignment_channel_shapes", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_stomp_gate_shares_mass_gate_plan_shape(spark, sf_dir):
    """STOMP gate: same materialized-series + quadratic-certifier
    shape as the MASS gate — one FlatMapGroupsInPandas (the STOMP
    recurrence), persisted series feeding both consumers."""
    df = q("matrix_profile_stomp_gate", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "FlatMapGroupsInPandas") == 1, counts
    assert count_prefix(counts, "InMemoryTableScan") >= 2, counts
    assert_no_operator(df, "CartesianProduct")


def test_gotoh_alignment_arrays_carried_no_fact_rejoin(spark, sf_dir):
    """Gotoh affine alignment: same scale shape as NW — rollup + rank
    windows to per-channel symbol arrays, broadcast pair join, ONE
    Arrow-batched pandas UDF running the 3-matrix DP."""
    df = q("gotoh_affine_alignment_shapes", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_prefixspan_broadcast_prunes_no_cartesian(spark, sf_dir):
    """PrefixSpan census: frequent-prefix prunes are broadcast semi
    joins; projection joins are user_id-keyed shuffle joins (fact x
    fact, correct); the only cross joins are 1-row scalar broadcasts
    (minsup / n_users)."""
    df = q("prefixspan_projected_census", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    # every level is a truncate_lineage boundary (r7: replaced the old
    # persists, whose child plan re-printed per consumer — 42 recorded
    # scans for what executes as one); the visible plan reads
    # checkpointed RDDs and the level-4 projection only
    assert count_prefix(counts, "Scan ExistingRDD") >= 4, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts


def test_suffix_array_no_cartesian_bucketed_ranks(spark, sf_dir):
    """Suffix array: the construction runs ONCE per input and lands
    in the materialized SA cache (SCALE.md \u00a724); the visible plan
    reads the cache parquet — equi joins only, the lone cross join is
    the broadcast 1-row stats frame."""
    df = q("suffix_array_doubling_gate", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "BroadcastNestedLoopJoin") <= 1, counts
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_sa_cache" in plan, plan[:2000]


def test_dup_coverage_windows_partitioned_by_doc(spark, sf_dir):
    """Substring-dup coverage: the island merge runs per-doc windows
    (partitioned, never a global window); joins are equi on sa_idx /
    doc_id; no cartesian."""
    df = q("exact_substring_dup_coverage", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "Window") >= 2, counts
    assert count_prefix(counts, "Scan ExistingRDD") >= 1, counts


def test_smith_waterman_single_arrow_udf(spark, sf_dir):
    """SW local alignment: same scale shape as NW/Gotoh — broadcast
    pair join, exactly ONE ArrowEvalPython (the score referenced once;
    a second reference would plan a second UDF node)."""
    df = q("smith_waterman_local_shapes", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_zip_census_executor_side_extraction(spark, sf_dir):
    """Zip-bundle census: archives land via binaryFile (one row per
    archive = the parallel grain) and extraction is ONE MapInPandas
    node; the census itself is a plain hash aggregate — no cartesian,
    no extra Python stages."""
    df = q("webdataset_zip_shard_census", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "MapInPandas") == 1, counts
    assert count_prefix(counts, "HashAggregate") >= 2, counts


def test_gotoh_local_single_arrow_udf(spark, sf_dir):
    """Local affine alignment: same scale shape as NW/Gotoh/SW —
    broadcast pair join, exactly ONE ArrowEvalPython."""
    df = q("gotoh_local_alignment_shapes", spark, sf_dir)
    counts = operator_counts(df)
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts
    assert_no_operator(df, "CartesianProduct")


def test_fpgrowth_broadcast_dims_single_pandas_stage(spark, sf_dir):
    """PFP: part-brand dim broadcasts into the basket build; the
    group-dependent projection is plain shuffles; shard-local mining
    is exactly ONE FlatMapGroupsInPandas; no cartesian anywhere."""
    df = q("fpgrowth_parallel_itemsets", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastHashJoin") >= 1, counts
    assert count_prefix(counts, "FlatMapGroupsInPandas") == 1, counts


def test_bloom_semijoin_probe_never_shuffles_fact_for_bitmap(spark, sf_dir):
    """Bloom semi-join reduction: the bitmap and the truth flags both
    reach the probe side by BROADCAST — the probe's only shuffles are
    its own distinct/groupBy on key, never a fact-vs-fact join."""
    df = q("bloom_semijoin_reduction", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastHashJoin") >= 2, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts


def test_theilsen_pair_join_copartitioned_per_channel(spark, sf_dir):
    """Theil-Sen: the pairwise slope join is equi on event_type over
    the daily rollup (co-partitioned fact x fact is fine at rollup
    granularity); the median/residual/OLS recombination joins are
    broadcast; no cartesian."""
    df = q("theilsen_robust_trend", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastHashJoin") >= 2, counts


def test_zorder_census_single_scan_map_side_layouts(spark, sf_dir):
    """Z-order census: layout assignment is a map-side expression —
    the plan is union of three projections over the events scan +
    two hash aggregates; no joins at all."""
    df = q("zorder_layout_skipping_census", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastHashJoin") == 0, counts
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "HashAggregate") >= 2, counts


def test_skyline_bucketed_windows_no_dominance_join(spark, sf_dir):
    """Skyline: dominance never materializes a pairwise join — the
    plan is price-group aggregate + bucket-partitioned window + tiny
    broadcast recombinations; no cartesian, no SMJ."""
    df = q("skyline_pareto_parts", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "SortMergeJoin") == 0, counts
    assert count_prefix(counts, "BroadcastHashJoin") >= 2, counts
    assert count_prefix(counts, "Window") >= 2, counts


def test_geo_grid_join_equi_on_cells_no_cross(spark, sf_dir):
    """Spatial grid join: candidates come from an EQUI join on
    neighbor cell ids (9 exploded offsets on one side), never an
    all-pairs cross join; haversine refine is codegen'd scalar math."""
    df = q("geo_grid_neighbor_pairs", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") == 0, counts
    assert count_prefix(counts, "Generate") >= 2, counts


def test_allpairs_prefix_filter_all_equi_joins(spark, sf_dir):
    """AllPairs exact similarity join: candidates from prefix-token
    equi collisions, verify via equi joins on id/token — never a
    cartesian or broadcast nested loop."""
    df = q("allpairs_prefix_filter_join", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") == 0, counts


def test_point_in_polygon_broadcasts_geometry(spark, sf_dir):
    """PIP: the bbox prefilter and the edge table are tiny broadcast
    dims — the point side must never shuffle into a cartesian. The
    non-equi bbox join plans as BroadcastNestedLoopJoin (broadcast
    side = 6 rows), never CartesianProduct."""
    df = q("point_in_polygon_raycast", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct")
    assert count_prefix(counts, "BroadcastNestedLoopJoin") >= 1, counts


def test_itemset_capstones_checkpoint_the_census(spark, sf_dir):
    """closed/maximal + rules both re-consume the PFP census — the
    plan must read it as checkpointed blocks (Scan ExistingRDD), not
    re-derive the mining pipeline per consumer (the persist-display-
    repeat trap, r7 house rule)."""
    for name in (
        "frequent_itemsets_closed_maximal",
        "association_rules_confidence_lift",
    ):
        counts = operator_counts(q(name, spark, sf_dir))
        assert count_prefix(counts, "Scan ExistingRDD") >= 1, (name, counts)


def test_sw_traceback_single_arrow_udf(spark, sf_dir):
    """The traceback UDF must plan exactly ONE ArrowEvalPython node —
    referencing a pandas UDF twice in one select plans two (the r5
    DTW lesson); the struct-return + single alias pattern avoids it."""
    counts = operator_counts(
        q("smith_waterman_traceback_alignment", spark, sf_dir)
    )
    assert count_prefix(counts, "ArrowEvalPython") == 1, counts


def test_survival_new_queries_stay_jvm_side(spark, sf_dir):
    """Nelson-Aalen / stratified log-rank / Aalen-Johansen are pure
    DataFrame algebra: no Python eval nodes, no cartesians (the
    1-row spanmax broadcast is the only crossJoin)."""
    for name in (
        "nelson_aalen_cumulative_hazard",
        "logrank_stratified_test",
        "aalen_johansen_competing_risks",
    ):
        df = q(name, spark, sf_dir)
        assert_no_operator(
            df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
        )


def test_repeat_family_and_bwt_ride_checkpointed_sa(spark, sf_dir):
    """Both suffix-array derivatives must consume the MATERIALIZED SA
    cache (head20/bwt columns ride it — no documents re-join: zero
    documents scans in either plan)."""
    for name in ("repeat_family_census", "bwt_run_length_census"):
        df = q(name, spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "_sa_cache" in plan, (name, plan[:2000])
        assert "documents.parquet" not in plan, (name, plan[:2000])
        assert_no_operator(df, "CartesianProduct")


def test_haar_and_fagin_stay_bounded(spark, sf_dir):
    """Haar rides checkpointed level frames (halving per level); the
    TA census probes with a bounded 64-row broadcast — neither may
    plan a CartesianProduct or a Python eval node."""
    for name in ("haar_wavelet_energy_census", "fagin_ta_depth_census"):
        df = q(name, spark, sf_dir)
        counts = operator_counts(df)
        assert_no_operator(
            df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
        )
        assert count_prefix(counts, "Scan ExistingRDD") >= 1, (name, counts)


def test_fagin_no_single_partition_rank(spark, sf_dir):
    """TA census: the |users|-sized ra/rb ranks must ride
    exact_global_rank (bucket-partitioned windows); the ONLY
    SinglePartition allowed is the rf window over the bounded
    top-10 probe frame (downstream of a GlobalLimit)."""
    df = q("fagin_ta_depth_census", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SinglePartition") <= 1, plan[:2000]
    # the surviving window must sit under a top-10 limit (planned as
    # TakeOrderedAndProject), not the raw frame
    assert (
        "TakeOrderedAndProject(limit=10" in plan
        or "GlobalLimit 10" in plan
    ), plan[:2000]


def test_global_window_audit_degloballed_ranks(spark, sf_dir):
    """Round-8 Window.orderBy audit: queries whose data-proportional
    global windows were replaced with the bucketed constructions
    (exact_global_rank / exact_global_cumsum / distinct-bucket
    midranks) must not regress to a SinglePartition window over the
    data frame. Bounded-metadata SinglePartitions (percentile sketch
    1-row agg, grand-total 1-row frames) are allowed up to the
    recorded cap."""
    caps = {
        "sequence_gap_islands": 0,
        "woe_iv_decile_binning": 0,
        "kruskal_wallis_h": 1,   # prefix window over DISTINCT cents
        "abc_xyz_classification": 0,
    }
    for name, cap in caps.items():
        df = q(name, spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = sum(
            1
            for line in plan.splitlines()
            if "Window" in line and "SinglePartition" in line
        )
        assert n <= cap, (name, n, plan[:2000])


def test_rank_limit_pushes_take_ordered(spark, sf_dir):
    """Unpartitioned row_number + filter r <= K must plan as
    TakeOrderedAndProject (LimitPushDownThroughWindow) so the
    single-partition window only ever sees K rows — the boundedness
    contract the matryoshka/ndcg docstrings claim."""
    for name, min_toap in (
        ("matryoshka_prefix_recall", 2),
        ("ndcg_at_10_eval", 2),
        ("binary_hamming_recall", 2),
    ):
        df = q(name, spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("TakeOrderedAndProject") >= min_toap, (
            name, plan[:2000],
        )


def test_fm_index_bounded_probe_plan(spark, sf_dir):
    """FM-index backward search: the returned plan consumes the
    checkpointed SA/Occ blocks (Scan ExistingRDD) with the interval
    frame broadcast — no cartesian, no Python eval, and the locate
    range join must be the only nested-loop (broadcast tiny side)."""
    df = q("fm_index_backward_search", spark, sf_dir)
    assert_no_operator(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_sa_cache" in plan, plan[:2000]


def test_lcp_interval_tree_keyed_windows_only(spark, sf_dir):
    """LCP-interval tree: the island window partitions BY DEPTH
    (keyed), the depth dimension broadcasts, and the plan rides the
    checkpointed eligible frame — no single-partition Window over
    the expansion, no cartesian, no Python eval."""
    df = q("lcp_interval_tree_nodes", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert_no_operator(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")
    n = sum(
        1
        for line in plan.splitlines()
        if "Window" in line and "SinglePartition" in line
    )
    assert n == 0, plan[:2000]
    counts = operator_counts(df)
    assert count_prefix(counts, "Scan ExistingRDD") >= 1, counts


def test_team_draft_bounded_draft_plan(spark, sf_dir):
    """Team-draft interleaving: the returned plan runs on the 10-row
    draft frame (Scan ExistingRDD from createDataFrame) with the
    1-row summary broadcast — no cartesian beyond that broadcast, no
    Python eval, no parquet scan (candidates were bounded collects at
    build time)."""
    df = q("team_draft_interleaving_eval", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython")
    assert count_prefix(counts, "Scan parquet") == 0, counts
    assert count_prefix(counts, "FileScan parquet") == 0, counts


def test_wasserstein_distinct_bucket_windows(spark, sf_dir):
    """W1 drift: the prefix-sum/lead windows run over the DISTINCT-
    cents frame only (one rollup precedes them); no cartesian beyond
    the 1-row totals broadcast; no Python eval."""
    df = q("wasserstein_1d_drift", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct")
    assert count_prefix(counts, "Scan parquet") + count_prefix(
        counts, "FileScan parquet"
    ) <= 1, counts


def test_t_closeness_keyed_windows_only(spark, sf_dir):
    """t-closeness: cumulative windows partition BY CLASS (keyed);
    the 10-row band spine and the global band distribution broadcast;
    no single-partition Window anywhere."""
    df = q("t_closeness_census", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = sum(
        1
        for line in plan.splitlines()
        if "Window" in line and "SinglePartition" in line
    )
    assert n == 0, plan[:2000]
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython")


def test_cross_lcs_rides_checkpointed_sa(spark, sf_dir):
    """Cross-group LCS: consumes the checkpointed SA frame (Scan
    ExistingRDD), adjacent pairs via the sa_idx+1 equi self-join
    (no window over the SA), lang dims broadcast, top-10 via
    TakeOrderedAndProject."""
    df = q("cross_group_lcs_via_gsa", spark, sf_dir)
    counts = operator_counts(df)
    assert_no_operator(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_sa_cache" in plan, plan[:2000]
    assert count_prefix(counts, "TakeOrderedAndProject") >= 1, counts


def test_weighted_interval_scheduling_jvm_fold(spark, sf_dir):
    """Interval-scheduling DP: one keyed rollup + WindowGroupLimit
    top-60 cap + a JVM aggregate fold — no Python eval, no cartesian,
    keyed windows only."""
    df = q("weighted_interval_scheduling", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct")
    assert "WindowGroupLimit" in plan, plan[:1500]
    n = sum(
        1
        for line in plan.splitlines()
        if "Window" in line and "SinglePartition" in line
    )
    assert n == 0, plan[:2000]


def test_curriculum_no_single_partition_rank(spark, sf_dir):
    """Curriculum stages: the corpus-wide difficulty rank must ride
    exact_global_rank (bucket-partitioned), not a SinglePartition
    window."""
    df = q("curriculum_ordering_stages", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = sum(
        1
        for line in plan.splitlines()
        if "Window" in line and "SinglePartition" in line
    )
    assert n == 0, plan[:2000]
    assert_no_operator(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_pinball_keyed_windows_only(spark, sf_dir):
    """Pinball eval: trailing-quantile windows partition BY CHANNEL;
    no single-partition Window, no Python eval, one fact scan."""
    df = q("pinball_loss_quantile_eval", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = sum(
        1
        for line in plan.splitlines()
        if "Window" in line and "SinglePartition" in line
    )
    assert n == 0, plan[:2000]
    assert_no_operator(df, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct")
    counts = operator_counts(df)
    assert count_prefix(counts, "FileScan parquet") + count_prefix(
        counts, "Scan parquet"
    ) <= 1, counts


def test_fm_occ_lookup_is_filtered_grid_scan(spark):
    """VERDICT r8 #3, consolidated r10: the FM-index Occ probe is a
    rank-checkpoint LOOKUP — one filtered scan of the checkpointed
    dense grid (literal (char, block) predicate, <= |probes| rows
    collected, in-block <= count by binary search over the bounded
    sorted position array). Never a nested-loop / theta sweep, and
    never a re-scan of the O(n) per-position frame. Built on
    synthetic frames so the shape is pinned independently of the
    corpus."""
    from pyspark.sql import functions as F

    from eventstreams_spark.queries.llm import (
        _OCC_BLOCK,
        _fm_occ_lookup,
        _fm_occ_structures,
    )

    bwt = spark.range(1, 20001).select(
        (F.col("id")).alias("pos"),
        F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("bwt"),
    )
    grid = _fm_occ_structures(spark, bwt, 4)
    # a probe-shaped filter over the grid must plan as a plain scan of
    # the materialized checkpoint — no join, no exchange, no re-derive
    # of the per-position rank frame
    probe_plan = (
        grid.filter((F.col("bwt") == "c1") & (F.col("block") == 2))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Scan ExistingRDD" in probe_plan, probe_plan[:2000]
    for op in ("Join", "Exchange", "CartesianProduct"):
        assert op not in probe_plan, probe_plan[:2000]
    # and the lookup must be CORRECT: Occ(c1, p) = count of c1 at pos <= p
    got = _fm_occ_lookup(
        grid, [("p", "c1", 9999, "s"), ("p", "c1", 15000, "e")]
    )
    want_s = bwt.filter("bwt = 'c1' AND pos <= 9999").count()
    want_e = bwt.filter("bwt = 'c1' AND pos <= 15000").count()
    assert got == {("p", "s"): want_s, ("p", "e"): want_e}, got
    # in-block arrays are bounded by the block size B
    max_arr = grid.agg(F.max(F.size("parr"))).head()[0]
    assert max_arr <= _OCC_BLOCK, max_arr


def test_fm_occ_grid_covers_full_sequence(spark):
    """ADVICE r9 #1 regression: when the Occ input frame is filtered
    to the pattern alphabet and the sequence ends in a run of >= one
    whole block free of a pattern char, a probe landing in that
    trailing run must still see the char's TOTAL count — the dense
    grid is sized from n_total (the unfiltered sequence length), not
    from the filtered frame's max block. Before the fix the probe
    found neither a residual nor a (block-1) checkpoint and the
    caller silently treated the NULL as Occ = 0 (empty interval)."""
    from pyspark.sql import functions as F

    from eventstreams_spark.queries.llm import (
        _OCC_BLOCK,
        _fm_occ_lookup,
        _fm_occ_structures,
    )

    n_total = 3 * _OCC_BLOCK  # blocks 0, 1, 2
    # char 'a' occurs only in block 0 (positions 1..10); the rest of
    # the sequence is 'z' — after filtering to the pattern alphabet
    # {'a'} the frame's max block is 0, but probes reach block 2
    bwt_full = spark.range(1, n_total + 1).select(
        F.col("id").alias("pos"),
        F.when(F.col("id") <= 10, F.lit("a")).otherwise(F.lit("z")).alias(
            "bwt"
        ),
    )
    filtered = bwt_full.filter(F.col("bwt") == "a")
    grid = _fm_occ_structures(spark, filtered, 4, n_total=n_total)
    got = _fm_occ_lookup(
        grid,
        [
            ("p", "a", n_total - 5, "e"),  # trailing a-free run
            ("p", "a", 7, "s"),  # in-block residual still works
        ],
    )
    assert got == {("p", "e"): 10, ("p", "s"): 7}, got
    # and the dense grid spans every probe-reachable block
    assert grid.agg(F.max("block")).head()[0] == 2


def test_sa_cache_materializes_once_and_roundtrips(spark, sf_dir):
    """The shared SA frame must build once per input fingerprint and
    serve every later call from the parquet materialization: after a
    first call lands the cache, a second call must not re-run the
    construction (asserted by poisoning the builder), and the frame
    read back must equal the built frame exactly."""
    import eventstreams_spark.queries.llm as llm

    path = llm._sa_cache_path(sf_dir)
    first = llm._suffix_array_lcp_frame(spark, sf_dir)
    import os

    assert os.path.exists(os.path.join(path, "_SUCCESS")), path
    n1 = first.count()
    real_build = llm._build_suffix_array_lcp

    def poisoned(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("cache miss: construction re-ran")

    llm._build_suffix_array_lcp = poisoned
    try:
        second = llm._suffix_array_lcp_frame(spark, sf_dir)
        assert second.count() == n1
        assert sorted(second.columns) == sorted(
            ["sa_idx", "doc_id", "off", "head12", "head20",
             "lcp_next", "ok", "bwt"]
        )
    finally:
        llm._build_suffix_array_lcp = real_build


def test_corpus_prep_staged_pipeline_plan(spark, sf_dir):
    """The CLI corpus-prep chain compiles to ONE Catalyst plan with
    no Python in the row path: quality/pack/split are expressions,
    dedup is a hash-keyed (never single-partition) window, and the
    decontaminate semi/anti joins are hash joins — no cartesian."""
    df = q("corpus_prep_staged_pipeline", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert_no_operator(
        df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"
    )
    n = sum(
        1
        for line in plan.splitlines()
        if "Window" in line and "SinglePartition" in line
    )
    assert n == 0, plan[:2000]


def test_neardup_dedup_step_plan_no_python_no_doc_cross(spark):
    """The neardup_dedup pipeline step must stay JVM-side end to end
    (shingles/MinHash/verify are Column algebra, CC is the log-round
    propagation) with no doc×doc join: the only nested-loop is the
    16-row broadcast seed fan-out."""
    from pyspark.sql import functions as F

    from eventstreams_spark.operators.dedup import drop_near_duplicates

    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{chr(97 + i)}"), (F.col("id") % 5).cast("string"))
                for i in range(10)
            ],
        ).alias("text"),
    )
    out = drop_near_duplicates(df, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan, plan[:2000]
