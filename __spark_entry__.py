"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (citation-graph density pipeline, G1 in
SURVEY.md §2.9, mapped onto the TPC-H-ish tables) at sf0.001.

`queries()` / `oracle_sql()` — one entry per implemented operator from
SURVEY.md §2; DuckDB-verified at sf0.01. Column names and dtypes are
aligned between both sides (aggregates cast to BIGINT, years to INT) so
the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from citegraph_spark.plans import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: density pipeline (G1) on the sf0.001 tables."""
    return entry_queries.QUERIES["graph_density"](spark, "/root/testdata/sf0.001")


# Entries that already received driver correctness rows in rounds 1-2
# (CORRECTNESS_r01.json / CORRECTNESS_r02.json). Each round's sweep
# stopped after exactly the first 50 registry entries, so the registry
# is served rotated: entries still awaiting a driver row come FIRST,
# previously-certified ones last. Under either driver policy
# (entry-count cap or time budget) this maximizes cumulative coverage
# across rounds; a full sweep is unaffected (same entries either way).
_R1_CHECKED = [
    "graph_density", "graph_out_degree", "graph_canonical_pairs",
    "graph_snapshot_edge_count", "graph_adjacency", "graph_hopplot_d2",
    "running_total_orders", "attr_join_customer_orders",
    "double_vertex_join", "anti_join_idle_customers", "graph_hyperball",
    "graph_effective_diameter_approx", "graph_degree_distribution",
    "graph_cocitation_triangles", "graph_pagerank", "graph_ppr",
    "graph_kcore", "graph_lpa", "graph_scc", "graph_hits",
    "graph_link_prediction", "graph_sssp", "events_moving_avg_time",
    "stats_moments", "winsorized_prices", "hof_array_stats",
    "events_json_map_agg", "udtf_chunk_split", "null_safe_join_status",
    "graph_closeness_sampled", "bpe_train_merges", "pipeline_end_to_end",
    "file_lineage_counts", "events_windowed_agg", "events_sessionize",
    "events_json_props", "events_top_users_per_type",
    "streaming_windowed", "streaming_stateful_counts",
    "asof_join_events_orders", "range_join_events_orders",
    "streaming_sessionize", "streaming_dedup", "events_click_attribution",
    "streaming_join", "streaming_enrich", "events_hierarchical_rollup",
    "events_scd2_history", "events_funnel", "events_cohort_retention",
]

# Round-2 sweep rows (CORRECTNESS_r02.json): 44 green + 4 rows-only.
# multimodal_features / multimodal_frames got `err` rows (driver
# canonicalizer chokes on array<float> output) — they are deliberately
# NOT listed here so the round-3 sweep re-checks them now that their
# outputs are scalarized.
# approx_distinct_parts / approx_percentile_prices /
# sketch_mergeable_distinct were rows-only in r2 but NOW carry full
# oracles (in-query error-bound certificates), so they are deliberately
# OMITTED from this list: the sweep re-checks them near the head and
# upgrades their rows-only records to hash-verified ones.
_R2_CHECKED = [
    "unpivot_part_measures", "text_fingerprint", "text_token_count",
    "heavy_hitters_exact", "multimodal_meta", "q6_forecast_revenue",
    "split_train_test", "sample_stratified", "sample_weighted",
    "distinct_flag_status", "filter_project_pushdown",
    "scalar_functions_showcase",
    "text_quality", "dedup_exact", "text_rolling_hash",
    "events_transitions", "orders_above_customer_avg",
    "q1_pricing_summary", "rollup_returns", "pivot_status_by_flag",
    "semi_join_active_parts", "union_nation_keys",
    "cube_flag_status",
    "intersect_customer_nations",
    "q4_order_priority", "q14_promo_revenue", "q19_disjunctive_filter",
    "outer_join_nation_presence", "text_stats", "text_lang_id",
    "bpe_top_merges", "q17_small_quantity_revenue",
    "grouping_sets_revenue", "tfidf_top_terms", "q15_top_supplier",
    "q22_global_sales_opportunity", "loader_normalize_ids",
    "q3_unshipped_revenue", "window_rank_lag",
    "except_all_supplier_flags", "q10_returned_items",
    "events_gap_fill", "multi_join_region_revenue",
    "q18_large_orders",
]

# Round-3 sweep rows (CORRECTNESS_r03.json): 44 green + 5 rows-only + the
# q12 hash fail (re-listed in _RECHECK_FIRST below, not here).
_R3_CHECKED = [
    "multimodal_features", "multimodal_frames", "csv_sink_roundtrip",
    "approx_distinct_parts", "approx_percentile_prices",
    "sketch_mergeable_distinct", "heavy_hitters_mg", "q7_volume_shipping",
    "sql_api_region_revenue", "salted_join_event_nations",
    "events_sliding_window", "graph_clustering_coefficient",
    "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "q16_supplier_part_counts", "ngram_top_bigrams",
    "gopher_quality_filter", "q2_min_cost_supplier", "q20_part_promotion",
    "percentile_prices", "q5_local_supplier_volume", "fixture_density",
    "window_ntile_cume", "equidepth_histogram_prices",
    "similarity_topk_cosine", "q9_product_profit", "q11_important_stock",
    "q21_waiting_suppliers", "dq_orders_checks", "dedup_simhash",
    "q8_market_share", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "sample_domain_mix", "q13_customer_distribution",
    "doc_repetition_signals", "heavy_hitters_cms", "contamination_check",
    "dedup_clusters", "fixture_effective_diameter", "fixture_hopplot",
    "dedup_prefix_filter", "kmeans_embeddings", "dedup_edit_distance",
    "shuffle_shard_stats",
    # rows-only by design (r3 no_oracle rows; similarity_recall_gate is
    # the compensating hash oracle) — tail, don't burn sweep slots
    "similarity_pq", "similarity_ivf_trained",
]

# (Round 4 produced no driver sweep — rounds 4 and 5 were consecutive
# builder rounds; CORRECTNESS_r04.json does not exist. The entries a
# round-4 window would have covered are distributed below: the fixed
# ones in _RECHECK_FIRST, the rest in the never-checked backlog.)

# Round-5 sweep rows (CORRECTNESS_r05.json): 49 green + the q12 hash
# fail (re-listed in _RECHECK_FIRST, not here). These were entries 0-49
# of the round-5 rotation; re-rotating them to the tail is the round-6
# first commit the round-5 verdict mandated.
_R5_CHECKED = [
    "events_sessionize", "graph_scc", "customer_rfm_segments",
    "kmeans_quality_gate", "similarity_recall_gate",
    "graph_temporal_reachability", "cdc_apply_changes", "basket_lift_top",
    "events_ewma", "text_accent_fold", "streaming_windowed_append",
    "hyperball_accuracy_gate", "scc_partition_gate",
    "events_cusum_changepoint", "dq_key_skew", "regression_price_on_qty",
    "ab_mann_whitney", "events_seasonal_decompose",
    "bootstrap_ci_daily_mean", "xml_sink_roundtrip", "chi2_flag_status",
    "graph_assortativity", "pipeline_truncation_report",
    "naive_bayes_lang", "text_zipf_fit", "text_heaps_law",
    "arrow_token_count", "markov_next_event_eval", "orders_open_backlog",
    "graph_powerlaw_fit", "revenue_concentration",
    "events_forecast_backtest", "events_dau_wau", "events_inter_arrival",
    "events_user_entropy", "events_autocorr", "ab_welch_ttest",
    "corr_lineitem_measures", "mad_outlier_prices", "events_kaplan_meier",
    "text_js_divergence", "logreg_train_gate", "pca_power_gate",
    "coreset_kcenter", "graph_mst_gate", "graph_mis_gate",
    "graph_matching_gate", "graph_cc_star_gate", "graph_ktruss_gate",
]

# Round-6 sweep rows (CORRECTNESS_r06.json): 50 green / 50 — the first
# zero-fail driver round. Freshest certifications; tail of the rotation.
_R6_CHECKED = [
    "q12_ship_priority_class", "streaming_windowed",
    "streaming_stateful_counts", "streaming_sessionize", "streaming_dedup",
    "streaming_join", "streaming_enrich", "graph_hyperball",
    "graph_effective_diameter_approx", "bpe_train_merges",
    "similarity_ann_lsh", "similarity_ivf", "events_variant_props",
    "dedup_incremental", "doc_novelty_trigrams", "pack_sequences",
    "events_session_window", "doc_lm_surprisal", "streaming_state_inspect",
    "streaming_session_window", "tokenize_to_ids", "json_sink_roundtrip",
    "orc_sink_roundtrip", "dq_psi_drift", "graph_random_walks",
    "parquet_zorder_roundtrip", "dedup_boilerplate_lines",
    "text_html_strip", "parquet_upsert_merge", "text_pii_redact",
    "fixture_motif_triangles", "dq_benford_first_digit", "skyline_parts",
    "parquet_schema_evolution", "events_twap", "motif_fanout_top",
    "kmv_set_ops", "fixture_harmonic_centrality", "multimodal_audio",
    "feature_hashing", "events_anomaly_iqr", "fixture_betweenness",
    "streaming_incremental_rollup", "bucketed_join_roundtrip",
    "graph_betweenness_sampled", "bloom_semi_join_revenue",
    "parquet_partitioned_roundtrip", "label_knn_agreement",
    "events_decayed_counts", "graph_diameter_double_sweep",
]

# Round-7 sweep rows (CORRECTNESS_r07.json): 50 green / 50, zero errors —
# the second consecutive zero-fail driver round and the one that closed
# the board at 229/229 all-hash. Freshest certifications; tail of the
# rotation. Listed in the r7 artifact's order.
_R7_CHECKED = [
    "q1_pricing_summary", "q4_order_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q14_promo_revenue",
    "q15_top_supplier", "q20_part_promotion",
    "q22_global_sales_opportunity", "q21_waiting_suppliers",
    "scalar_functions_showcase", "customer_rfm_segments",
    "range_join_events_orders", "udtf_chunk_split", "graph_scc",
    "events_kaplan_meier", "graph_cc_star_gate", "graph_mst_gate",
    "graph_mis_gate", "graph_matching_gate", "graph_ktruss_gate",
    "kmeans_embeddings", "similarity_pq", "similarity_ivf_trained",
    "q12_ship_priority_class", "similarity_ivf", "similarity_recall_gate",
    "graph_hyperball", "graph_effective_diameter_approx",
    "hyperball_accuracy_gate", "graph_diameter_double_sweep",
    "graph_pagerank", "graph_ppr", "graph_hits", "graph_sssp",
    "graph_closeness_sampled", "dedup_clusters", "graph_density",
    "graph_out_degree", "graph_canonical_pairs",
    "graph_snapshot_edge_count", "graph_adjacency", "graph_hopplot_d2",
    "running_total_orders", "attr_join_customer_orders",
    "double_vertex_join", "anti_join_idle_customers",
    "graph_degree_distribution", "graph_cocitation_triangles",
    "graph_kcore",
]

# Re-check these FIRST. Round 8 window (stale-modified before stale-old,
# per the round-7 verdict):
#   1. `graph_lpa` — the round-7 verdict's single blemish: its
#      static-adjacency pin (2e015a2) landed AFTER its only driver check
#      (round 1) and it sat at rotation position 50, one slot outside
#      the r7 sweep window. It leads round 8 so CORRECTNESS_r08
#      re-certifies it and the stale-modified count returns to 0.
#   2. The four IVF/ANN entries whose code paths change in round 8 on
#      the ADVICE.md items (n_cells pinned at the two registry call
#      sites so oracle equivalence no longer depends on corpus size;
#      the ANN certificate's recall base switched to a deterministic
#      query sample with an empty-corpus guard; ivf_assignments takes
#      an optional pre-materialized count). All were r7-certified, but
#      the freshness rule ("no entry's last driver check predates the
#      code it runs") re-queues anything whose code path moves.
#   3. The remaining round-1/round-2 certification windows (oldest
#      driver rows on the board) follow automatically via the
#      staleness-ordered tail: 18 r1-latest entries, then the 36
#      r2-latest ones — a 50-entry sweep reaches all r1 and 27 of r2;
#      the last ~9 r2 entries lead round 9.
_RECHECK_FIRST = [
    # round-8 late fix: range_join_binned's exact re-filter now compares
    # native (microsecond) values instead of second-truncated longs —
    # found by the first sf0.1 oracle sweep (a purchase 59.87 ms BEFORE
    # its click passed the second-granular predicate). Both consumers'
    # code paths changed after their r7 rows, so both re-queue first.
    "events_click_attribution", "range_join_events_orders",
    # round-8 late fix 2 (same sf0.1 sweep): events_ewma now quantizes
    # with an explicit floor(x*1e6+0.5)/1e6 stated identically in both
    # engines — engine round() implementations disagree within an ulp
    # of the .5 boundary (6 of 100k rows at sf0.1).
    "events_ewma",
    "graph_lpa",
    # round-8 ADVICE.md edits (n_cells pin / certificate sampling /
    # count reuse) — code paths changed after their r7 rows
    "similarity_ivf", "similarity_recall_gate",
    "similarity_pq", "similarity_ivf_trained",
    # round-8 contraction-family audit fixes (VERDICT item 4): the MSF
    # static edge table is now pinned a-partitioned with budget-gated
    # broadcast/shuffle_hash comp joins; edge_support grew a pinned
    # mode k_truss uses past broadcast size; and cc_star's convergence
    # check carries counts across rounds (one fewer job per round; a
    # min-map persist was ALSO tried, measured slower at every scale,
    # and reverted — the negative result is pinned in the operator's
    # comment and EXPLAINS.md). All three gates' code paths changed
    # after their r7 rows, so all three re-queue (this pushes the
    # r7-overlap to 7, two over the verdict's ~5 target; freshness
    # outranks overlap, and the audit mandate said "any found static
    # re-shuffle fixed"). Late round-8 additions to the same three:
    # the cc_star gate's union-find replay lost an O(m^2)
    # min-per-member fanout (one min per component now — 8.8 s of the
    # 14.2 s gate, hours at the 500k-edge guard on a connected graph)
    # and the MST gate now persists its 4x-read induced edge table
    # like the sibling gates. Output values unchanged in both.
    "graph_mst_gate", "graph_ktruss_gate", "graph_cc_star_gate",
    # round-8 cut_lineage refactor: every iterative operator's round
    # state now truncates lineage via lineage.cut_lineage —
    # localCheckpoint by default (plan-identical to the call it
    # replaces, pinned by tests/test_lineage.py) with DFS-backed
    # reliable checkpoint behind spark.citegraph.reliableCheckpoint for
    # multi-hour cluster jobs where executor loss must not kill the
    # query. Default-path semantics are unchanged, but the code path of
    # every entry below DID change, so all 27 (31 affected minus the 4
    # already queued above) re-queue under the freshness rule —
    # freshness outranks window overlap and outranks drainage speed;
    # the ~15 remaining window slots still drain the oldest
    # certifications. List derived by transitive call-site taint over
    # the plans/functions packages (call or import references only;
    # docstring/CTE-name false positives excluded).
    "dedup_clusters", "graph_pagerank", "graph_hits", "graph_sssp",
    "graph_ppr", "graph_kcore", "graph_scc", "graph_hyperball",
    "graph_effective_diameter_approx", "hyperball_accuracy_gate",
    "graph_diameter_double_sweep", "graph_closeness_sampled",
    "graph_cocitation_triangles", "graph_clustering_coefficient",
    "graph_link_prediction", "graph_betweenness_sampled",
    "fixture_harmonic_centrality", "fixture_betweenness",
    "scc_partition_gate", "graph_mis_gate", "graph_matching_gate",
    "bpe_train_merges", "coreset_kcenter", "revenue_concentration",
    "pack_sequences", "equidepth_histogram_prices", "skyline_parts",
]

# Ordering of the not-yet-checked entries. PRIORITY FIRST: the rounds-1/2
# backlog (dedup/similarity family, remaining TPC-H shapes, G9/G10
# fixture anchors) has waited two sweep windows and fills the round-3
# 50-entry window; entries added in round 3 queue AFTER it (they are all
# locally hash-verified and will rotate into round 4's window). Within
# each block, cheap-first by measured sf0.01 oracle-check cost so a
# time-budgeted sweep certifies the most entries.
_R3_CHEAP_FIRST = [
    # the last reference operator (S8/S9 CSV sink) without a driver row;
    # cheap (25-row roundtrip), so it leads
    "csv_sink_roundtrip",
    # rows-only in r2, now fully oracled — re-certify with hash rows
    "approx_distinct_parts", "approx_percentile_prices",
    "sketch_mergeable_distinct", "heavy_hitters_mg",
    # rounds-1/2 backlog, cheap-first
    "q7_volume_shipping", "sql_api_region_revenue",
    "salted_join_event_nations", "events_sliding_window",
    "graph_clustering_coefficient",
    "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "q12_ship_priority_class", "q16_supplier_part_counts",
    "ngram_top_bigrams", "gopher_quality_filter", "q2_min_cost_supplier",
    "q20_part_promotion", "percentile_prices", "q5_local_supplier_volume",
    "fixture_density", "window_ntile_cume",
    "equidepth_histogram_prices", "similarity_topk_cosine",
    "q9_product_profit", "q11_important_stock", "q21_waiting_suppliers",
    "dq_orders_checks", "dedup_simhash", "q8_market_share",
    "dedup_minhash_lsh", "dedup_simhash_pairs", "sample_domain_mix",
    "similarity_ivf", "q13_customer_distribution", "similarity_pq",
    "doc_repetition_signals", "similarity_ann_lsh", "heavy_hitters_cms",
    "contamination_check", "dedup_clusters", "fixture_effective_diameter",
    "fixture_hopplot", "dedup_prefix_filter", "similarity_ivf_trained",
    "kmeans_embeddings", "dedup_edit_distance",
    "shuffle_shard_stats", "events_variant_props", "dedup_incremental",
    "doc_novelty_trigrams", "pack_sequences", "events_session_window",
    "doc_lm_surprisal", "streaming_state_inspect",
    "streaming_session_window",
    # round-3 additions (all locally hash-verified), cheap-first —
    # measured at sf0.01 with per-process warmup included
    "tokenize_to_ids", "json_sink_roundtrip", "orc_sink_roundtrip",
    "dq_psi_drift", "graph_random_walks", "parquet_zorder_roundtrip",
    "dedup_boilerplate_lines", "text_html_strip", "parquet_upsert_merge",
    "text_pii_redact", "fixture_motif_triangles",
    "dq_benford_first_digit", "skyline_parts", "parquet_schema_evolution",
    "events_twap", "motif_fanout_top", "kmv_set_ops",
    "fixture_harmonic_centrality", "multimodal_audio", "feature_hashing",
    "events_anomaly_iqr", "fixture_betweenness",
    "streaming_incremental_rollup", "bucketed_join_roundtrip",
    "graph_betweenness_sampled", "bloom_semi_join_revenue",
    "parquet_partitioned_roundtrip", "label_knn_agreement",
    "events_decayed_counts", "customer_rfm_segments",
    "kmeans_quality_gate", "similarity_recall_gate",
    "graph_temporal_reachability", "cdc_apply_changes", "basket_lift_top",
    "events_ewma", "text_accent_fold", "streaming_windowed_append",
    "hyperball_accuracy_gate", "scc_partition_gate",
    # round-3 late additions (statistical/ML audit family), cheap-first
    # by measured sf0.01 oracle-check cost
    "events_cusum_changepoint", "dq_key_skew", "regression_price_on_qty",
    "ab_mann_whitney", "events_seasonal_decompose",
    "bootstrap_ci_daily_mean", "xml_sink_roundtrip", "chi2_flag_status",
    "graph_assortativity", "pipeline_truncation_report",
    "naive_bayes_lang", "text_zipf_fit", "text_heaps_law",
    "arrow_token_count", "markov_next_event_eval", "orders_open_backlog",
    "graph_powerlaw_fit", "revenue_concentration",
    "events_forecast_backtest", "events_dau_wau", "events_inter_arrival",
    "events_user_entropy",
    "events_autocorr", "ab_welch_ttest", "corr_lineitem_measures",
    "mad_outlier_prices", "events_kaplan_meier", "text_js_divergence",
    # iterative gates — heaviest of the late additions, last
    "logreg_train_gate", "pca_power_gate", "coreset_kcenter",
    "graph_mst_gate", "graph_mis_gate", "graph_matching_gate",
    "graph_cc_star_gate", "graph_ktruss_gate",
    "graph_diameter_double_sweep",
]


def _rotated(d: dict) -> dict:
    seen = (
        set(_R1_CHECKED)
        | set(_R2_CHECKED)
        | set(_R3_CHECKED)
        | set(_R5_CHECKED)
        | set(_R6_CHECKED)
        | set(_R7_CHECKED)
        | set(_RECHECK_FIRST)
    )
    rank = {n: i for i, n in enumerate(_R3_CHEAP_FIRST)}
    unchecked = [n for n in d if n not in seen]
    unchecked.sort(key=lambda n: rank.get(n, len(rank)))
    # Oldest driver rows first after the recheck block, BY LATEST
    # certification: a name listed in several historical blocks (the
    # early lists were never pruned when entries got re-certified) sorts
    # with its most recent round, so a fresh r6 row cannot steal a
    # window slot from a genuinely stale r1 one. The sweep window takes
    # the head of this order; staleness drains round by round.
    latest: dict[str, int] = {}
    for rnd, block in enumerate(
        [_R1_CHECKED, _R2_CHECKED, _R3_CHECKED, _R5_CHECKED, _R6_CHECKED,
         _R7_CHECKED]
    ):
        for n in block:
            latest[n] = rnd
    tail = [n for n in d if n not in _RECHECK_FIRST and n not in unchecked]
    tail.sort(key=lambda n: latest.get(n, -1))
    order = [n for n in _RECHECK_FIRST if n in d] + unchecked + tail
    # names can appear in several blocks (e.g. a recheck entry also in a
    # historical *_CHECKED list); dict construction keeps the FIRST
    # occurrence's position, which is the one we want.
    return {n: d[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(entry_queries.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(entry_queries.ORACLES))
