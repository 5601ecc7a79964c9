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


# --- BEGIN GENERATED ROTATION (python tools/staleness.py sync) ---
# Derived from CORRECTNESS_r*.json + git-tree fingerprints; do not
# hand-edit. Head block = entries whose transitive code closure
# changed since the round-9 sweep (5 entries); then never-certified (0);
# then oldest-certification-first (cheap-first within a round).
_ROTATION = [
    'text_heaps_law',
    'graph_clustering_coefficient',
    'graph_kcore',
    'scc_partition_gate',
    'graph_scc',
    'sketch_mergeable_distinct',
    'shuffle_shard_stats',
    'salted_join_event_nations',
    'ngram_top_bigrams',
    'q13_customer_distribution',
    'sample_domain_mix',
    'gopher_quality_filter',
    'dq_orders_checks',
    'contamination_check',
    'events_sliding_window',
    'q16_supplier_part_counts',
    'csv_sink_roundtrip',
    'sql_api_region_revenue',
    'q7_volume_shipping',
    'multimodal_features',
    'dedup_ngram_jaccard',
    'q9_product_profit',
    'approx_distinct_parts',
    'dedup_embedding_cosine',
    'percentile_prices',
    'q8_market_share',
    'q2_min_cost_supplier',
    'similarity_topk_cosine',
    'heavy_hitters_mg',
    'q11_important_stock',
    'window_ntile_cume',
    'approx_percentile_prices',
    'doc_repetition_signals',
    'multimodal_frames',
    'fixture_density',
    'heavy_hitters_cms',
    'dedup_simhash',
    'dedup_minhash_lsh',
    'dedup_simhash_pairs',
    'fixture_effective_diameter',
    'fixture_hopplot',
    'pipeline_truncation_report',
    'text_zipf_fit',
    'arrow_token_count',
    'text_accent_fold',
    'corr_lineitem_measures',
    'graph_powerlaw_fit',
    'events_seasonal_decompose',
    'events_forecast_backtest',
    'events_cusum_changepoint',
    'cdc_apply_changes',
    'events_sessionize',
    'regression_price_on_qty',
    'events_inter_arrival',
    'bootstrap_ci_daily_mean',
    'events_user_entropy',
    'events_autocorr',
    'dq_key_skew',
    'ab_welch_ttest',
    'markov_next_event_eval',
    'xml_sink_roundtrip',
    'mad_outlier_prices',
    'orders_open_backlog',
    'chi2_flag_status',
    'ab_mann_whitney',
    'graph_temporal_reachability',
    'basket_lift_top',
    'events_dau_wau',
    'text_js_divergence',
    'graph_assortativity',
    'naive_bayes_lang',
    'logreg_train_gate',
    'streaming_windowed_append',
    'kmeans_quality_gate',
    'pca_power_gate',
    'events_variant_props',
    'dq_benford_first_digit',
    'events_anomaly_iqr',
    'text_html_strip',
    'text_pii_redact',
    'events_decayed_counts',
    'events_twap',
    'motif_fanout_top',
    'dq_psi_drift',
    'doc_lm_surprisal',
    'multimodal_audio',
    'graph_random_walks',
    'kmv_set_ops',
    'events_session_window',
    'feature_hashing',
    'json_sink_roundtrip',
    'dedup_boilerplate_lines',
    'label_knn_agreement',
    'parquet_schema_evolution',
    'orc_sink_roundtrip',
    'tokenize_to_ids',
    'parquet_partitioned_roundtrip',
    'parquet_zorder_roundtrip',
    'parquet_upsert_merge',
    'streaming_enrich',
    'bucketed_join_roundtrip',
    'streaming_incremental_rollup',
    'similarity_ann_lsh',
    'streaming_session_window',
    'bloom_semi_join_revenue',
    'streaming_windowed',
    'fixture_motif_triangles',
    'streaming_dedup',
    'streaming_stateful_counts',
    'streaming_sessionize',
    'streaming_state_inspect',
    'streaming_join',
    'q6_forecast_revenue',
    'running_total_orders',
    'scalar_functions_showcase',
    'q14_promo_revenue',
    'anti_join_idle_customers',
    'graph_out_degree',
    'q4_order_priority',
    'q15_top_supplier',
    'attr_join_customer_orders',
    'q1_pricing_summary',
    'q12_ship_priority_class',
    'q22_global_sales_opportunity',
    'customer_rfm_segments',
    'graph_density',
    'q10_returned_items',
    'graph_snapshot_edge_count',
    'events_kaplan_meier',
    'q20_part_promotion',
    'graph_degree_distribution',
    'q5_local_supplier_volume',
    'udtf_chunk_split',
    'graph_adjacency',
    'q21_waiting_suppliers',
    'graph_canonical_pairs',
    'double_vertex_join',
    'graph_hopplot_d2',
    'kmeans_embeddings',
    'events_json_map_agg',
    'events_json_props',
    'file_lineage_counts',
    'events_top_users_per_type',
    'null_safe_join_status',
    'events_moving_avg_time',
    'events_windowed_agg',
    'pipeline_end_to_end',
    'pack_sequences',
    'stats_moments',
    'winsorized_prices',
    'asof_join_events_orders',
    'skyline_parts',
    'equidepth_histogram_prices',
    'revenue_concentration',
    'similarity_ivf',
    'bpe_train_merges',
    'fixture_betweenness',
    'fixture_harmonic_centrality',
    'graph_closeness_sampled',
    'hof_array_stats',
    'graph_betweenness_sampled',
    'graph_link_prediction',
    'graph_ppr',
    'graph_pagerank',
    'similarity_pq',
    'graph_hits',
    'graph_cocitation_triangles',
    'graph_sssp',
    'graph_matching_gate',
    'coreset_kcenter',
    'graph_cc_star_gate',
    'graph_mis_gate',
    'dedup_clusters',
    'graph_diameter_double_sweep',
    'similarity_ivf_trained',
    'graph_ktruss_gate',
    'graph_lpa',
    'graph_mst_gate',
    'similarity_recall_gate',
    'hyperball_accuracy_gate',
    'multimodal_meta',
    'text_fingerprint',
    'unpivot_part_measures',
    'text_token_count',
    'heavy_hitters_exact',
    'sample_stratified',
    'distinct_flag_status',
    'split_train_test',
    'text_rolling_hash',
    'sample_weighted',
    'semi_join_active_parts',
    'text_lang_id',
    'text_quality',
    'filter_project_pushdown',
    'intersect_customer_nations',
    'outer_join_nation_presence',
    'pivot_status_by_flag',
    'text_stats',
    'union_nation_keys',
    'dedup_exact',
    'orders_above_customer_avg',
    'q19_disjunctive_filter',
    'rollup_returns',
    'events_transitions',
    'cube_flag_status',
    'events_click_attribution',
    'grouping_sets_revenue',
    'q17_small_quantity_revenue',
    'events_cohort_retention',
    'except_all_supplier_flags',
    'events_hierarchical_rollup',
    'tfidf_top_terms',
    'events_ewma',
    'bpe_top_merges',
    'loader_normalize_ids',
    'q3_unshipped_revenue',
    'window_rank_lag',
    'events_gap_fill',
    'range_join_events_orders',
    'q18_large_orders',
    'events_funnel',
    'multi_join_region_revenue',
    'events_scd2_history',
    'doc_novelty_trigrams',
    'dedup_incremental',
    'dedup_prefix_filter',
    'graph_hyperball',
    'dedup_edit_distance',
    'graph_effective_diameter_approx',
]
# --- END GENERATED ROTATION ---


def _rotated(d: dict) -> dict:
    """Serve the registry in certification-freshness order.

    The driver's per-round sweep checks the FIRST ~50 entries (by count
    or time budget), so ordering decides which driver certifications
    stay fresh. _ROTATION is GENERATED by `python tools/staleness.py
    sync` (and verified in-sync by tests/test_staleness.py): entries
    whose transitive code closure changed since the latest driver sweep
    come first (the freshness rule — no entry's last driver check may
    predate the code it runs), then never-certified entries, then
    everything else oldest-certification-first so staleness drains round
    by round. A full sweep is unaffected (same entries either way).

    Names present in the registry but missing from _ROTATION (an entry
    added without re-syncing — the test suite fails on that, but the
    driver may still run) are served FIRST: an unknown entry is by
    definition never-certified.
    """
    known = set(_ROTATION)
    fresh = sorted(n for n in d if n not in known)
    order = fresh + [n for n in _ROTATION if n in d]
    return {n: d[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(dict(entry_queries.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _rotated(dict(entry_queries.ORACLES))
