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
# changed since the round-8 sweep (4 entries); then never-certified (0);
# then oldest-certification-first (cheap-first within a round).
_ROTATION = [
    'events_click_attribution',
    'events_ewma',
    'graph_scc',
    'range_join_events_orders',
    'events_cohort_retention',
    'events_funnel',
    'events_hierarchical_rollup',
    'events_scd2_history',
    'bpe_top_merges',
    'cube_flag_status',
    'dedup_exact',
    'distinct_flag_status',
    'events_gap_fill',
    'events_transitions',
    'except_all_supplier_flags',
    'filter_project_pushdown',
    'grouping_sets_revenue',
    'heavy_hitters_exact',
    'intersect_customer_nations',
    'loader_normalize_ids',
    'multi_join_region_revenue',
    'multimodal_meta',
    'orders_above_customer_avg',
    'outer_join_nation_presence',
    'pivot_status_by_flag',
    'q17_small_quantity_revenue',
    'q18_large_orders',
    'q19_disjunctive_filter',
    'q3_unshipped_revenue',
    'rollup_returns',
    'sample_stratified',
    'sample_weighted',
    'semi_join_active_parts',
    'split_train_test',
    'text_fingerprint',
    'text_lang_id',
    'text_quality',
    'text_rolling_hash',
    'text_stats',
    'text_token_count',
    'tfidf_top_terms',
    'union_nation_keys',
    'unpivot_part_measures',
    'window_rank_lag',
    'approx_distinct_parts',
    'approx_percentile_prices',
    'contamination_check',
    'csv_sink_roundtrip',
    'dedup_edit_distance',
    'dedup_embedding_cosine',
    'dedup_minhash_lsh',
    'dedup_ngram_jaccard',
    'dedup_prefix_filter',
    'dedup_simhash',
    'dedup_simhash_pairs',
    'doc_repetition_signals',
    'dq_orders_checks',
    'events_sliding_window',
    'fixture_density',
    'fixture_effective_diameter',
    'fixture_hopplot',
    'gopher_quality_filter',
    'heavy_hitters_cms',
    'heavy_hitters_mg',
    'multimodal_features',
    'multimodal_frames',
    'ngram_top_bigrams',
    'percentile_prices',
    'q11_important_stock',
    'q13_customer_distribution',
    'q16_supplier_part_counts',
    'q2_min_cost_supplier',
    'q7_volume_shipping',
    'q8_market_share',
    'q9_product_profit',
    'salted_join_event_nations',
    'sample_domain_mix',
    'shuffle_shard_stats',
    'similarity_topk_cosine',
    'sketch_mergeable_distinct',
    'sql_api_region_revenue',
    'window_ntile_cume',
    'ab_mann_whitney',
    'ab_welch_ttest',
    'arrow_token_count',
    'basket_lift_top',
    'bootstrap_ci_daily_mean',
    'cdc_apply_changes',
    'chi2_flag_status',
    'corr_lineitem_measures',
    'dq_key_skew',
    'events_autocorr',
    'events_cusum_changepoint',
    'events_dau_wau',
    'events_forecast_backtest',
    'events_inter_arrival',
    'events_seasonal_decompose',
    'events_sessionize',
    'events_user_entropy',
    'graph_assortativity',
    'graph_powerlaw_fit',
    'graph_temporal_reachability',
    'kmeans_quality_gate',
    'logreg_train_gate',
    'mad_outlier_prices',
    'markov_next_event_eval',
    'naive_bayes_lang',
    'orders_open_backlog',
    'pca_power_gate',
    'pipeline_truncation_report',
    'regression_price_on_qty',
    'streaming_windowed_append',
    'text_accent_fold',
    'text_heaps_law',
    'text_js_divergence',
    'text_zipf_fit',
    'xml_sink_roundtrip',
    'bloom_semi_join_revenue',
    'bucketed_join_roundtrip',
    'dedup_boilerplate_lines',
    'dedup_incremental',
    'doc_lm_surprisal',
    'doc_novelty_trigrams',
    'dq_benford_first_digit',
    'dq_psi_drift',
    'events_anomaly_iqr',
    'events_decayed_counts',
    'events_session_window',
    'events_twap',
    'events_variant_props',
    'feature_hashing',
    'fixture_motif_triangles',
    'graph_random_walks',
    'json_sink_roundtrip',
    'kmv_set_ops',
    'label_knn_agreement',
    'motif_fanout_top',
    'multimodal_audio',
    'orc_sink_roundtrip',
    'parquet_partitioned_roundtrip',
    'parquet_schema_evolution',
    'parquet_upsert_merge',
    'parquet_zorder_roundtrip',
    'similarity_ann_lsh',
    'streaming_dedup',
    'streaming_enrich',
    'streaming_incremental_rollup',
    'streaming_join',
    'streaming_session_window',
    'streaming_sessionize',
    'streaming_state_inspect',
    'streaming_stateful_counts',
    'streaming_windowed',
    'text_html_strip',
    'text_pii_redact',
    'tokenize_to_ids',
    'anti_join_idle_customers',
    'attr_join_customer_orders',
    'customer_rfm_segments',
    'double_vertex_join',
    'events_kaplan_meier',
    'graph_adjacency',
    'graph_canonical_pairs',
    'graph_degree_distribution',
    'graph_density',
    'graph_hopplot_d2',
    'graph_out_degree',
    'graph_snapshot_edge_count',
    'kmeans_embeddings',
    'q10_returned_items',
    'q12_ship_priority_class',
    'q14_promo_revenue',
    'q15_top_supplier',
    'q1_pricing_summary',
    'q20_part_promotion',
    'q21_waiting_suppliers',
    'q22_global_sales_opportunity',
    'q4_order_priority',
    'q5_local_supplier_volume',
    'q6_forecast_revenue',
    'running_total_orders',
    'scalar_functions_showcase',
    'udtf_chunk_split',
    'asof_join_events_orders',
    'bpe_train_merges',
    'coreset_kcenter',
    'dedup_clusters',
    'equidepth_histogram_prices',
    'events_json_map_agg',
    'events_json_props',
    'events_moving_avg_time',
    'events_top_users_per_type',
    'events_windowed_agg',
    'file_lineage_counts',
    'fixture_betweenness',
    'fixture_harmonic_centrality',
    'graph_betweenness_sampled',
    'graph_cc_star_gate',
    'graph_closeness_sampled',
    'graph_clustering_coefficient',
    'graph_cocitation_triangles',
    'graph_diameter_double_sweep',
    'graph_effective_diameter_approx',
    'graph_hits',
    'graph_hyperball',
    'graph_kcore',
    'graph_ktruss_gate',
    'graph_link_prediction',
    'graph_lpa',
    'graph_matching_gate',
    'graph_mis_gate',
    'graph_mst_gate',
    'graph_pagerank',
    'graph_ppr',
    'graph_sssp',
    'hof_array_stats',
    'hyperball_accuracy_gate',
    'null_safe_join_status',
    'pack_sequences',
    'pipeline_end_to_end',
    'revenue_concentration',
    'scc_partition_gate',
    'similarity_ivf',
    'similarity_ivf_trained',
    'similarity_pq',
    'similarity_recall_gate',
    'skyline_parts',
    'stats_moments',
    'winsorized_prices',
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
