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
# changed since the round-11 sweep (2 entries); then never-certified (0);
# then oldest-certification-first (cheap-first within a round).
_ROTATION = [
    'loader_normalize_ids',
    'text_heaps_law',
    'parquet_zorder_roundtrip',
    'streaming_enrich',
    'fixture_motif_triangles',
    'bucketed_join_roundtrip',
    'similarity_ann_lsh',
    'bloom_semi_join_revenue',
    'streaming_windowed',
    'streaming_session_window',
    'streaming_sessionize',
    'streaming_state_inspect',
    'streaming_dedup',
    'streaming_stateful_counts',
    'streaming_join',
    'q6_forecast_revenue',
    'running_total_orders',
    'anti_join_idle_customers',
    'scalar_functions_showcase',
    'q14_promo_revenue',
    'q1_pricing_summary',
    'attr_join_customer_orders',
    'q4_order_priority',
    'graph_out_degree',
    'q15_top_supplier',
    'q22_global_sales_opportunity',
    'customer_rfm_segments',
    'q12_ship_priority_class',
    'graph_density',
    'q10_returned_items',
    'double_vertex_join',
    'events_kaplan_meier',
    'graph_degree_distribution',
    'graph_snapshot_edge_count',
    'udtf_chunk_split',
    'q20_part_promotion',
    'q5_local_supplier_volume',
    'graph_adjacency',
    'q21_waiting_suppliers',
    'graph_canonical_pairs',
    'graph_hopplot_d2',
    'kmeans_embeddings',
    'hof_array_stats',
    'events_json_map_agg',
    'file_lineage_counts',
    'events_json_props',
    'events_top_users_per_type',
    'null_safe_join_status',
    'pipeline_end_to_end',
    'events_windowed_agg',
    'events_moving_avg_time',
    'stats_moments',
    'winsorized_prices',
    'pack_sequences',
    'asof_join_events_orders',
    'skyline_parts',
    'equidepth_histogram_prices',
    'fixture_harmonic_centrality',
    'revenue_concentration',
    'fixture_betweenness',
    'similarity_ivf',
    'graph_betweenness_sampled',
    'bpe_train_merges',
    'graph_closeness_sampled',
    'similarity_pq',
    'graph_cocitation_triangles',
    'graph_matching_gate',
    'graph_sssp',
    'graph_ppr',
    'graph_pagerank',
    'graph_hits',
    'graph_cc_star_gate',
    'graph_link_prediction',
    'coreset_kcenter',
    'graph_mis_gate',
    'graph_ktruss_gate',
    'dedup_clusters',
    'graph_diameter_double_sweep',
    'similarity_ivf_trained',
    'graph_lpa',
    'graph_mst_gate',
    'similarity_recall_gate',
    'hyperball_accuracy_gate',
    'text_fingerprint',
    'text_token_count',
    'unpivot_part_measures',
    'heavy_hitters_exact',
    'multimodal_meta',
    'rollup_returns',
    'dedup_exact',
    'union_nation_keys',
    'orders_above_customer_avg',
    'text_stats',
    'cube_flag_status',
    'grouping_sets_revenue',
    'sample_weighted',
    'text_quality',
    'except_all_supplier_flags',
    'q19_disjunctive_filter',
    'bpe_top_merges',
    'events_hierarchical_rollup',
    'events_transitions',
    'q17_small_quantity_revenue',
    'distinct_flag_status',
    'events_click_attribution',
    'sample_stratified',
    'events_cohort_retention',
    'split_train_test',
    'tfidf_top_terms',
    'text_rolling_hash',
    'intersect_customer_nations',
    'events_gap_fill',
    'q3_unshipped_revenue',
    'events_ewma',
    'window_rank_lag',
    'filter_project_pushdown',
    'pivot_status_by_flag',
    'range_join_events_orders',
    'events_funnel',
    'q18_large_orders',
    'semi_join_active_parts',
    'outer_join_nation_presence',
    'multi_join_region_revenue',
    'text_lang_id',
    'dedup_prefix_filter',
    'dedup_edit_distance',
    'doc_novelty_trigrams',
    'dedup_incremental',
    'graph_hyperball',
    'graph_effective_diameter_approx',
    'pipeline_truncation_report',
    'arrow_token_count',
    'sketch_mergeable_distinct',
    'text_accent_fold',
    'graph_powerlaw_fit',
    'corr_lineitem_measures',
    'text_zipf_fit',
    'events_seasonal_decompose',
    'shuffle_shard_stats',
    'regression_price_on_qty',
    'q13_customer_distribution',
    'salted_join_event_nations',
    'gopher_quality_filter',
    'ngram_top_bigrams',
    'dq_orders_checks',
    'csv_sink_roundtrip',
    'sample_domain_mix',
    'events_sliding_window',
    'sql_api_region_revenue',
    'q16_supplier_part_counts',
    'contamination_check',
    'dedup_embedding_cosine',
    'approx_distinct_parts',
    'q9_product_profit',
    'q11_important_stock',
    'q7_volume_shipping',
    'percentile_prices',
    'similarity_topk_cosine',
    'doc_repetition_signals',
    'heavy_hitters_mg',
    'q2_min_cost_supplier',
    'window_ntile_cume',
    'events_scd2_history',
    'q8_market_share',
    'approx_percentile_prices',
    'multimodal_frames',
    'multimodal_features',
    'fixture_density',
    'heavy_hitters_cms',
    'dedup_minhash_lsh',
    'dedup_simhash_pairs',
    'graph_kcore',
    'dedup_simhash',
    'graph_scc',
    'fixture_effective_diameter',
    'fixture_hopplot',
    'dedup_ngram_jaccard',
    'graph_clustering_coefficient',
    'scc_partition_gate',
    'text_pii_redact',
    'text_html_strip',
    'dq_benford_first_digit',
    'events_variant_props',
    'events_anomaly_iqr',
    'events_decayed_counts',
    'cdc_apply_changes',
    'events_inter_arrival',
    'events_twap',
    'motif_fanout_top',
    'events_cusum_changepoint',
    'dq_key_skew',
    'events_autocorr',
    'feature_hashing',
    'events_sessionize',
    'multimodal_audio',
    'events_user_entropy',
    'dq_psi_drift',
    'events_forecast_backtest',
    'events_session_window',
    'bootstrap_ci_daily_mean',
    'doc_lm_surprisal',
    'graph_random_walks',
    'xml_sink_roundtrip',
    'mad_outlier_prices',
    'chi2_flag_status',
    'kmv_set_ops',
    'orders_open_backlog',
    'ab_mann_whitney',
    'tokenize_to_ids',
    'markov_next_event_eval',
    'ab_welch_ttest',
    'basket_lift_top',
    'graph_temporal_reachability',
    'json_sink_roundtrip',
    'parquet_schema_evolution',
    'orc_sink_roundtrip',
    'label_knn_agreement',
    'parquet_partitioned_roundtrip',
    'dedup_boilerplate_lines',
    'text_js_divergence',
    'parquet_upsert_merge',
    'streaming_incremental_rollup',
    'events_dau_wau',
    'graph_assortativity',
    'naive_bayes_lang',
    'logreg_train_gate',
    'streaming_windowed_append',
    'kmeans_quality_gate',
    'pca_power_gate',
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
