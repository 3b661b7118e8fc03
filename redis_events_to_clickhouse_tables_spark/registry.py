"""Query registry: single source of truth for the driver contract.

Each operator from SURVEY.md §2 (and the Layer-B additions) registers
itself here with its Spark builder and, when SQL-expressible, the
exactly-equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes
this registry as ``queries()`` / ``oracle_sql()``.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches bit-for-bit):

- Money/measure sums go through ``decimal`` casts (exact, associative)
  and only the *final* aggregate is cast to double. Summing raw
  doubles is order-dependent under parallelism and would flap.
- Averages are ``cast(sum_decimal as double) / count`` — a single
  IEEE division both engines perform identically.
- Every LIMIT/top-k has a total ordering (explicit tiebreak keys).
- Column names are aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


# Queries the external correctness gate has already verified in rounds
# 1-7 (union of its 50-query samples, which take the FIRST 50 of this
# dict in order). Listing them lets load_all put the never-yet-sampled
# queries first, so each round's sample covers new ground instead of
# re-verifying the same prefix. Purely an ordering hint — every query
# stays registered and locally oracle-checked regardless.
_EXTERNALLY_VERIFIED = frozenset(
    {
        "agg_bitwise_line_masks",
        "agg_cube_status_priority",
        "agg_distinct_counts",
        "agg_exact_p90_rank",
        "agg_having_hot_brands",
        "agg_median_exact",
        "agg_mode_priority",
        "agg_rollup_flag_status",
        "agg_stats_explicit",
        "agg_weighted_median",
        "approx_distinct_users",
        "approx_percentile_prices",
        "asof_nearest_click_tolerance",
        "classifier_hashed_linear",
        "conditional_customer_tiers",
        "contamination_ngram_overlap",
        "corpus_composition_stats",
        "corpus_dedup_summary",
        "corpus_mixture_weights",
        "curation_keep_mask",
        "curation_token_budget",
        "customer_pareto_curve",
        "customer_rfm_segments",
        "dedup_cluster_components",
        "dedup_cluster_representatives",
        "dedup_containment_verify",
        "dedup_exact_documents",
        "dedup_exact_substring",
        "dedup_incremental_snapshot",
        "dedup_jaccard_stop_shingles",
        "dedup_jaccard_verify_candidates",
        "dedup_levenshtein_verify",
        "dedup_lsh_parameter_sweep",
        "dedup_minhash_bbit_estimate",
        "dedup_minhash_estimate_vs_exact",
        "dedup_minhash_lsh_candidates",
        "dedup_minhash_signatures",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_simhash_neardup",
        "distinct_projection",
        "dq_benford_first_digit",
        "dq_events_rules",
        "dq_k_anonymity",
        "dq_null_profile_all_tables",
        "dq_referential_integrity",
        "dq_rule_violations",
        "embedding_drift_halves",
        "embedding_label_centroids",
        "embedding_outlier_filter",
        "embedding_pca_top_component",
        "er_part_clusters",
        "er_part_golden_record",
        "er_part_match_pairs",
        "eval_mrr_recall_bm25",
        "events_activity_streaks",
        "events_attribution_linear",
        "events_burst_rate_violations",
        "events_cohort_ltv_matrix",
        "events_cusum_drift",
        "events_dau_wau_stickiness",
        "events_flagship_daily",
        "events_funnel_conversion",
        "events_funnel_time_windowed",
        "events_hourly_windows",
        "events_kaplan_meier",
        "events_markov_entropy_rate",
        "events_markov_stationary",
        "events_markov_transitions",
        "events_pivot_type_counts",
        "events_retention_halflife",
        "events_session_window",
        "events_sessionize",
        "events_sliding_windows",
        "events_user_type_entropy",
        "events_view_purchase_attribution",
        "features_point_in_time",
        "graph_bfs_hops_neardup",
        "graph_kcore_neardup",
        "graph_linkpred_common_neighbors",
        "graph_pagerank_neardup",
        "graph_source_modularity",
        "graph_triangle_count",
        "grouped_user_gap_stats",
        "grouping_sets_status_priority",
        "ingest_normalize_events",
        "interval_overlap_incidents",
        "join_anti_inactive_customers",
        "join_bloom_prefilter",
        "join_broadcast_brand_volume",
        "join_cross_region_nation",
        "join_full_outer_nation_presence",
        "join_left_outer_customer_spend",
        "join_semi_urgent_customers",
        "json_extract_props",
        "layout_zorder_orders",
        "multimodal_audio_features",
        "multimodal_binary_stats",
        "multimodal_fake_decode",
        "multimodal_frame_sample",
        "multimodal_magic_sniff",
        "multimodal_resize",
        "orders_open_backlog_daily",
        "orders_price_volume_mix",
        "orders_repeat_purchase_latency",
        "orders_ship_latency_percentiles",
        "pack_sequences_contiguous",
        "pipeline_token_budget_waterfill",
        "profile_orders_columns",
        "q10_returned_items",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q4_late_shipment_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "quality_bigram_branching",
        "quality_gopher_rules",
        "revenue_concentration_gini",
        "rolling_distinct_users_7d",
        "rollup_daily_gapfill",
        "sample_class_balanced_downsample",
        "sample_systematic_every_k",
        "scalar_bitwise_functions",
        "scalar_conditional_functions",
        "scalar_date_functions",
        "scalar_map_struct_functions",
        "scalar_math_functions",
        "scalar_regex_functions",
        "scalar_string_functions",
        "scalar_try_functions",
        "scd2_as_of_tier_counts",
        "scd2_user_tier_history",
        "set_except_all_heavy_lineitems",
        "set_except_churned_custkeys",
        "set_intersect_all_orderkeys",
        "set_intersect_loyal_custkeys",
        "set_union_active_custkeys",
        "shard_manifest",
        "sim_bruteforce_topk",
        "sim_embedding_neardup",
        "sim_ivf_bucketed_topk",
        "sim_ivf_kmeans_topk",
        "sim_ivf_nprobe_sweep",
        "sim_ivf_recall",
        "sim_kmeans_label_purity",
        "sim_mmr_diversified_topk",
        "sim_pq_adc_topk",
        "sim_pq_recall",
        "sim_srp_lsh_topk",
        "sim_srp_recall",
        "sim_truncated_dims_recall",
        "sketch_countmin_user_counts",
        "sketch_histogram_percentiles",
        "sketch_hll_mergeable_rollup",
        "skew_key_diagnostics",
        "skyline_parts_price_size",
        "snapshot_diff_orders",
        "split_leakage_safe",
        "stats_ab_test_conversion",
        "stats_anova_f_priority",
        "stats_brown_forsythe",
        "stats_chi2_nation_segment",
        "stats_cohens_d_matrix",
        "stats_corr_matrix",
        "stats_cramers_v",
        "stats_gini_revenue_by_nation",
        "stats_hhi_supplier_concentration",
        "stats_kendall_tau_daily",
        "stats_kruskal_wallis",
        "stats_ks_two_sample",
        "stats_mann_whitney_u",
        "stats_mutual_information_lang_source",
        "stats_odds_ratio_urgent_by_segment",
        "stats_overdispersion_index",
        "stats_regression_price_qty",
        "stats_spearman_rho",
        "stats_theil_between_nations",
        "stats_welch_t_test",
        "stats_winsorized_price",
        "stringagg_custkeys_by_status",
        "text_bigram_lm_bits",
        "text_bigram_stats",
        "text_bm25_score",
        "text_bpe_top_merges",
        "text_char_entropy",
        "text_heaps_law",
        "text_js_divergence_en_rest",
        "text_js_divergence_lang_matrix",
        "text_keywords_topk",
        "text_ngram_novelty",
        "text_pii_scan",
        "text_repetition_filter",
        "text_token_burstiness",
        "text_vocab_coverage",
        "text_winnowing_fingerprints",
        "text_zipf_slope",
        "timeseries_autocorrelation",
        "timeseries_changepoint_cusum",
        "timeseries_cross_correlation",
        "timeseries_hurst_rs",
        "timeseries_m4_downsample",
        "timeseries_periodogram_daily",
        "timeseries_seasonal_decompose_monthly",
        "timeseries_seasonal_profile",
        "timeseries_twap_locf",
        "topk_expensive_items",
        "unpivot_lineitem_measures",
        "url_canonicalize",
        "user_churn_features",
        "user_event_type_diversity",
        "user_ltv_deciles",
        "window_first_nth_last",
        "window_lag_order_gap",
        "window_moving_avg_spend",
        "window_rank_top_orders",
        "window_ranking_family",
        "window_running_customer_spend",
        "window_time_range_frame",
    }
)


# Head of the ordering (rotation per VERDICT r5 item 7 / r6 item 3 —
# sampled names move to the back so each round's 50-query sample
# covers new ground): the round-8 additions first, then the four
# queries whose ORACLES changed in round 8 (the codec stubs gained
# oracles; the TF-IDF pair re-quantized to 1e4) — those want external
# re-verification even though earlier rounds sampled them.
_SAMPLE_PRIORITY = (
    # round-8 third..eighth wave (newest first: never sampled)
    "stats_jonckheere_terpstra",
    "stats_cochran_q_event_types",
    "embedding_hubness_koccurrence",
    "ml_stump_learning_curve",
    "customer_order_gap_regularity",
    "sketch_linear_counting_users",
    "timeseries_theta_forecast",
    "stats_mood_median_test",
    "supply_eoq_model",
    "timeseries_rolling_quantile_band",
    "text_kneser_ney_bigram",
    "ml_gini_feature_gain",
    "ml_uplift_aa_screen",
    "stats_beta_binomial_posterior",
    "timeseries_dtw_nation_pairs",
    "stats_permutation_test_mean_diff",
    "supply_abc_xyz_matrix",
    "eval_auc_delong_se",
    "graph_rich_club",
    "timeseries_piecewise_trend",
    "text_rouge1_candidates",
    "finance_rsi_wilder",
    "finance_var_es_daily",
    "finance_sharpe_sortino_brand",
    "timeseries_holt_linear",
    "eval_brier_decomposition",
    "eval_expected_calibration_error",
    "stats_cramer_von_mises",
    "stats_wasserstein_acctbal_nation",
    "supply_bullwhip_ratio",
    "graph_local_clustering",
    # round-8 second wave
    "events_session_cooccurrence_lift",
    "embedding_centroid_separation",
    "ml_gains_lift_deciles",
    "ml_pr_threshold_sweep",
    "stats_ab_srm_check",
    "supplier_leadtime_cv",
    "part_reorder_point",
    "orders_basket_size_hist",
    "events_velocity_flags",
    "graph_reciprocity_density",
    "text_chi2_keywords",
    "scd2_late_data_blast_radius",
    "orders_split_order_screen",
    "timeseries_holdout_backtest",
    "stats_g_test_nation_segment",
    # round-8 first wave
    "geo_grid_density",
    "geo_radius_pairs",
    "geo_nearest_supplier",
    "dq_t_closeness",
    "stats_hodges_lehmann_shift",
    "ml_calibration_bins",
    "events_sequence_match",
    "text_unigram_logloss",
    "dq_functional_dependencies",
    "orders_repeat_cohort_curve",
    "stats_logrank_test",
    "multimodal_fake_decode",
    "multimodal_resize",
    "text_tf_idf_scores",
    "text_keywords_topk",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registrations run.

    Order: the explicit priority head (``_SAMPLE_PRIORITY``), then
    queries the external gate has NOT yet sampled (in registration
    order), then the already-verified ones — see
    ``_EXTERNALLY_VERIFIED``.
    """
    from .operators import (  # noqa: F401
        advanced,
        analytics2,
        dedup,
        dq2,
        drift,
        enrichment,
        entity,
        events,
        events2,
        finance,
        geo,
        graphplus,
        grouped,
        ml,
        mlops,
        multimodal,
        pipeline,
        pipeline2,
        quality_checks,
        relational,
        scd,
        similarity,
        skew,
        spectral,
        stats,
        stats2,
        subqueries,
        supply,
        temporal,
        text,
        text2,
        textstats,
        timeseries,
        timeseries2,
        tpch_extra,
        warehouse,
    )

    head = {n: REGISTRY[n] for n in _SAMPLE_PRIORITY if n in REGISTRY}
    fresh = {
        n: s
        for n, s in REGISTRY.items()
        if n not in _EXTERNALLY_VERIFIED and n not in head
    }
    seen = {
        n: s
        for n, s in REGISTRY.items()
        if n in _EXTERNALLY_VERIFIED and n not in head
    }
    return {**head, **fresh, **seen}
