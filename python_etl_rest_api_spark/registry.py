"""Aggregated query registry: importing this module registers every
catalog entry (core reference surface, ETL pipeline, extensions).

QUERIES/ORACLES are re-emitted in VERIFICATION-DEBT-FIRST order. The
driver walks the dict in insertion order under a ~50-entry budget, so a
fixed cheapest-first pin (round 2) permanently exiled the expensive tail
from verification. Round-3 spent its whole window on never-verified
entries and cleared that debt (49 green, 1 err); the round-4 order
rotates currency back:

  1      multimodal_feature_extract - the one r3 err (driver
         canonicalizer could not hash its array<float> column; output
         reshaped to scalar f0..f7 this round) - must re-judge first;
  2-5    last green in r1 (two rounds stale, the oldest signal);
  6-53   last green in r2, r2-measured cheapest-first preserved so a
         time-based budget stretches across all of them;
  54+    new round-4 entries (never driver-verified - verified here if
         the budget stretches past the stale refresh, else next round);
  tail   the 49 entries CORRECTNESS_r03 just confirmed green (freshest
         signal, safe to defer).

Entries not in the pinned list (future additions) keep registration
order at the end until classified.
"""

from . import (  # noqa: F401
    catalog, catalog_agg, catalog_etl, catalog_ext, catalog_llm,
    catalog_pipe, catalog_quality, catalog_scale, catalog_tpch,
    catalog_warehouse, catalog_win,
)
from .catalog import ORACLES as _ORACLES
from .catalog import QUERIES as _QUERIES

_DEBT_FIRST = [
    # -- r3 err (canonicalizer vs array<float>; reshaped this round) --
    "multimodal_feature_extract",
    # -- last green in r1 (oldest live signal) --
    "etl_critical_quarantine", "dedup_ngram_jaccard",
    "etl_critical_scaled", "etl_clean_scaled",
    # -- last green in r2, r2-measured cheapest-first --
    "c1_rename_project", "d4_negative_amounts", "d4b_threshold_filter",
    "e1_normalize_strings", "f6_gauss_missing", "text_fingerprint",
    "text_token_count", "d1_validity_split_counts", "d3_dedup_pairs",
    "dedup_exact", "e5_date_extract", "f4_f5_amount_guards",
    "h2_count_global", "h5_null_ratio", "j1_head_tail",
    "sample_hash_bucket", "text_quality_score", "unnest_embedding_pos",
    "unpivot_measures", "w3_lag_gap_days", "agg_count_distinct",
    "b2_first_seen_wins", "b3_last_writer_wins", "h4_null_counts",
    "h9_rollup_totals", "hist_price_bins", "i1_join_inner",
    "j2_union", "join_anti_no_orders", "join_semi_exists",
    "scalar_share_of_total", "skew_plain_agg", "stats_percentiles",
    "text_levenshtein_pairs", "w1_running_total", "w2_topk_per_group",
    "etl_tier_counts", "f1_lenient_numeric_cast", "f2_multiformat_dates",
    "h1_daily_totals", "h6_sum_column", "i3_set_difference",
    "join_outer_coverage", "pivot_status_priority", "set_except_lapsed",
    "skew_salted_agg", "w6_rank_pack", "agg_argmax_best_order",
    # -- new in r4 (never driver-verified; appended here as built) --
    "sample_stratified_docs", "events_rolling_1h",
    "join_bloom_prefilter", "text_unigram_rarity",
    "rollup_incremental_merge", "layout_zorder_stats",
    "table_checksum", "events_linear_trend",
    "decontam_ngram_overlap", "text_repetition_score",
    "q6_forecast_revenue", "q5_local_supplier_volume",
    "q10_returned_value", "q18_large_orders", "scd2_status_history",
    "cdc_snapshot_diff", "events_dau_wau", "stats_corr_pairs",
    "ann_recall_at_k", "docs_source_mix", "dedup_ratio_by_source",
    "q7_volume_shipping", "q14_promo_revenue_share",
    "ntile_customer_deciles", "sample_per_group_topn",
    "skew_key_profile",
    "q2_min_cost_supplier", "q4_priority_count", "q8_market_share",
    "q9_product_profit", "q11_important_parts", "q12_tax_priority",
    "q13_order_distribution", "q15_top_supplier",
    "q16_part_supplier_counts", "q17_small_qty_revenue",
    "q19_disjunctive_revenue", "q20_promo_suppliers",
    "q21_sole_blamed_supplier", "q22_dormant_customers",
    "ngram_bigram_hitters", "mix_temperature_weights",
    "text_length_histogram", "dedup_cluster_weights",
    "stream_trending_topk", "sim_mmr_rerank",
    "basket_part_pairs", "text_kwic_window",
    # cheap-first within the new block (r2 lesson: a time-based driver
    # budget verifies more entries when the cheap ones come first) -
    # measured sf0.01 cold times from the local sweep
    "sample_weighted_systematic", "dq_rules_summary",
    "events_json_key_profile", "orders_wow_change",
    "orders_cycle_time_stats", "profile_table_describe",
    "docs_vocab_growth", "events_dwell_time",
    "events_seasonality_profile", "events_user_growth",
    "w7_frame_first_last",
    "stats_ks_drift", "events_mad_outliers",
    "events_touch_matrix", "cdc_apply_changes", "multimodal_bmp_decode",
    "events_resample_gapfill", "orders_rfm_segments",
    "dedup_repeated_spans", "dedup_containment", "text_bpe_merges",
    "sim_topk_ann_pq",
    "text_gopher_rules", "text_unigram_logprob",
    "w8_percent_rank_cume", "embed_gram_matrix",
    "events_value_winsorized", "orders_revenue_concentration",
    "embed_top_pc",
    # -- green in CORRECTNESS_r03 (freshest signal, deferred) --
    "pipeline_docs_curate", "text_chunk_windows", "text_redact_pii",
    "text_pack_sequences", "stats_approx_quantiles",
    "events_funnel_conversion", "events_retention_cohorts",
    "text_tfidf_top_terms", "dedup_cluster_components",
    "events_hourly_anomalies", "data_split_assign",
    "pipeline_training_data", "events_transition_matrix",
    "embed_quantize_int8", "dates_derived", "embed_label_centroid",
    "join_asof_attribution", "q3_top_revenue", "set_intersect_repeat",
    "text_language_id", "text_top_terms", "w4_above_customer_avg",
    "stream_sessionize", "events_json_extract", "q1_pricing_summary",
    "agg_approx_distinct", "join_time_band", "sim_cosine_near_dups",
    "sim_topk_ann_ivf", "sim_topk_ann_srp", "multimodal_wav_decode",
    "multimodal_media_stats", "stream_sliding_panes",
    "stream_tumbling_hourly", "dedup_minhash_lsh", "dedup_simhash",
    "d5_view_date_eq", "e3_reason_codes", "h3_count_per_group",
    "stats_exact_moments", "agg_conditional_filter", "agg_cube_grouping",
    "d6_view_date_between", "g1_g2_first_valid_fill", "i2_fk_violations",
    "set_union_distinct", "sim_topk_bruteforce", "etl_clean_pipeline",
    "etl_dim_first_seen",
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _DEBT_FIRST if n in src}
    out.update({n: v for n, v in src.items() if n not in out})
    return out


QUERIES = _ordered(_QUERIES)
ORACLES = _ordered(_ORACLES)
