"""Aggregated query registry: importing this module registers every
catalog entry (core reference surface, ETL pipeline, extensions).

QUERIES/ORACLES are re-emitted in VERIFICATION-DEBT-FIRST order. The
driver walks the dict in insertion order under a ~50-entry budget, so a
fixed cheapest-first pin (round 2) permanently exiled the expensive tail
from verification. Rotation history: r3 spent its window on
never-verified entries (49 green), r4 refreshed stale currency (50/50
green, the one historical err fixed). After r4 the cumulative ledger is
102/179 driver-green and 77 never driver-hashed (all of catalog_tpch
q2-q22 plus most of the r4 scale/pipe/quality waves).

Round-5 pin, per the r4 verdict's top directive ("re-pin with those 77
first, cheapest-first within so the time-based budget stretches
furthest"):

  1-77   the never-driver-verified entries, ordered by measured
         sf0.01 cold time (spark + duckdb oracle, from this round's
         tools/check_oracle.py sweep: 0.3s..9.5s) - the ~50-budget
         covers everything up to ~1s; the expensive tail
         (dedup_cluster_weights, sim_mmr_rerank, embed_top_pc ...)
         lands last and front-runs r6 if the window closes early;
  78-86  the round-5 additions (batched BPE + BPE encode, PNG decode,
         the bucketed co-located join, composed IVF-PQ, the four
         persisted-ANN-index serves) - never verified, next in line;
  87-89  last green in r2 (two rounds stale);
  90-139 last green in r3;
  tail   the 50 entries CORRECTNESS_r04 just confirmed (freshest
         signal, safe to defer).

Entries not in the pinned list (round-5 additions) keep registration
order at the end until classified.
"""

from . import (  # noqa: F401
    catalog, catalog_agg, catalog_ann, catalog_etl, catalog_ext,
    catalog_llm, catalog_pipe, catalog_quality, catalog_scale,
    catalog_tpch, catalog_warehouse, catalog_win,
)
from .catalog import ORACLES as _ORACLES
from .catalog import QUERIES as _QUERIES

_DEBT_FIRST = [
    # -- never driver-verified (77), measured-cheapest-first --
    "dedup_ratio_by_source",            # 0.3s
    "docs_source_mix",                  # 0.3s
    "events_json_key_profile",          # 0.3s
    "events_seasonality_profile",       # 0.3s
    "q6_forecast_revenue",              # 0.3s
    "sample_per_group_topn",            # 0.3s
    "sample_weighted_systematic",       # 0.3s
    "skew_key_profile",                 # 0.3s
    "text_kwic_window",                 # 0.3s
    "text_length_histogram",            # 0.3s
    "w7_frame_first_last",              # 0.3s
    "w8_percent_rank_cume",             # 0.3s
    "events_user_growth",               # 0.4s
    "ntile_customer_deciles",           # 0.4s
    "table_checksum",                   # 0.4s
    "text_gopher_rules",                # 0.4s
    "cdc_apply_changes",                # 0.5s
    "layout_zorder_stats",              # 0.5s
    "orders_revenue_concentration",     # 0.5s
    "orders_wow_change",                # 0.5s
    "q12_tax_priority",                 # 0.5s
    "q13_order_distribution",           # 0.5s
    "q14_promo_revenue_share",          # 0.5s
    "q19_disjunctive_revenue",          # 0.5s
    "q4_priority_count",                # 0.5s
    "cdc_snapshot_diff",                # 0.6s
    "dq_rules_summary",                 # 0.6s
    "embed_gram_matrix",                # 0.6s
    "events_linear_trend",              # 0.6s
    "events_resample_gapfill",          # 0.6s
    "mix_temperature_weights",          # 0.6s
    "ngram_bigram_hitters",             # 0.6s
    "orders_rfm_segments",              # 0.6s
    "q15_top_supplier",                 # 0.6s
    "q17_small_qty_revenue",            # 0.6s
    "q22_dormant_customers",            # 0.6s
    "text_repetition_score",            # 0.6s
    "dedup_repeated_spans",             # 0.7s
    "events_value_winsorized",          # 0.7s
    "stream_trending_topk",             # 0.7s
    "text_unigram_logprob",             # 0.7s
    "events_touch_matrix",              # 0.8s
    "events_dau_wau",                   # 0.8s
    "q16_part_supplier_counts",         # 0.8s
    "q9_product_profit",                # 0.8s
    "rollup_incremental_merge",         # 0.8s
    "events_mad_outliers",              # 0.9s
    "q10_returned_value",               # 0.9s
    "q11_important_parts",              # 0.9s
    "scd2_status_history",              # 0.9s
    "stats_ks_drift",                   # 0.9s
    "q18_large_orders",                 # 1.0s
    "q2_min_cost_supplier",             # 1.0s
    "q7_volume_shipping",               # 1.0s
    "stats_corr_pairs",                 # 1.0s
    "q20_promo_suppliers",              # 1.1s
    "q8_market_share",                  # 1.1s
    "text_unigram_rarity",              # 1.1s
    "q21_sole_blamed_supplier",         # 1.2s
    "events_dwell_time",                # 1.3s
    "q5_local_supplier_volume",         # 1.3s
    "sim_topk_ann_pq",                  # 1.3s
    "events_rolling_1h",                # 1.5s
    "text_bpe_merges",                  # 1.6s
    "dedup_containment",                # 1.7s
    "docs_vocab_growth",                # 1.7s
    "profile_table_describe",           # 2.0s
    "multimodal_bmp_decode",            # 2.1s
    "join_bloom_prefilter",             # 2.3s
    "orders_cycle_time_stats",          # 2.3s
    "basket_part_pairs",                # 2.6s
    "decontam_ngram_overlap",           # 2.6s
    "ann_recall_at_k",                  # 3.2s
    "sample_stratified_docs",           # 3.7s
    "dedup_cluster_weights",            # 6.8s
    "sim_mmr_rerank",                   # 7.7s
    "embed_top_pc",                     # 9.5s
    # -- new in r5 (never driver-verified; next in line after the
    #    debt), measured sf0.01 cheapest-first like the block above --
    "text_bpe_merges_batched",          # 1.0s
    "text_bpe_encode",                  # 1.0s
    "sim_topk_ann_ivfpq",               # 1.1s
    "dedup_minhash_recall",             # 1.2s
    "text_bigram_logprob",              # 1.2s
    "sketch_count_min",                 # 1.2s
    "multimodal_png_decode",            # 1.2s
    "layout_bucketed_join",             # 1.5s
    "sim_ann_index_srp_serve",          # 5.5s (index build dominates)
    "sim_ann_index_ivf_serve",          # 9.7s
    "sim_ann_index_pq_serve",           # 10.2s
    "sim_ann_index_ivfpq_serve",        # 15.2s (builds ivf+pq)
    # -- last green in r2 (stalest live signal) --
    "skew_salted_agg", "w6_rank_pack", "agg_argmax_best_order",
    # -- last green in r3 --
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
    # -- green in CORRECTNESS_r04 (freshest signal, deferred) --
    "multimodal_feature_extract", "etl_critical_quarantine",
    "dedup_ngram_jaccard", "etl_critical_scaled", "etl_clean_scaled",
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
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _DEBT_FIRST if n in src}
    out.update({n: v for n, v in src.items() if n not in out})
    return out


QUERIES = _ordered(_QUERIES)
ORACLES = _ordered(_ORACLES)
