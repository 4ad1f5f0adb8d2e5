"""Aggregated query registry: importing this module registers every
catalog entry (core reference surface, ETL pipeline, extensions).

QUERIES/ORACLES are re-emitted in VERIFICATION-DEBT-FIRST order. The
driver walks the dict in insertion order under a ~50-entry budget, so a
fixed cheapest-first pin (round 2) permanently exiled the expensive tail
from verification. Rotation history: r3 spent its window on
never-verified entries (49 green), r4 refreshed stale currency (50/50
green), r5 cleared 48 more of the never-verified queue but went 48/50 -
the first reds ever: two oracles with uncast SUM(CASE->1/0), which
DuckDB types HUGEINT (int128) while Spark emits BIGINT under the
driver's type-sensitive hash. After r5 the cumulative ledger is 150/191
driver-green with 41 entries non-green (the 2 reds + 39 never checked).

Round-6 pin, per the r5 verdict ("re-pin to close the debt entirely:
the 4 fixed entries first, then the remaining never-verified
cheapest-first"):

  1-4    the four HUGEINT-fixed entries (the 2 r5 reds + the 2 BPE
         oracles carrying the same latent bug), now CAST AS BIGINT and
         typed-sweep green - first so CORRECTNESS_r06 proves the fix;
  5-37   the remaining never-driver-verified entries, ordered by this
         round's measured sf0.01 cold time (tools/check_oracle.py
         typed sweep, 0.2s..8s);
  38-41  the four persisted-ANN-index serves, CONTIGUOUS at the tail
         of the debt block: they now share ONE full-family index build
         per corpus (catalog_ann._shared_index), so the first pays the
         build (~15s warm) and the rest verify at serve cost (~2s) -
         49 entries (41 debt + 8 r6 additions: jpeg/avi/resize/
         wav-energy multimodal, dsir_importance_weights,
         skew_salted_join, layout_compaction_plan,
         dedup_semantic_clusters) <= the ~50 budget, so the whole debt
         clears in one window with room for green refreshes behind;
  50-62  the 13 r7 additions (iterative PageRank + k-means, incremental
         band-index dedup, EWMA + Holt smoothers, interval-overlap and
         triangle joins, Welch test, schema-drift union, URL
         canonicalization, ORC round trip, video motion), cheapest-
         first among themselves BEHIND the r6 debt block: the window
         boundary lands ~here, so whatever the budget reaches verifies
         now and the rest leads the r7 debt queue;
  42+    driver-green entries, stalest-first (r2, r3, r4, r5) - the
         freshest signal defers to the back.

Late round-6 additions (third r7 wave and after, catalog_robust.py +
the privacy/curation entries in catalog_infer.py, then the fourth
r7 wave in catalog_mining.py: OHLC bars, path mining, Benford / Gini /
ABC / runs / SRM audits, pseudonymized joins, feature hashing + target
encoding, JSONL round trip, WHT bands, audio VAD, hourly bitmaps,
freshness watermark, exact 2-regressor OLS, cosine histogram, brand
modularity, class-balanced sampling, RAKE keywords) are appended at
the tail of the never-verified queue, cheapest-first within their
wave: the r6 debt block still clears first and the new entries lead
the r7 debt queue, all typed-sweep green at pin time (catalog size at
the r6 close: 315 oracle-paired entries).
"""

from . import (  # noqa: F401
    catalog, catalog_agg, catalog_ann, catalog_etl, catalog_ext,
    catalog_infer, catalog_iter, catalog_llm, catalog_mining,
    catalog_pipe, catalog_quality, catalog_robust, catalog_scale,
    catalog_tpch, catalog_warehouse, catalog_win,
)
from .catalog import ORACLES as _ORACLES
from .catalog import QUERIES as _QUERIES

_DEBT_FIRST = [
    # -- the four HUGEINT-fixed oracles (r5 reds + latent twins) --
    "q12_tax_priority",                 # 0.9s; r5 red, CAST fixed
    "events_value_winsorized",          # 0.8s; r5 red, CAST + exact mean
    "text_bpe_merges",                  # 1.6s; latent HUGEINT cnt, fixed
    "text_bpe_merges_batched",          # 1.0s; latent HUGEINT cnt, fixed
    # -- never driver-verified, measured-cheapest-first (r6 sweep) --
    "sample_stratified_docs",           # 0.2s
    "events_rolling_1h",                # 0.4s
    "text_unigram_rarity",              # 0.5s
    "sketch_count_min",                 # 0.7s
    "docs_vocab_growth",                # 0.8s
    "join_bloom_prefilter",             # 0.9s
    "q18_large_orders",                 # 0.9s
    "basket_part_pairs",                # 1.0s
    "events_dwell_time",                # 1.0s
    "q5_local_supplier_volume",         # 1.0s
    "stats_corr_pairs",                 # 1.0s
    "text_bigram_logprob",              # 1.0s
    "text_bpe_encode",                  # 1.0s
    "orders_cycle_time_stats",          # 1.1s
    "q7_volume_shipping",               # 1.1s
    "q21_sole_blamed_supplier",         # 1.2s
    "q2_min_cost_supplier",             # 1.2s
    "multimodal_png_decode",            # 1.3s
    "multimodal_jpeg_decode",           # 1.3s; new r6 (baseline DCT codec)
    "multimodal_avi_frames",            # ~1.3s; new r6 (RIFF/AVI sampling)
    "dsir_importance_weights",          # ~1s; new r6 (DSIR selection)
    "skew_salted_join",                 # ~1s; new r6 (salted skew join)
    "layout_compaction_plan",           # ~0.5s; new r6 (bin-pack planner)
    "dedup_semantic_clusters",          # ~1.5s; new r6 (SemDeDup prune)
    "multimodal_image_resize",          # ~1.5s; new r6 (box resize+reencode)
    "multimodal_wav_energy",            # ~1s; new r6 (ZCR + frame energy)
    "q8_market_share",                  # 1.3s
    "sim_topk_ann_ivfpq",               # 1.4s
    "ann_recall_at_k",                  # 1.5s
    "layout_bucketed_join",             # 1.5s
    "multimodal_bmp_decode",            # 1.5s
    "q20_promo_suppliers",              # 1.5s
    "profile_table_describe",           # 1.7s
    "sim_topk_ann_pq",                  # 1.8s
    "dedup_containment",                # 1.9s
    "decontam_ngram_overlap",           # 2.0s
    "stats_ks_drift",                   # 2.1s
    "sim_mmr_rerank",                   # 2.9s
    "dedup_minhash_recall",             # 3.2s
    "dedup_cluster_weights",            # 5.7s
    "embed_top_pc",                     # 7.9s
    # -- persisted-ANN serves: contiguous so the ONE shared index
    #    build amortizes across all four (build ~15s once, then ~2s) --
    "sim_ann_index_srp_serve",
    "sim_ann_index_ivf_serve",
    "sim_ann_index_pq_serve",
    "sim_ann_index_ivfpq_serve",
    # -- new in r7 (never driver-verified; behind the r6 debt block so
    #    that debt clears first, cheapest-first among themselves) --
    "schema_drift_union",               # ~0.3s
    "events_ewma_daily",                # ~0.8s
    "stats_welch_ttest",                # ~0.8s
    "join_interval_overlap",            # ~1s
    "multimodal_video_motion",          # ~1.3s
    "dedup_incremental_index",          # ~1.5s
    "embed_kmeans_train",               # ~3s (3 Lloyd rounds)
    "graph_pagerank_copurchase",        # ~4s (5 PageRank rounds)
    "mix_epoch_plan",                   # ~0.5s
    "events_holt_forecast",             # ~0.8s
    "docs_url_canonicalize",            # ~0.8s
    "source_orc_roundtrip",             # ~1s (one-time ORC rewrite)
    "graph_triangle_census",            # ~1.5s
    "events_activity_streaks",          # ~0.6s
    "events_cusum_drift",               # ~0.8s
    "sketch_hll_cardinality",           # ~1s
    # -- second r7 wave (catalog_infer.py): behind the first wave so
    #    older debt keeps clearing first, cheapest-first --
    "stream_dedup_ingest",              # ~0.4s
    "sketch_kmv_distinct",              # ~0.5s
    "stats_chi2_independence",          # ~0.6s
    "stats_acf_daily",                  # ~0.6s
    "stats_mannwhitney_u",              # ~0.8s
    "source_parquet_mergeschema",       # ~0.9s (one-time 2-gen write)
    "layout_partition_pruning",         # ~1s (one-time partitioned write)
    "basket_association_lift",          # ~1.2s
    "text_collocations_pmi",            # ~1.5s
    "embed_knn_classify",               # ~1.5s
    "privacy_dp_counts",                # ~0.4s
    "privacy_k_anonymity",              # ~0.6s
    "embed_outlier_prune",              # ~1s
    "graph_kcore_decomposition",        # ~2s (3 pruning rounds)
    # -- third r7 wave (catalog_robust.py), cheapest-first --
    "privacy_l_diversity",              # ~0.4s
    "sketch_kmv_jaccard",               # ~0.8s
    "stats_bootstrap_means",            # ~1s (32 replicas, one scan)
    "stats_theilsen_trend",             # ~7s (days^2 pairs, two-pass)
    "dedup_image_ahash_lsh",            # ~1.5s (aHash + Hamming LSH)
    "search_bm25_topk",                 # ~1s (rational BM25, top-10)
    "stream_late_arrivals",             # ~0.6s (watermark audit)
    "sketch_ams_f2",                    # ~0.7s (16 sign counters)
    "layout_zonemap_prune",             # ~0.5s (read-side skip audit)
    "stats_permutation_test",           # ~1.5s (32 relabelings)
    "graph_bfs_levels",                 # ~4s (3 frontier rounds)
    "stats_join_size_est",              # ~1s (hot/cold histogram est)
    "sink_partition_overwrite",         # ~1.5s (2-gen dynamic write)
    "privacy_erasure_audit",            # ~0.5s (broadcast anti-join)
    "stats_capture_recapture",          # ~0.5s (Chapman estimate)
    "embed_matryoshka_recall",          # ~2s (two bruteforce legs)
    "profile_column_gini",              # ~0.6s (3 value-count aggs)
    "profile_functional_deps",          # ~0.8s (4 distinct-pair aggs)
    "dq_referential_health",            # ~1.2s (6 FK orphan audits)
    "events_interarrival_hist",         # ~0.7s (log2 gap buckets)
    "stats_survival_table",             # ~0.8s (KM life table)
    "events_markov_stationary",         # ~1.5s (5 power iterations)
    "text_good_turing",                 # ~0.7s (count-of-counts)
    "text_encoding_quality",            # ~0.6s (3 regex predicates)
    "dq_sequence_gaps",                 # ~0.7s (per-order contiguity)
    "select_pareto_frontier",           # ~1s (bucket-pruned skyline)
    "orders_cohort_ltv",                # ~0.8s (cohort x age cents)
    "text_zipf_topk",                   # ~0.7s (top-20 rank-freq)
    "embed_centroid_drift",             # ~1.2s (two-sample centroids)
    "source_csv_corrupt_records",       # ~0.5s (PERMISSIVE quarantine)
    "multimodal_audio_decimate",        # ~1s (decimate + decode)
    # -- fourth r7 wave (catalog_mining.py), cheapest-first --
    "stats_benford_first_digit",        # ~0.4s (9-digit audit)
    "text_hashing_features",            # ~0.7s (64-bucket featurizer)
    "events_top_paths",                 # ~0.8s (3-step path heads)
    "privacy_pseudonymize_join",        # ~0.8s (token-joined top-10)
    "events_ohlc_hourly",               # ~1.1s (bar-key window+agg)
    "stats_gini_lorenz",                # ~2s (two-pass rank identity)
    "orders_abc_classes",               # ~3s (two-pass Pareto cut)
    "source_json_roundtrip",            # ~3s (one-time JSONL write)
    "dq_freshness_watermark",           # ~0.8s (watermark lag audit)
    "stats_ols_two_regressors",         # ~1.1s (Cramer 3x3 exact OLS)
    "embed_cosine_histogram",           # ~1.4s (broadcast sim buckets)
    "events_hourly_bitmap",             # ~1.5s (bit_or fingerprints)
    "multimodal_wht_bands",             # ~2s (FWHT vs popcount oracle)
    "stats_runs_test",                  # ~1s (day-series runs count)
    "text_rake_keywords",               # ~2s (islands + degree/freq)
    "sample_class_balance",             # ~2s (per-label hash heads)
    "graph_community_modularity",       # ~8s (edge set + brand join)
    "stats_ab_srm",                     # ~0.7s (2-arm hash split)
    "feature_target_encode",            # ~1.2s (rational smoothing)
    "multimodal_audio_vad",             # ~1.5s (energy-gated islands)
    "multimodal_gif_decode",            # ~1.5s (LZW codec vs closed form)
    "dq_uniqueness_audit",              # ~1s (6-leg PK audit)
    "events_uplift_by_arm",             # ~1.2s (arm means in micros)
    "scd2_as_of_lookup",                # ~1.3s (point-in-time read)
    "text_langid_confusion",            # ~1.2s (eval confusion matrix)
    "ann_recall_vs_nprobe",             # ~8s (3 IVF legs vs brute)
    "dq_schema_contract",               # ~0.5s (footer-only audit)
    "embed_label_margin",               # ~1.5s (bounded pair sample)
    "orders_hhi_by_nation",             # ~1.2s (squared-share rational)
    "dedup_lsh_scurve",                 # ~2s (bounded banding curve)
    "events_churn_buckets",             # ~0.8s (lifecycle rollup)
    "dq_split_leakage",                 # ~0.6s (content-hash audit)
    "supply_single_source_risk",        # ~1s (sourcing rollup)
    "sample_kfold_assign",              # ~0.5s (fold balance audit)
    "embed_norm_histogram",             # ~0.6s (norm QA buckets)
    "orders_seasonal_index",            # ~0.8s (month-vs-year index)
    "text_dup_family_spectrum",         # ~0.6s (dup-family rollup)
    "orders_priority_mix_drift",        # ~0.9s (categorical drift)
    "docs_source_quality_matrix",       # ~1s (gate rollup per source)
    "mix_token_budget_allocation",      # ~0.6s (Hamilton apportionment)
    "events_session_coverage",          # ~1s (interval-union sweep)
    "graph_degree_distribution",        # ~2s (log2 degree buckets)
    "text_vocab_coverage_curve",        # ~1.5s (two-pass top-k mass)
    "events_peak_concurrency",          # ~1.5s (two-pass sweep line)
    "join_asof_tolerance",              # ~1s (expiring attribution)
    "text_term_burstiness",             # ~1s (cf/df head)
    "dq_header_detail_reconcile",       # ~1s (financial reconcile)
    "orders_basket_size_histogram",     # ~0.6s (lines-per-order prior)
    "events_first_touch",               # ~0.8s (opening attribution)
    "privacy_generalization_ladder",    # ~0.9s (3-level lattice walk)
    "stats_mann_kendall",               # ~1.5s (day-pairs S statistic)
    "docs_boilerplate_prefixes",        # ~0.7s (shared-opening heads)
    "multimodal_audio_clipping",        # ~1s (rail-sample audit)
    "orders_reorder_gap_median",        # ~1.5s (two-pass exact median)
    "sketch_cms_width_curve",           # ~2.5s (3-width error curve)
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
    # -- last green in r4 --
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
    # -- last green in r5 (freshest signal, deferred) --
    "dedup_ratio_by_source", "docs_source_mix", "events_json_key_profile",
    "events_seasonality_profile", "q6_forecast_revenue",
    "sample_per_group_topn", "sample_weighted_systematic",
    "skew_key_profile", "text_kwic_window", "text_length_histogram",
    "w7_frame_first_last", "w8_percent_rank_cume", "events_user_growth",
    "ntile_customer_deciles", "table_checksum", "text_gopher_rules",
    "cdc_apply_changes", "layout_zorder_stats",
    "orders_revenue_concentration", "orders_wow_change",
    "q13_order_distribution", "q14_promo_revenue_share",
    "q19_disjunctive_revenue", "q4_priority_count", "cdc_snapshot_diff",
    "dq_rules_summary", "embed_gram_matrix", "events_linear_trend",
    "events_resample_gapfill", "mix_temperature_weights",
    "ngram_bigram_hitters", "orders_rfm_segments", "q15_top_supplier",
    "q17_small_qty_revenue", "q22_dormant_customers",
    "text_repetition_score", "dedup_repeated_spans",
    "stream_trending_topk", "text_unigram_logprob",
    "events_touch_matrix", "events_dau_wau", "q16_part_supplier_counts",
    "q9_product_profit", "rollup_incremental_merge",
    "events_mad_outliers", "q10_returned_value", "q11_important_parts",
    "scd2_status_history",
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _DEBT_FIRST if n in src}
    out.update({n: v for n, v in src.items() if n not in out})
    return out


QUERIES = _ordered(_QUERIES)
ORACLES = _ordered(_ORACLES)
