"""Aggregated query registry: importing this module registers every
catalog entry (core reference surface, ETL pipeline, extensions).

QUERIES/ORACLES are re-emitted in CHEAPEST-FIRST order (measured sf0.01
wall time, Spark + DuckDB oracle side). The verification driver walks the
dict in insertion order under a runtime budget; round 1 recorded rows for
exactly the first 50 registered entries, so ordering by cost maximizes
how many entries receive a driver verdict whatever the budget is. Entries
not in the pinned list (future additions) keep registration order at the
end until re-measured.
"""

from . import catalog, catalog_agg, catalog_etl, catalog_ext, catalog_win  # noqa: F401
from .catalog import ORACLES as _ORACLES
from .catalog import QUERIES as _QUERIES

_CHEAPEST_FIRST = [
    "c1_rename_project", "d4_negative_amounts", "d4b_threshold_filter",
    "f6_gauss_missing", "text_token_count", "sample_hash_bucket",
    "unnest_embedding_pos", "h2_count_global", "h5_null_ratio",
    "h6_sum_column", "e5_date_extract", "f4_f5_amount_guards",
    "d1_validity_split_counts", "d3_dedup_pairs", "j1_head_tail",
    "j2_union", "b3_last_writer_wins", "join_semi_exists",
    "join_anti_no_orders", "scalar_share_of_total", "hist_price_bins",
    "dedup_exact", "skew_plain_agg", "agg_count_distinct",
    "h9_rollup_totals", "text_levenshtein_pairs", "h4_null_counts",
    "e3_reason_codes", "f1_lenient_numeric_cast", "d5_view_date_eq",
    "d6_view_date_between", "i1_join_inner", "i2_fk_violations",
    "b2_first_seen_wins", "agg_conditional_filter", "stats_exact_moments",
    "agg_cube_grouping", "unpivot_measures", "set_union_distinct",
    "embed_label_centroid", "skew_salted_agg", "w1_running_total",
    "pivot_status_priority", "stats_percentiles", "dates_derived",
    "w2_topk_per_group", "w4_above_customer_avg", "join_time_band",
    "set_intersect_repeat", "text_top_terms", "f2_multiformat_dates",
    "agg_argmax_best_order", "w6_rank_pack", "etl_tier_counts",
    "sim_topk_bruteforce", "text_quality_score", "text_fingerprint",
    "stream_sliding_panes", "w3_lag_gap_days", "join_asof_attribution",
    "join_outer_coverage", "h3_count_per_group", "g1_g2_first_valid_fill",
    "etl_critical_quarantine", "set_except_lapsed", "etl_clean_pipeline",
    "etl_dim_first_seen", "agg_approx_distinct", "etl_critical_scaled",
    "sim_topk_ann_ivf", "text_language_id", "stream_tumbling_hourly",
    "multimodal_media_stats", "events_json_extract", "e1_normalize_strings",
    "sim_cosine_near_dups", "i3_set_difference", "dedup_ngram_jaccard",
    "stream_sessionize", "etl_clean_scaled", "dedup_minhash_lsh",
    "h1_daily_totals", "q3_top_revenue", "q1_pricing_summary",
    "sim_topk_ann_srp", "dedup_simhash", "multimodal_wav_decode",
    "multimodal_feature_extract",
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _CHEAPEST_FIRST if n in src}
    out.update({n: v for n, v in src.items() if n not in out})
    return out


QUERIES = _ordered(_QUERIES)
ORACLES = _ordered(_ORACLES)
