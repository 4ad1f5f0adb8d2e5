"""Round-7 freeze guards (r6 verdict directives #4 and #7), as
mechanical invariants instead of judge discipline:

- the bench HEADLINE suite is pinned to the exact 22 queries BENCH_r06
  measured, so the cross-round trend line the "within 2x of baseline"
  criterion reads stays comparable;
- the catalog may not grow while the never-driver-verified queue
  (registry entries absent from every committed CORRECTNESS_r*.json)
  exceeds one driver window (~50 entries/round): unverified breadth is
  risk, not coverage. Once the debt fits a single window, growth is
  allowed again.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The permanent bench suite -- BENCH_r06's exact key set. Changing
# bench.HEADLINE without changing this literal (or vice versa) fails.
FROZEN_HEADLINE = [
    "h1_daily_totals",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_orders",
    "q21_sole_blamed_supplier",
    "etl_clean_scaled",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_repeated_spans",
    "pipeline_docs_curate",
    "pipeline_training_data",
    "sim_topk_bruteforce",
    "sim_topk_ann_srp",
    "stream_tumbling_hourly",
    "stream_sessionize",
    "skew_plain_agg",
    "skew_salted_agg",
    "layout_bucketed_join",
    "text_bpe_encode",
]

# One driver verification window: ~50 entries/round (observed r3-r6).
DRIVER_WINDOW = 50
# The catalog size at the round-6 close, where the freeze was declared.
FREEZE_SIZE = 315


def _never_driver_verified():
    import sys
    sys.path.insert(0, REPO)
    from python_etl_rest_api_spark import registry
    checked = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        checked |= set(json.load(open(path)).keys())
    names = set(registry.QUERIES)
    return len(registry.QUERIES), sorted(names - checked)


def test_bench_headline_suite_is_frozen():
    import bench
    assert bench.HEADLINE == FROZEN_HEADLINE, (
        "bench HEADLINE is frozen at the 22 BENCH_r06 queries; add new "
        "benchmarks to a separate non-headline section instead")
    r6 = json.load(open(os.path.join(REPO, "BENCH_r06.json")))
    assert sorted(r6["parsed"]["queries"]) == sorted(FROZEN_HEADLINE)


def test_catalog_frozen_until_debt_fits_one_window():
    total, never = _never_driver_verified()
    if len(never) > DRIVER_WINDOW:
        assert total <= FREEZE_SIZE, (
            f"catalog grew to {total} while {len(never)} entries have "
            f"never been driver-verified (> one ~{DRIVER_WINDOW}-entry "
            "window). Freeze @query additions until the debt queue "
            "drains; verification is the hard signal, breadth is not.")
