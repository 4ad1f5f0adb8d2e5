"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across the headline suite (lower is better).
Each query is timed as a full cold plan->execute->collect cycle, the way
the driver consumes them.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headliners: the flagship view, scan-heavy agg, join-heavy top-k, the
# full ETL clean pipeline, dedup + similarity extension paths.
HEADLINE = [
    "h1_daily_totals",
    "q1_pricing_summary",
    "q3_top_revenue",
    "etl_clean_scaled",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_topk_ann_srp",
    "stream_tumbling_hourly",
    "stream_sessionize",
    "skew_salted_agg",
]


def main() -> None:
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM/codegen once with a trivial job so per-query timings
    # measure the engine, not session bootstrap
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
