"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = sum of per-query MEDIAN wall seconds (lower is better).

Measurement discipline (round-1 lesson: single cold timings on this box
vary 8s-vs-30s across sessions):
- orphaned Spark JVMs from killed runs keep all cores busy and poison
  timings; they are re-parented to init (ppid 1), so kill exactly those
  before starting -- a live harness session (real parent) is never touched.
- every query runs REPS times, rounds interleaved (q1..qn, q1..qn, ...) so
  a transient system stall hits one round of many queries rather than all
  reps of one query; the median per query is reported.
"""

from __future__ import annotations

import json
import os
import signal
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# Headliners: the flagship view, scan-heavy agg, join-heavy top-k, the
# full ETL clean pipeline, dedup + similarity extension paths, and the
# skew pair (same skewed input, unsalted vs salted plan).
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
    "skew_plain_agg",
    "skew_salted_agg",
]


def kill_orphan_spark_jvms() -> None:
    """Kill java+spark processes whose parent is init (ppid 1): JVMs left
    behind by killed runs. Never touches a JVM with a live owner."""
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
            if "java" not in cmd or "spark" not in cmd.lower():
                continue
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
            if ppid == 1:
                os.kill(int(pid), signal.SIGKILL)
                print(f"# killed orphan spark JVM pid={pid}", file=sys.stderr)
        except (OSError, ValueError, IndexError):
            continue


def main() -> None:
    kill_orphan_spark_jvms()

    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM/codegen once with a trivial job so per-query timings
    # measure the engine, not session bootstrap
    spark.range(1).count()

    # Warm-up pass (untimed): absorbs cold-start (codegen, Python worker
    # spawn, shuffle dirs) and records row counts for the status lines.
    rows: dict[str, int] = {}
    for name in HEADLINE:
        rows[name] = registry.QUERIES[name](spark, SF_DIR).count()

    # Timed reps use a noop DataSource-V2 write: count() lets Catalyst
    # prune computed columns that feed no filter/agg, under-measuring
    # narrow map-heavy queries; noop materializes every column JVM-side.
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for rep in range(REPS):
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"# rep{rep} {name}: {rows[name]} rows in {dt:.3f}s",
                  file=sys.stderr)

    timings = {name: round(statistics.median(ts), 3)
               for name, ts in samples.items()}
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
