"""SparkSession construction and engine-wide conventions.

Conventions (SURVEY.md section 7.3):
- coercion never throws: use ``try_*`` functions / ``try_cast`` everywhere a
  lenient pandas-style coercion-to-null is expected, so the engine behaves
  identically whether or not ``spark.sql.ansi.enabled`` is on.
- money arithmetic goes through DecimalType (exact, order-independent sums)
  and is cast to double only at the output boundary, so results are
  reproducible across partitionings and engines.
- AQE on: runtime re-planning (skew joins, partition coalescing) is the
  scale posture for the 100 TB target.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs that are safe to (re)apply to an externally provided session
# (e.g. the verification driver's). All of these are runtime-mutable.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS); read as long session-wide so
    # plans built before/after _events() agree (micros columns unaffected).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime conventions to an existing session (idempotent)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be static on some deployments; keep going
    return spark


def widen_scan(df, min_factor: int = 4):
    """Rebalance a freshly-scanned frame across all cores when the scan
    itself yields too few splits to use them.

    Small-file guard: a sub-128 MB single-row-group parquet file scans as
    ONE task, so CPU-heavy narrow transforms downstream (multi-format
    timestamp parsing, hashing, decimal arithmetic) run serially no
    matter how many cores exist. A round-robin repartition of a few MB
    is ~free and unlocks the full core count. At production scale the
    scan has thousands of splits, the gate is false, and this is a
    no-op -- never put an unconditional repartition after a scan: on a
    100 TB input that IS the bottleneck.
    """
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= cores:
        return df.repartition(cores)
    return df


def get_spark(app_name: str = "python_etl_rest_api_spark",
              cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    local[N] for tests/bench; on a real cluster the master/memory settings
    come from spark-submit and only the SQL confs below matter.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # match local core count, not the 200 default; AQE coalesces further
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
