"""Stream-stream joins and incremental sinks.

Extends the streaming surface (windows.py, stateful.py) with the two
remaining production patterns:

- watermarked stream-stream INTERVAL join (click-to-view attribution:
  match each conversion to the triggering exposure within a time band)
  — Spark buffers both sides in the state store and the watermarks +
  band bound the buffer, so state is O(events inside the band horizon),
  never the full streams;
- a foreachBatch incremental-upsert sink that applies each micro-batch
  to a keyed table with MERGE semantics (operators/load.upsert, the
  reference's B3 load path re-expressed), turning any streaming frame
  into a continuously-maintained dimension/materialized view.

The batch twin of the interval join is the oracle-verified
``join_time_band`` catalog entry; these functions get the streaming
execution path under pytest (availableNow over bounded sources), the
same verification split the other streaming-only operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join_stream(exposures: DataFrame, conversions: DataFrame,
                            key: str = "user_id",
                            band: str = "30 minutes",
                            exposure_wm: str = "1 hour",
                            conversion_wm: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream interval join: each conversion matches
    the exposures of the same user whose timestamp lies in
    [conv.ts - band, conv.ts]. Both inputs may be unbounded streams.

    State math (what makes this safe at 100 TB/day): an exposure can
    stop waiting for conversions once the conversion-side watermark
    passes its ts + band, and a conversion can stop waiting for
    exposures once the exposure-side watermark passes its ts, so the
    state store never holds more than (watermark + band) worth of
    either stream. Without BOTH watermarks and the band upper+lower
    bounds, Spark would have to buffer a side forever — the query still
    runs but state grows monotonically; this function always sets all
    three."""
    ex = (exposures.withWatermark("ts", exposure_wm)
          .select(F.col(key).alias("ex_key"),
                  F.col("ts").alias("ex_ts"),
                  F.col("event_id").alias("exposure_id")))
    cv = (conversions.withWatermark("ts", conversion_wm)
          .select(F.col(key).alias("cv_key"),
                  F.col("ts").alias("cv_ts"),
                  F.col("event_id").alias("conversion_id")))
    cond = ((F.col("ex_key") == F.col("cv_key"))
            & (F.col("ex_ts") <= F.col("cv_ts"))
            & (F.col("ex_ts") >= F.col("cv_ts") - F.expr(
                f"INTERVAL {band}")))
    return (ex.join(cv, cond)
            .select(F.col("ex_key").alias(key), "exposure_id",
                    "conversion_id", "ex_ts", "cv_ts"))


def attribution_join_batch(exposures: DataFrame, conversions: DataFrame,
                           key: str = "user_id",
                           band: str = "30 minutes") -> DataFrame:
    """Batch twin of attribution_join_stream — identical semantics minus
    watermark eviction (bounded input needs none). Used by the tests to
    check the streaming result value-for-value, and by backfills."""
    ex = exposures.select(F.col(key).alias("ex_key"),
                          F.col("ts").alias("ex_ts"),
                          F.col("event_id").alias("exposure_id"))
    cv = conversions.select(F.col(key).alias("cv_key"),
                            F.col("ts").alias("cv_ts"),
                            F.col("event_id").alias("conversion_id"))
    cond = ((F.col("ex_key") == F.col("cv_key"))
            & (F.col("ex_ts") <= F.col("cv_ts"))
            & (F.col("ex_ts") >= F.col("cv_ts") - F.expr(
                f"INTERVAL {band}")))
    return (ex.join(cv, cond)
            .select(F.col("ex_key").alias(key), "exposure_id",
                    "conversion_id", "ex_ts", "cv_ts"))


def upsert_sink(stream: DataFrame, table_path: str, key: str,
                checkpoint: str):
    """foreachBatch incremental-upsert sink: every micro-batch MERGEs
    into the keyed parquet table at ``table_path`` via the same
    operators/load.upsert the batch ETL uses (last writer per key wins,
    within-batch ties resolved by load's stable row id), then the table
    flips atomically (versioned dir + symlink — load.atomic_overwrite).

    This is the streaming→serving bridge: the view stays queryable and
    consistent mid-stream. The per-batch full-table rewrite is the
    parquet-without-a-table-format cost and is honest about it: at
    100 TB you point the same foreachBatch at a format with native
    MERGE (Delta/Iceberg) and keep this exact call shape — only
    load.upsert's persistence swaps out. Returns the StreamingQuery."""
    from ..operators import load
    from ..sources.csv_source import with_stable_row_id

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(table_path)
        except Exception:  # first batch: table does not exist yet
            existing = None
        if not batch.isEmpty():
            merged = load.upsert(existing, with_stable_row_id(batch), key)
            load.atomic_overwrite(merged, table_path)

    return (stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
