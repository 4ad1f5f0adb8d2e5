"""Checkpoint restart + replay idempotence: the two failure-mode
behaviors a streaming pipeline must prove, not assume - a restarted
query resumes from checkpointed offsets (no reprocessing, no loss), and
a redelivered micro-batch lands without duplicating output."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.streaming.recovery import (
    exactly_once_parquet_sink,
    write_batch_idempotent,
)


def _run_available_now(stream, out, chk):
    q = (exactly_once_parquet_sink(stream, out)
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert not q.isActive


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    spark.range(0, 50).select(F.col("id")).write.parquet(f"{src}/f1")

    stream = spark.readStream.schema("id long").option(
        "recursiveFileLookup", "true").parquet(src)
    _run_available_now(stream, out, chk)
    first = spark.read.parquet(out).select("id")
    assert first.count() == 50 and first.distinct().count() == 50

    # new data arrives while the query is down; the restart must pick
    # up ONLY the new file (offsets checkpointed), not re-ingest f1
    spark.range(50, 80).select(F.col("id")).write.parquet(f"{src}/f2")
    stream2 = spark.readStream.schema("id long").option(
        "recursiveFileLookup", "true").parquet(src)
    _run_available_now(stream2, out, chk)
    both = spark.read.parquet(out).select("id")
    assert both.count() == 80
    assert both.distinct().count() == 80
    assert both.agg(F.sum("id")).collect()[0][0] == sum(range(80))


def test_replayed_batch_does_not_duplicate(spark, tmp_path):
    """Simulate the crash window: the same micro-batch delivered twice
    with the same batch_id must leave exactly one copy."""
    out = str(tmp_path / "out")
    batch = spark.range(0, 10).select(F.col("id"))
    write_batch_idempotent(batch, 7, out)
    write_batch_idempotent(batch, 7, out)          # redelivery
    got = spark.read.parquet(out)
    assert got.count() == 10
    # a DIFFERENT batch id lands alongside, untouched
    write_batch_idempotent(spark.range(10, 15), 8, out)
    assert spark.read.parquet(out).count() == 15
    write_batch_idempotent(batch, 7, out)          # late replay of 7
    assert spark.read.parquet(out).count() == 15


def test_watermark_drops_late_rows_across_micro_batches(spark, tmp_path):
    """R6 verdict stretch directive: prove the watermark path under REAL
    micro-batches, not its batch shadow. Drive >=4 micro-batches through
    the recovery harness's idempotent sink in append mode:

      b1: rows 10:00 and 10:30           -> watermark after b1 = 09:30
      b2: 13:00 (advances) + LATE 10:15  -> 10:15 > 09:30: KEPT
      b3: 14:00 (advances) + LATE 10:20  -> 10:20 < 12:00: DROPPED;
          watermark 12:00 >= window end 11:00 finalizes the 10:00 window
      b4: 17:00                          -> flushes remaining state

    The emitted 10:00-11:00 window must count exactly 3 events (the two
    on-time rows + the kept late row, never the dropped one)."""
    import datetime as dt
    import os

    from python_etl_rest_api_spark.streaming.windows import (
        tumbling_agg_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    stream = tumbling_agg_stream(
        spark.readStream.schema(schema).parquet(src),
        window="1 hour", watermark="1 hour")
    q = (exactly_once_parquet_sink(stream, out)
         .outputMode("append")
         .option("checkpointLocation", chk).start())
    try:
        batches = [
            [(t(10), "a", 1.0), (t(10, 30), "a", 1.0)],
            [(t(13), "a", 1.0), (t(10, 15), "a", 1.0)],   # late, kept
            [(t(14), "a", 1.0), (t(10, 20), "a", 1.0)],   # late, dropped
            [(t(17), "a", 1.0)],
        ]
        import glob as _glob
        import shutil
        for i, rows in enumerate(batches):
            # stage, then drop ONE part file into the watched dir so each
            # processAllAvailable sees exactly one new file = one batch
            stage = str(tmp_path / f"stage{i}")
            (spark.createDataFrame(rows, schema).coalesce(1)
             .write.mode("overwrite").parquet(stage))
            part = _glob.glob(f"{stage}/part-*.parquet")[0]
            shutil.copy(part, f"{src}/b{i}.parquet")
            q.processAllAvailable()
    finally:
        q.stop()

    n_batches = len([d for d in os.listdir(out)
                     if d.startswith("batch_id=")])
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    emitted = spark.read.parquet(out)
    win10 = emitted.filter(
        F.col("window_start") == F.lit("2024-01-01 10:00:00").cast(
            "timestamp")).collect()
    assert len(win10) == 1, f"10:00 window emitted {len(win10)} times"
    assert win10[0]["n_events"] == 3, (
        "late-beyond-watermark row leaked into the finalized window"
        if win10[0]["n_events"] == 4 else
        f"unexpected count {win10[0]['n_events']}")
