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
