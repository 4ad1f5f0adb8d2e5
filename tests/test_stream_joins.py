"""Stream-stream interval join + foreachBatch upsert sink
(streaming/joins.py).

The interval join's streaming output must agree with its batch twin on
bounded input (append-mode caveat: rows whose watermark has not passed
at end-of-stream may be withheld, so streamed ⊆ batch, value-identical
on every emitted row — with availableNow over a bounded source and a
final watermark advance past the data, equality is expected and
asserted). The upsert sink must converge to the same table as one big
batch MERGE regardless of micro-batch slicing.
"""

import os

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog import _events
from python_etl_rest_api_spark.streaming.joins import (
    attribution_join_batch,
    attribution_join_stream,
    upsert_sink,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events(spark, tmp_path_factory):
    """views → exposures dir, purchases → conversions dir (parquet)."""
    base = tmp_path_factory.mktemp("attrib")
    ev = _events(spark, SF_DIR)
    ex_path = str(base / "exposures")
    cv_path = str(base / "conversions")
    ev.filter(F.col("event_type") == "view").write.parquet(ex_path)
    ev.filter(F.col("event_type") == "purchase").write.parquet(cv_path)
    return ex_path, cv_path


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(path))


def test_interval_join_stream_matches_batch(spark, split_events, tmp_path):
    ex_path, cv_path = split_events
    out = str(tmp_path / "out")
    joined = attribution_join_stream(
        _read_stream(spark, ex_path), _read_stream(spark, cv_path))
    q = (joined.writeStream
         .option("checkpointLocation", out + "_chk")
         .outputMode("append").trigger(availableNow=True)
         .start(out, format="parquet"))
    q.awaitTermination(300)

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(tuple(r) for r in attribution_join_batch(
        spark.read.parquet(ex_path), spark.read.parquet(cv_path)).collect())
    assert want, "test data must produce at least one attribution pair"
    assert got == want


def test_interval_join_respects_band(spark, split_events):
    ex_path, cv_path = split_events
    rows = attribution_join_batch(
        spark.read.parquet(ex_path), spark.read.parquet(cv_path),
        band="30 minutes").collect()
    for r in rows:
        delta = (r.cv_ts - r.ex_ts).total_seconds()
        assert 0 <= delta <= 1800


def test_upsert_sink_last_batch_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [(k, "a") for k in range(1, 6)], "k int, v string")
    b2 = spark.createDataFrame(
        [(k, "b") for k in range(3, 8)], "k int, v string")
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")
    # one file per micro-batch, in mtime order: f1 then f2
    for i, d in enumerate(["f1", "f2"]):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (1000 + i, 1000 + i))
    files = [os.path.join(src, d, f)
             for d in ["f1", "f2"] for f in os.listdir(os.path.join(src, d))
             if f.endswith(".parquet")]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(files):
        dst = os.path.join(flat, f"part{i}.parquet")
        os.symlink(f, dst)
        os.utime(dst, (1000 + i, 1000 + i), follow_symlinks=False)

    schema = spark.read.parquet(flat).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(flat))
    table = str(tmp_path / "table")
    q = upsert_sink(stream, table, "k", str(tmp_path / "chk"))
    q.awaitTermination(300)

    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "a", 3: "b", 4: "b", 5: "b", 6: "b", 7: "b"}
