"""Structured Streaming twins: the streaming transform over a bounded
source must agree with the batch transform on the same data.

Append-mode caveat asserted here explicitly: windows/sessions that are not
yet below the final watermark are intentionally NOT emitted at end of
stream - so the streamed output is a strict subset of the batch result,
value-identical on every emitted key."""

import os

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog import _events
from python_etl_rest_api_spark.streaming.windows import (
    dedup_ingest_stream,
    run_stream_on_batch,
    session_agg_stream,
    sliding_agg_stream,
    trending_topk,
    trending_topk_stream,
    tumbling_agg,
    tumbling_agg_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
SF_DIR = "/root/testdata/sf0.001"


def test_tumbling_stream_matches_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, EVENTS, tumbling_agg_stream, out)
    got = spark.read.parquet(out)
    batch = tumbling_agg(_events(spark, SF_DIR))
    g = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
         for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
         for r in batch.collect()}
    assert len(g) > 0
    # every emitted window matches the batch result exactly
    for key, val in g.items():
        assert b[key] == val, key
    # only tail windows (within the 2h watermark of max event time) may be
    # withheld
    max_ts = _events(spark, SF_DIR).agg(F.max("ts")).collect()[0][0]
    withheld = set(b) - set(g)
    for (ws, _et) in withheld:
        assert (max_ts - ws).total_seconds() <= 3 * 3600, (ws, max_ts)


def test_sliding_stream_runs(spark, tmp_path):
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, EVENTS, sliding_agg_stream, out)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # every event lands in window/slide = 4 panes; emitted panes cover all
    # but the watermark tail
    n_events = _events(spark, SF_DIR).count()
    emitted = got.agg(F.sum("n_events")).collect()[0][0]
    assert emitted <= 4 * n_events
    assert emitted >= 3 * n_events   # tail loss bounded


def test_dedup_ingest_collapses_cross_batch_duplicates(spark, tmp_path):
    """The SAME file delivered twice (two files, maxFilesPerTrigger=1 ->
    two separate micro-batches) must yield each event exactly once:
    cross-batch dedup state, not per-batch distinct."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    for name in ("a.parquet", "b.parquet"):
        os.symlink(os.path.abspath(EVENTS), os.path.join(src, name))
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, src, dedup_ingest_stream, out)
    got = spark.read.parquet(out)
    n_src = _events(spark, SF_DIR).count()
    assert got.count() == n_src                      # not 2 * n_src
    assert got.select("event_id").distinct().count() == n_src


def test_session_stream_runs(spark, tmp_path):
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, EVENTS, session_agg_stream, out)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # emitted sessions never exceed the user's true event count
    per_user = {r["user_id"]: r["n"] for r in
                got.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()}
    src = {r["user_id"]: r["n"] for r in
           _events(spark, SF_DIR).groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_user.keys() <= src.keys()
    for u, n in per_user.items():
        assert n <= src[u]
    # most events are in closed sessions (watermark tail bounded)
    assert sum(per_user.values()) >= 0.8 * sum(src.values())


def test_trending_stream_matches_batch(spark, tmp_path):
    """Streamed windowed counts + per-window rank finalize must agree
    with the batch trending_topk on every closed (emitted) window."""
    from pyspark.sql import Window

    out = str(tmp_path / "trend")
    run_stream_on_batch(spark, EVENTS, trending_topk_stream, out)
    counts = spark.read.parquet(out)
    # the foreachBatch/sink-side finalize: rank over CLOSED windows
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type"))
    got = (counts.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= 3))
    batch = trending_topk(_events(spark, SF_DIR))
    g = {(r.window_start, r.rk): (r.event_type, r.n_events)
         for r in got.collect()}
    b = {(r.window_start, r.rk): (r.event_type, r.n_events)
         for r in batch.collect()}
    assert g, "stream must emit at least one closed window"
    for key, val in g.items():
        assert b[key] == val, key


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across a RESTART: run the ingest stream over batch 1,
    stop, deliver batch 2, start a NEW query on the SAME checkpoint.
    The file-source offsets and sink manifest in the checkpoint must
    prevent any reprocessing of batch 1 - total output is each event
    exactly once, across two separate query lifetimes."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    ev = _events(spark, SF_DIR)
    # split by TIME, not id: the checkpoint persists the watermark, so a
    # second batch older than it would be (correctly) dropped as late -
    # the restart scenario is "the next day's data arrives"
    split_ts = ev.selectExpr(
        "percentile(cast(ts as double), 0.5) as m").collect()[0]["m"]
    half1 = ev.filter(F.col("ts").cast("double") <= split_ts)
    half2 = ev.filter(F.col("ts").cast("double") > split_ts)
    n1, n2 = half1.count(), half2.count()

    half1.coalesce(1).write.parquet(str(tmp_path / "h1"))
    os.symlink(
        next(str(p) for p in (tmp_path / "h1").glob("*.parquet")),
        os.path.join(src, "a.parquet"))
    run_stream_on_batch(spark, src, dedup_ingest_stream, out)
    assert spark.read.parquet(out).count() == n1

    half2.coalesce(1).write.parquet(str(tmp_path / "h2"))
    os.symlink(
        next(str(p) for p in (tmp_path / "h2").glob("*.parquet")),
        os.path.join(src, "b.parquet"))
    run_stream_on_batch(spark, src, dedup_ingest_stream, out)

    got = spark.read.parquet(out)
    assert got.count() == n1 + n2                 # batch 1 NOT re-emitted
    assert got.select("event_id").distinct().count() == n1 + n2


def test_dq_monitor_stream_totals_match_batch(spark, tmp_path):
    """Per-micro-batch DQ logs must sum to the batch rules report: same
    stacked-aggregate semantics, sliced by delivery unit. Two files ->
    maxFilesPerTrigger=1 -> (at least) two logged batches."""
    from python_etl_rest_api_spark.streaming.quality import (
        dq_batch_report,
        dq_monitor_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = _events(spark, SF_DIR)
    for name, pred in (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1")):
        ev.filter(pred).coalesce(1).write.parquet(str(tmp_path / name))
        os.symlink(
            next(str(p) for p in (tmp_path / name).glob("*.parquet")),
            os.path.join(src, f"{name}.parquet"))
    out = str(tmp_path / "dq_log")
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dq_monitor_stream(stream, out)
         .option("checkpointLocation", out + "_chk")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    log = spark.read.parquet(out)
    assert log.select("batch_id").distinct().count() >= 2
    streamed = {r["rule"]: (r["v"], r["n"]) for r in
                log.groupBy("rule")
                .agg(F.sum("n_violations").alias("v"),
                     F.sum("n_rows").alias("n")).collect()}
    batch = {r["rule"]: (r["n_violations"], None) for r in
             dq_batch_report(ev).collect()}
    n_total = ev.count()
    assert streamed.keys() == batch.keys()
    for rule, (v, n) in streamed.items():
        assert v == batch[rule][0], rule
        assert n == n_total


def test_new_users_stream_matches_batch_firsts(spark, tmp_path):
    """The streaming new-user counter must agree with the batch
    first-seen computation on every emitted (closed) window, and its
    grand total never double-counts a user delivered in two batches."""
    from python_etl_rest_api_spark.streaming.windows import new_users_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    # the SAME file twice: every user redelivered in a second micro-batch
    for name in ("a.parquet", "b.parquet"):
        os.symlink(os.path.abspath(EVENTS), os.path.join(src, name))
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, src, new_users_stream, out)
    got = {r["window_start"]: r["new_users"]
           for r in spark.read.parquet(out).collect()}
    ev = _events(spark, SF_DIR)
    batch = {r["d"]: r["n"] for r in
             (ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
              .groupBy(F.date_trunc("day", "first_ts").alias("d"))
              .agg(F.count(F.lit(1)).alias("n")).collect())}
    assert got, "at least one closed window emitted"
    for w, n in got.items():
        assert batch[w] == n, w
    assert sum(got.values()) <= ev.select("user_id").distinct().count()
