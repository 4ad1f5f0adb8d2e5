"""Structured Streaming twins: the streaming transform over a bounded
source must agree with the batch transform on the same data."""

import os

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.streaming.windows import (
    run_stream_on_batch,
    session_agg_stream,
    sliding_agg_stream,
    tumbling_agg,
    tumbling_agg_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_tumbling_stream_matches_batch(spark, tmp_path):
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, EVENTS, tumbling_agg_stream, out)
    got = spark.read.parquet(out)
    batch = tumbling_agg(spark.read.parquet(EVENTS))
    g = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
         for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
         for r in batch.collect()}
    assert g == b


def test_sliding_stream_runs(spark, tmp_path):
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, EVENTS, sliding_agg_stream, out)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # every event lands in window/slide = 4 panes: total pane-events = 4x
    n_events = spark.read.parquet(EVENTS).count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == 4 * n_events


def test_session_stream_runs(spark, tmp_path):
    out = str(tmp_path / "out")
    run_stream_on_batch(spark, EVENTS, session_agg_stream, out)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # sessions per user: bounded by events per user
    per_user = {r["user_id"]: r["n"] for r in
                got.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()}
    src = {r["user_id"]: r["n"] for r in
           spark.read.parquet(EVENTS).groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_user == src
