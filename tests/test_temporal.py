"""Temporal join operators (operators/temporal.py): as-of join semantics on
hand-built frames, band-join exactness vs a brute-force cross product, and
the HLL sketch's tolerance vs exact distinct counts."""

import datetime as dt

from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators import temporal

TS = dt.datetime


def test_asof_join_picks_most_recent_prior(spark):
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10, 0), "p1"),
         (1, TS(2024, 1, 1, 12, 0), "p2"),
         (2, TS(2024, 1, 1, 9, 0), "p3")],
        "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9, 30), 100, "click"),
         (1, TS(2024, 1, 1, 11, 0), 101, "view"),
         (1, TS(2024, 1, 1, 12, 30), 102, "late"),
         (3, TS(2024, 1, 1, 8, 0), 103, "other_user")],
        "user_id long, ts timestamp, event_id long, event_type string")
    out = temporal.asof_join(left, right, key="user_id", ts="ts",
                             right_cols=["event_id", "event_type"])
    rows = {r.tag: (r.r_event_id, r.r_event_type) for r in out.collect()}
    assert rows == {
        "p1": (100, "click"),   # 9:30 is the latest <= 10:00
        "p2": (101, "view"),    # 11:00, not the later 12:30
        "p3": (None, None),     # user 2 has no prior event
    }


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, TS(2024, 1, 1, 10, 0), "p")],
                                 "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, TS(2024, 1, 1, 10, 0), 7, "same")],
                                  "user_id long, ts timestamp, event_id long, event_type string")
    out = temporal.asof_join(left, right, key="user_id", ts="ts",
                             right_cols=["event_id"]).collect()
    assert out[0].r_event_id == 7  # ties count as "prior" (>= semantics)


def test_band_join_matches_bruteforce(spark, testdata):
    from python_etl_rest_api_spark.catalog import _events
    ev = _events(spark, "/root/testdata/sf0.001") \
        .filter(F.col("user_id") < 40).cache()
    got = temporal.time_band_pairs(ev, key="user_id", ts="ts",
                                   id_col="event_id", band_seconds=1800)
    a = ev.select(F.col("user_id").alias("u"), F.col("event_id").alias("id_a"),
                  F.unix_micros("ts").alias("us_a"))
    b = ev.select(F.col("user_id").alias("u"), F.col("event_id").alias("id_b"),
                  F.unix_micros("ts").alias("us_b"))
    brute = (a.join(b, "u")
             .filter((F.col("id_a") < F.col("id_b"))
                     & (F.abs(F.col("us_b") - F.col("us_a")) <= 1800 * 10**6)))
    got_pairs = {(r.id_a, r.id_b) for r in got.collect()}
    want_pairs = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got_pairs == want_pairs
    assert len(got_pairs) > 0


def test_approx_distinct_within_tolerance(spark):
    """The catalog entry emits exact_users plus an approx_ok verdict
    (HLL estimate within 5% of exact); assert both against an
    independent exact aggregation."""
    from python_etl_rest_api_spark.catalog_win import agg_approx_distinct
    rows = {r.event_type: r
            for r in agg_approx_distinct(spark, "/root/testdata/sf0.001").collect()}
    exact = {r.event_type: r.n
             for r in _events_exact(spark).collect()}
    assert set(rows) == set(exact)
    for k, n in exact.items():
        assert rows[k].exact_users == n, (k, rows[k].exact_users, n)
        assert rows[k].approx_ok == 1, (k, rows[k])


def _events_exact(spark):
    from python_etl_rest_api_spark.catalog import _events
    return (_events(spark, "/root/testdata/sf0.001")
            .groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n")))
