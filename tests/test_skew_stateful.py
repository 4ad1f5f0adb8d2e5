"""Skew mitigation and arbitrary stateful streaming."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.functions.cleaning import money
from python_etl_rest_api_spark.operators.skew import salted_join, salted_sum

SF = "/root/testdata/sf0.001"


def test_salted_sum_exact(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    salted = salted_sum(orders, ["o_orderstatus"], money("o_totalprice"),
                        alias="total", buckets=16, count_alias="n")
    plain = (orders.groupBy("o_orderstatus")
             .agg(F.sum(money("o_totalprice")).alias("total"),
                  F.count(F.lit(1)).alias("n")))
    s = {r["o_orderstatus"]: (r["total"], r["n"]) for r in salted.collect()}
    p = {r["o_orderstatus"]: (r["total"], r["n"]) for r in plain.collect()}
    assert s == p


def test_salted_agg_spreads_hot_key(spark):
    """The property that makes salting win at scale: on a ~99%-hot key,
    the plain groupBy routes ~all rows through one reducer group, while
    stage 1 of the salted plan bounds every reducer group to roughly
    total/buckets. Measured on the catalog skew pair's derived key."""
    from python_etl_rest_api_spark.catalog_ext import _skewed_orders
    buckets = 16
    df = _skewed_orders(spark, SF).select("hot_key", "o_totalprice")
    total = df.count()
    # plain: rows per reducer group == rows per key -> hot key ~99%
    plain_max = (df.groupBy("hot_key").count()
                 .agg(F.max("count")).collect()[0][0])
    assert plain_max >= 0.9 * total
    # salted stage 1: rows per (key, salt) group
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(buckets))
    salted_max = (df.withColumn("_salt", salt)
                  .groupBy("hot_key", "_salt").count()
                  .agg(F.max("count")).collect()[0][0])
    assert salted_max <= total / buckets * 1.5, (plain_max, salted_max)
    # and the catalog pair agrees value-for-value
    from python_etl_rest_api_spark.catalog_ext import (
        skew_plain_agg, skew_salted_agg)
    p = {r["hot_key"]: (r["total"], r["n"])
         for r in skew_plain_agg(spark, SF).collect()}
    s = {r["hot_key"]: (r["total"], r["n"])
         for r in skew_salted_agg(spark, SF).collect()}
    assert p == s


def test_salted_join_same_rows(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey")
    cust = spark.read.parquet(f"{SF}/customer.parquet") \
        .select("c_custkey", "c_name")
    salted = salted_join(orders, cust, "c_custkey", buckets=4)
    plain = orders.join(cust, "c_custkey")
    assert salted.count() == plain.count()
    s = sorted((r["o_orderkey"], r["c_name"]) for r in salted.collect())
    p = sorted((r["o_orderkey"], r["c_name"]) for r in plain.collect())
    assert s == p


def test_first100_stateful_stream(spark, tmp_path):
    from python_etl_rest_api_spark.streaming.stateful import (
        first100_stream,
        requests_from_events,
    )
    from python_etl_rest_api_spark.streaming.windows import run_stream_on_batch
    out = str(tmp_path / "out")
    run_stream_on_batch(
        spark, f"{SF}/events.parquet",
        lambda ev: first100_stream(requests_from_events(ev)), out,
        output_mode="update")
    got = spark.read.parquet(out)
    rows = got.collect()
    assert len(rows) > 0
    # per user: accepted = distinct in-range numbers; rejected = the rest
    from python_etl_rest_api_spark.catalog import _events
    ev = _events(spark, SF)
    req = ev.select("user_id", (F.col("event_id") % 100 + 1).alias("number"))
    expect = {r["user_id"]: (r["n_distinct"], r["n_reqs"]) for r in
              req.groupBy("user_id")
              .agg(F.countDistinct("number").alias("n_distinct"),
                   F.count(F.lit(1)).alias("n_reqs")).collect()}
    # accumulate stream output per user (may span multiple batches)
    acc: dict = {}
    for r in rows:
        a, rej, tot = acc.get(r["user_id"], (0, 0, 0))
        acc[r["user_id"]] = (a + r["n_new"], rej + r["n_rejected"],
                             max(tot, r["n_total"]))
    assert acc.keys() == expect.keys()
    for u, (n_new, n_rej, n_tot) in acc.items():
        n_distinct, n_reqs = expect[u]
        assert n_new == n_distinct == n_tot, u
        assert n_new + n_rej == n_reqs, u
