"""Insert-ignore / upsert / atomic-write semantics (SURVEY.md section 2.B)."""

import os

from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators.load import (
    atomic_overwrite,
    insert_ignore,
    upsert,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v string, _row_id long")


def test_insert_ignore_first_seen_wins(spark):
    batch = _df(spark, [("a", "v1", 1), ("a", "v2", 2), ("b", "v3", 3)])
    out = insert_ignore(None, batch, "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "v1", "b": "v3"}


def test_insert_ignore_existing_keys_kept(spark):
    existing = spark.createDataFrame([("a", "old")], "k string, v string")
    batch = _df(spark, [("a", "new", 1), ("c", "v9", 2)])
    out = insert_ignore(existing, batch, "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "old", "c": "v9"}


def test_upsert_last_writer_wins(spark):
    existing = spark.createDataFrame([("a", "old"), ("b", "keep")],
                                     "k string, v string")
    batch = _df(spark, [("a", "mid", 1), ("a", "new", 2), ("c", "ins", 3)])
    out = upsert(existing, batch, "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": "new", "b": "keep", "c": "ins"}


def test_upsert_idempotent_rerun(spark):
    existing = spark.createDataFrame([("a", "x")], "k string, v string")
    batch = _df(spark, [("a", "y", 1)])
    once = upsert(existing, batch, "k")
    twice = upsert(once, batch, "k")
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


def test_atomic_overwrite_swap(spark, tmp_path):
    path = str(tmp_path / "tbl")
    atomic_overwrite(spark.createDataFrame([(1,)], "x int"), path)
    assert spark.read.parquet(path).count() == 1
    atomic_overwrite(spark.createDataFrame([(1,), (2,)], "x int"), path)
    assert spark.read.parquet(path).count() == 2
    assert not os.path.exists(path + ".old")
    # FK check helper sanity: overwritten table readable via plain scan
    assert spark.read.parquet(path).agg(F.max("x")).collect()[0][0] == 2
