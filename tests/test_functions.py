"""Unit + property tests for the lenient coercion helpers (the F1/F2/F4/F5
edge cases SURVEY.md section 5 calls out)."""

import datetime

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.functions.cleaning import (
    decimal_guard,
    lenient_amount,
    lenient_timestamp,
    normalize_str,
    reason_codes,
    sentinel_to_null,
)


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("out")).collect()[0]["out"]


@pytest.mark.parametrize("raw,expected", [
    ("100.50", 100.50),
    ("3.0", 3.0),
    ("3.0e34", None),                 # > DECIMAL(16,2) max -> guard null
    ("3.0e213231213123", None),       # overflows double to inf -> null
    ("21321323123121133.0", None),    # > max -> null
    ("abc", None),                    # unparseable -> null
    ("", None),
    (None, None),
    ("-5.25", -5.25),
    ("99999999999999.99", 99999999999999.99),   # exactly max survives
    ("100000000000000.00", None),               # just over -> null
])
def test_lenient_amount(spark, raw, expected):
    got = _one(spark, lenient_amount(F.col("v")), raw)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


@pytest.mark.parametrize("raw,expected", [
    ("2019-03-19", datetime.datetime(2019, 3, 19)),
    ("20190516", datetime.datetime(2019, 5, 16)),  # the undashed anomaly
    ("2019-03-19 10:30:00", datetime.datetime(2019, 3, 19, 10, 30)),
    ("2019/05/16", datetime.datetime(2019, 5, 16)),
    ("garbage", None),
    ("", None),
    (None, None),
])
def test_lenient_timestamp(spark, raw, expected):
    got = _one(spark, lenient_timestamp(F.col("v")), raw)
    assert got == expected


def test_normalize_and_sentinels(spark):
    assert _one(spark, normalize_str(F.col("v")), "  MiXeD Case ") == "mixed case"
    assert _one(spark, sentinel_to_null(F.col("v")), "nan") is None
    assert _one(spark, sentinel_to_null(F.col("v")), "<NA>") is None
    assert _one(spark, sentinel_to_null(F.col("v")), "ok") == "ok"


def test_decimal_guard_boundary(spark):
    df = spark.createDataFrame([(99999999999999.99,), (-99999999999999.99,),
                                (100000000000000.0,), (5.0,)], "v double")
    got = [r["out"] for r in df.select(
        decimal_guard(F.col("v")).alias("out")).collect()]
    assert got == [99999999999999.99, -99999999999999.99, None, 5.0]


def test_reason_codes_order_and_empty(spark):
    df = spark.createDataFrame([(1,)], "x int")
    col = reason_codes([
        (F.lit(True), "a"), (F.lit(False), "b"), (F.lit(True), "c")])
    assert df.select(col.alias("r")).collect()[0]["r"] == "a|c"
    col_none = reason_codes([(F.lit(False), "a")])
    assert df.select(col_none.alias("r")).collect()[0]["r"] == ""


def test_property_roundtrip_amounts(spark):
    """Any 2-decimal string within range must survive exactly."""
    vals = [f"{s}{i}.{d:02d}" for i in (0, 1, 7, 123456, 10**13 - 1)
            for d in (0, 5, 99) for s in ("", "-")]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = df.select(F.col("v"), lenient_amount(F.col("v")).alias("out")).collect()
    for r in got:
        assert r["out"] == pytest.approx(float(r["v"])), r["v"]
