"""Property-based tests (hypothesis) for the lenient coercion functions -
the SURVEY F1 flag ("pandas .round is banker's rounding on float; flag for
property tests"). Strategy: hypothesis generates batches of adversarial
strings, ONE Spark job evaluates the whole batch, and a Python reference
model checks every row. Values are constrained to <= 2 decimal places
(the dataset contract) so no rounding-mode divergence is possible; the
interesting properties are totality (never throws), null-on-garbage, the
inf/nan guards, and the DECIMAL(16,2) range guard."""

import math
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from python_etl_rest_api_spark.functions.cleaning import (
    lenient_amount,
    lenient_timestamp,
)
from python_etl_rest_api_spark.schemas import DECIMAL_16_2_MAX

# --- value strategies -------------------------------------------------

# decimal-2 numbers across the guard boundary, incl. negative and huge
_amount_numbers = st.integers(
    min_value=-10_000_000_000_000_000_99,
    max_value=10_000_000_000_000_000_99,
).map(lambda cents: f"{cents / 100:.2f}")

_amount_garbage = st.sampled_from(
    ["abc", "", " ", "12abc", "1.2.3", "--5", "nan", "NaN", "inf", "-inf",
     "Infinity", "3.0e34", "3.0e213231213123", "1e400", "0x10", "1,5"])

_amount_inputs = st.one_of(
    _amount_numbers,
    _amount_garbage,
    st.none(),
    _amount_numbers.map(lambda s: f"  {s}  "),   # whitespace-padded
)

_ts_values = st.datetimes(
    min_value=datetime(1971, 1, 2), max_value=datetime(2037, 12, 31))

_ts_inputs = st.one_of(
    _ts_values.map(lambda d: d.strftime("%Y-%m-%d")),
    _ts_values.map(lambda d: d.strftime("%Y%m%d")),
    _ts_values.map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")),
    st.sampled_from(["", " ", "garbage", "2019-13-45", "99999999",
                     "2019/03/16", "16-03-2019", None]),
)


# --- Python reference models (the reference's pandas semantics) -------

def _model_amount(s):
    if s is None:
        return None
    try:
        x = float(s.strip())
    except ValueError:
        return None
    if math.isnan(x) or math.isinf(x):
        return None
    r = round(x, 2)  # inputs are exact-2dp: no rounding-mode ambiguity
    if abs(r) > DECIMAL_16_2_MAX:
        return None
    return r


def _model_timestamp(s):
    if s is None:
        return None
    s = s.strip()
    if s == "":
        return None
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y%m%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


# --- properties -------------------------------------------------------

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_amount_inputs, min_size=1, max_size=60))
def test_lenient_amount_matches_reference_model(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i long, amount string")
    got = {r.i: r.out for r in
           df.select("i", lenient_amount("amount").alias("out")).collect()}
    for i, v in enumerate(values):
        expect = _model_amount(v)
        if expect is None:
            assert got[i] is None, (v, got[i])
        else:
            assert got[i] == pytest.approx(expect), (v, got[i])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_ts_inputs, min_size=1, max_size=60))
def test_lenient_timestamp_matches_reference_model(spark, values):
    fmts = ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "yyyyMMdd")
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i long, ts string")
    got = {r.i: r.out for r in
           df.select("i", lenient_timestamp("ts", fmts).alias("out")).collect()}
    for i, v in enumerate(values):
        expect = _model_timestamp(v)
        actual = got[i]
        if actual is not None and actual.tzinfo is not None:
            # session tz is UTC; compare wall-clock values
            actual = actual.astimezone(timezone.utc).replace(tzinfo=None)
        assert actual == expect, (v, actual, expect)
