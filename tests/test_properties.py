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


# --- corpus-hygiene operator properties --------------------------------

_words = st.lists(
    st.integers(min_value=0, max_value=30).map(lambda i: f"w{i}"),
    min_size=1, max_size=80).map(" ".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_words, min_size=1, max_size=12, unique=True))
def test_repeated_span_dedup_properties(spark, texts):
    """Invariants of keep-first span dedup over arbitrary corpora:
    (1) the first document always survives intact;
    (2) kept spans never exceed total spans;
    (3) every surviving span text is a span of the original document
        (reconstruction never invents content);
    (4) total kept spans == number of DISTINCT span contents (keep-first
        keeps exactly one carrier per distinct span)."""
    from python_etl_rest_api_spark.operators.dedup import repeated_span_dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           repeated_span_dedup(docs, span_tokens=4).collect()}

    def spans(t):
        toks = t.split(" ")
        return [" ".join(toks[i:i + 4]) for i in range(0, len(toks), 4)]

    assert out[0]["text_dedup"] == texts[0]                      # (1)
    distinct_spans = set()
    for t in texts:
        distinct_spans.update(spans(t))
    total_kept = 0
    for i, t in enumerate(texts):
        if i not in out:
            continue
        r = out[i]
        assert r["n_spans_kept"] <= r["n_spans"]                 # (2)
        kept_words = r["text_dedup"].split(" ") if r["text_dedup"] else []
        assert set(kept_words) <= set(t.split(" "))              # (3)
        total_kept += r["n_spans_kept"]
    assert total_kept == len(distinct_spans)                     # (4)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_words, min_size=2, max_size=8, unique=True))
def test_containment_bounds_and_symmetry(spark, texts):
    """Containment values are in [0, 1]; every reported pair shares at
    least one shingle; a doc duplicated verbatim scores 1.0 both ways."""
    from python_etl_rest_api_spark.operators.dedup import containment_pairs

    rows = list(enumerate(texts)) + [(len(texts), texts[0])]  # verbatim dup
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = containment_pairs(docs, n=3, max_df=50, threshold=0.0).collect()
    for p in pairs:
        assert 0.0 <= p["containment_a_in_b"] <= 1.0
        assert 0.0 <= p["containment_b_in_a"] <= 1.0
    if len(texts[0].split(" ")) >= 3:
        dup = [p for p in pairs
               if p["id_a"] == 0 and p["id_b"] == len(texts)]
        assert len(dup) == 1
        assert dup[0]["containment_a_in_b"] == 1.0
        assert dup[0]["containment_b_in_a"] == 1.0


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.decimals(min_value="-99999999.99", max_value="99999999.99",
                places=2, allow_nan=False, allow_infinity=False),
    min_size=1, max_size=60))
def test_intmoney_floor_cents_equals_round(spark, decimals):
    """intmoney.cents = floor(x*100 + 0.5) must equal nearest-integer
    rounding (the oracle's round(x*100)) for EVERY 2-decimal money
    value, negative included - the exactness claim the hot-path form
    rests on (Spark's Round(double) is BigDecimal-backed per row, so
    cents uses floor; see functions/intmoney.py)."""
    from python_etl_rest_api_spark.functions.intmoney import cents

    values = [float(d) for d in decimals]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i long, amount double")
    got = {r.i: r.c for r in
           df.select("i", cents("amount").alias("c")).collect()}
    for i, d in enumerate(decimals):
        expect = int(d * 100)  # exact: d has 2 decimal places
        assert got[i] == expect, (str(d), got[i], expect)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet="ab x", min_size=0, max_size=40)),
    min_size=1, max_size=20))
def test_shingled_docs_ngram_matches_expression_form(spark, texts):
    """shingled_docs (Spark ML NGram closure) must produce exactly the
    shingle SETS of the expression form it replaced (_grams_from over
    tokens), including the edge cases: null text, empty text, docs
    shorter than n tokens, repeated-space token boundaries."""
    from python_etl_rest_api_spark.operators.dedup import (
        _grams_from, shingled_docs,
    )
    from python_etl_rest_api_spark.operators.text import tokens

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r.doc_id: sorted(r.shingles) for r in
           shingled_docs(docs, n=3).collect()}
    ref_rows = docs.select(
        "doc_id",
        _grams_from(tokens("text"), 3).alias("shingles")).collect()
    for r in ref_rows:
        expect = sorted(r.shingles) if r.shingles is not None else []
        assert got[r.doc_id] == expect, (texts[r.doc_id], got[r.doc_id],
                                         expect)
