"""Hand-computed micro-fixtures for the round-4 corpus-hygiene /
warehouse entries (the oracle sweep checks them against DuckDB at
corpus scale; these pin the SEMANTICS on inputs small enough to verify
by eye - SURVEY §5's unit-test layer)."""

import datetime

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.registry import QUERIES


def test_systematic_pps_sampling_properties(spark, tmp_path):
    """Exactly K docs selected; selection is PPS: a doc heavier than
    the step size is ALWAYS selected; cumulative crossing is exact."""
    sf = str(tmp_path)
    n = 400
    # one giant doc (weight 50x the others) among uniform ones
    rows = [(i, "x", "en", "s", 5000 if i == 137 else 100)
            for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .coalesce(1).write.parquet(f"{tmp_path}/stage")
    import glob
    import shutil
    shutil.copy(glob.glob(f"{tmp_path}/stage/*.parquet")[0],
                f"{sf}/documents.parquet")
    got = QUERIES["sample_weighted_systematic"](spark, sf).collect()
    ids = {r["doc_id"] for r in got}
    assert 137 in ids                             # heavy doc always in
    total = (n - 1) * 100 + 5000
    step = total // 100
    # a unit heavier than the step absorbs multiple systematic hits but
    # is emitted once - so the row count is K minus the extra hits the
    # giant absorbed (classic PPS multiplicity)
    giant = next(r for r in got if r["doc_id"] == 137)
    mult = (giant["cum_weight"] // step
            - (giant["cum_weight"] - giant["weight"]) // step)
    assert mult > 1                               # it really straddles
    assert len(got) == 100 - (mult - 1)
    for r in got:
        # each selected doc's weight straddles a step boundary
        assert (r["cum_weight"] // step
                > (r["cum_weight"] - r["weight"]) // step)


def test_mad_outliers_hand_case(spark, tmp_path):
    """Median/MAD by explicit ranks on a 5-value series: values
    [1,2,3,4,100] -> med 3, |dev| [2,1,0,1,97] -> MAD 1; only 100 is
    beyond 3*MAD of the median."""
    import glob
    import shutil
    ts0 = datetime.datetime(2024, 1, 1)
    rows = [(i, ts0, 7, "view", float(v), "{}")
            for i, v in enumerate([1, 2, 3, 4, 100])]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string") \
        .coalesce(1).write.parquet(f"{tmp_path}/stage")
    shutil.copy(glob.glob(f"{tmp_path}/stage/*.parquet")[0],
                f"{tmp_path}/events.parquet")
    got = QUERIES["events_mad_outliers"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (5, 3.0, 1.0, 1)


def test_cdc_apply_semantics(spark):
    """I/U/D semantics on the derived feed: keys ending in 0 vanish,
    keys ending in 1 keep their row with price +10.00, keys ending in 2
    ALSO insert a key+1000000 twin, everything else passes through."""
    sf = "/root/testdata/sf0.001"
    base = spark.read.parquet(f"{sf}/orders.parquet")
    got = {r["key"]: r for r in QUERIES["cdc_apply_changes"](
        spark, sf).collect()}
    for row in base.limit(200).collect():
        k, price = row["o_orderkey"], row["o_totalprice"]
        if k % 10 == 0:
            assert k not in got                          # deleted
        elif k % 10 == 1:
            assert got[k]["totalprice"] == pytest.approx(price + 10.0)
        else:
            assert got[k]["totalprice"] == pytest.approx(price)
        if k % 10 == 2:
            assert k + 1000000 in got                    # inserted twin


def test_touch_matrix_hand_case(spark, tmp_path):
    """User journey view->click->purchase->view: first touch 'view',
    last touch before the FIRST purchase is 'click'; post-conversion
    events don't count."""
    import glob
    import shutil
    t = datetime.datetime(2024, 1, 1)

    def at(m):
        return t + datetime.timedelta(minutes=m)

    rows = [(1, at(0), 1, "view", 1.0, "{}"),
            (2, at(1), 1, "click", 1.0, "{}"),
            (3, at(2), 1, "purchase", 9.0, "{}"),
            (4, at(3), 1, "view", 1.0, "{}"),       # after conversion
            (5, at(0), 2, "error", 1.0, "{}")]      # never converts
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string") \
        .coalesce(1).write.parquet(f"{tmp_path}/stage")
    shutil.copy(glob.glob(f"{tmp_path}/stage/*.parquet")[0],
                f"{tmp_path}/events.parquet")
    got = QUERIES["events_touch_matrix"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["first_touch"], r["last_touch"], r["n_users"]) \
        == ("view", "click", 1)


def test_resample_gapfill_zero_rows(spark):
    """The dense grid really zero-fills: every (type, bucket) cell
    exists between the corpus min and max bucket, and cells with no
    events carry an explicit 0."""
    sf = "/root/testdata/sf0.001"
    got = QUERIES["events_resample_gapfill"](spark, sf)
    types = got.select("event_type").distinct().count()
    buckets = got.select("bucket_s").distinct().count()
    assert got.count() == types * buckets            # full grid
    assert got.filter(F.col("n_events") == 0).count() > 0
    lo, hi = got.agg(F.min("bucket_s"), F.max("bucket_s")).collect()[0]
    assert (hi - lo) % 900 == 0
    assert buckets == (hi - lo) // 900 + 1           # no holes in grid
