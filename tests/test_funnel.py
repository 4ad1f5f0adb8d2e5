"""Ordered-funnel semantics on hand-built event sequences: stage events
BEFORE the previous stage's first occurrence must not count."""

from datetime import datetime

from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators.analytics import event_funnel


def _ts(minute):
    return datetime(2024, 1, 1, 12, minute)


def test_funnel_ordering_and_depth(spark):
    rows = [
        # u1 converts fully in order: view@0, click@5, purchase@9
        (1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(9), "purchase"),
        # u2: click BEFORE first view -> that click must not count; no
        # later click, so depth stays 1 even though a purchase follows
        (2, _ts(4), "click"), (2, _ts(6), "view"), (2, _ts(8), "purchase"),
        # u3: view then click, purchase BEFORE the click -> depth 2
        (3, _ts(0), "view"), (3, _ts(1), "purchase"), (3, _ts(2), "click"),
        # u4: never viewed -> not in the funnel at all
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
        # u5: two views, click between them -> click counts against the
        # FIRST view; second view is irrelevant
        (5, _ts(0), "view"), (5, _ts(3), "click"), (5, _ts(4), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r for r in event_funnel(df).collect()}

    assert set(got) == {1, 2, 3, 5}                  # u4 never entered
    assert got[1].reached_stage == 3
    assert got[2].reached_stage == 1 and got[2].click_us is None
    assert got[3].reached_stage == 2 and got[3].purchase_us is None
    assert got[5].reached_stage == 2
    # stage times are the FIRST valid occurrence, in microseconds
    assert got[1].click_us - got[1].view_us == 5 * 60 * 1_000_000
    assert got[5].view_us < got[5].click_us
