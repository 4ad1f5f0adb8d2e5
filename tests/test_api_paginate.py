"""API response bounding: /view/daily_company_totals pages via
api.app.paginate, so an unbounded view can never become one giant JSON
response (round-2 advice). fastapi isn't in the container, so the helper
is tested directly -- the endpoint is a thin wrapper over it."""

from pyspark.sql import functions as F

from python_etl_rest_api_spark.api.app import MAX_PAGE, paginate


def _view(spark, n=50):
    return spark.range(n).select(
        F.concat(F.lit("co_"), F.format_string("%03d", "id")).alias("company"),
        F.lit("2024-01-01").cast("date").alias("transaction_date"),
        (F.col("id") * 10.0).alias("total_amount"))


def test_page_is_capped(spark):
    rows, limit, offset = paginate(_view(spark), limit=10, offset=0)
    assert len(rows) == 10 and limit == 10 and offset == 0


def test_limit_clamped_to_max_page(spark):
    _, limit, _ = paginate(_view(spark), limit=10**9, offset=0)
    assert limit == MAX_PAGE


def test_bad_inputs_clamped(spark):
    rows, limit, offset = paginate(_view(spark), limit=-5, offset=-3)
    assert limit == 1 and offset == 0 and len(rows) == 1


def test_pages_are_stable_and_disjoint(spark):
    v = _view(spark)
    p1, _, _ = paginate(v, limit=20, offset=0)
    p2, _, _ = paginate(v, limit=20, offset=20)
    names1 = [r.company for r in p1]
    names2 = [r.company for r in p2]
    assert names1 == sorted(names1)
    assert not set(names1) & set(names2)
    assert names1[0] == "co_000" and names2[0] == "co_020"


def test_offset_past_end_is_empty(spark):
    rows, _, _ = paginate(_view(spark, n=5), limit=10, offset=100)
    assert rows == []


def test_keyset_equals_offset_full_walk(spark):
    """Round-3 advice: keyset cursor pages must reproduce the offset walk
    exactly - same rows, same order, no overlap - at O(limit) per page."""
    v = _view(spark, n=47)
    by_offset = []
    for off in range(0, 60, 10):
        page, _, _ = paginate(v, limit=10, offset=off)
        by_offset.extend(page)

    # first page = no cursor (plain first-10), then cursor from each tail
    by_keyset, cursor = [], None
    while True:
        page, _, _ = paginate(v, limit=10, after=cursor)
        if not page:
            break
        by_keyset.extend(page)
        cursor = tuple(page[-1])
    assert [tuple(r) for r in by_keyset] == [tuple(r) for r in by_offset]
    assert len(by_keyset) == 47


def test_keyset_page_starts_strictly_after_cursor(spark):
    v = _view(spark, n=30)
    page, _, _ = paginate(
        v, limit=5, after=("co_009", "2024-01-01", 90.0))
    assert [r.company for r in page] == [f"co_{i:03d}" for i in range(10, 15)]


def test_keyset_rejects_prefix_cursor(spark):
    """A cursor narrower than the sort tuple can skip ties; it must be
    rejected (the endpoint turns this into a 400), never silently paged."""
    import pytest
    with pytest.raises(ValueError, match="all 3 sort columns"):
        paginate(_view(spark), limit=5, after=("co_009", "2024-01-01"))


def test_offset_beyond_max_rejected(spark):
    import pytest
    from python_etl_rest_api_spark.api.app import MAX_OFFSET
    with pytest.raises(ValueError, match="keyset"):
        paginate(_view(spark), limit=5, offset=MAX_OFFSET + 1)


def test_keyset_no_skip_or_dup_with_duplicate_leading_pairs(spark):
    """Round-6 verdict directive: the old cursor keyed on the leading TWO
    columns and skipped ties when they weren't a unique key. Build a view
    where every (company, transaction_date) pair appears 3x with distinct
    amounts, keyset-walk it, and prove the union of pages is EXACTLY the
    view - nothing skipped, nothing repeated - and matches the offset walk."""
    v = spark.range(60).select(
        F.concat(F.lit("co_"), F.format_string("%02d", F.col("id") % 10))
        .alias("company"),
        F.lit("2024-01-01").cast("date").alias("transaction_date"),
        (F.col("id") * 1.5).alias("total_amount"))
    expected = sorted(tuple(r) for r in v.collect())

    pages, cursor = [], None
    n_pages = 0
    while True:
        page, _, _ = paginate(v, limit=7, after=cursor)
        if not page:
            break
        n_pages += 1
        assert n_pages <= 10, "cursor failed to advance"
        pages.extend(page)
        # JSON-style cursor: stringified values, as the endpoint emits
        cursor = tuple(str(c) for c in page[-1])
    got = [tuple(r) for r in pages]
    assert got == expected          # total order, no skip, no dup
    assert len(got) == 60


def test_catalog_entries_page_like_the_endpoint(spark):
    """/catalog/{name} is paginate() over a registry entry; drive the
    same composition directly (fastapi absent in this container): a
    multi-row catalog result pages without overlap and in total order,
    and the index docstrings the endpoint serves are present."""
    from python_etl_rest_api_spark import registry

    df = registry.QUERIES["h3_count_per_group"](
        spark, "/root/testdata/sf0.001")
    p1, _, _ = paginate(df, limit=7, offset=0)
    p2, _, _ = paginate(df, limit=7, offset=7)
    assert len(p1) == 7 and len(p2) == 7
    assert {tuple(r) for r in p1}.isdisjoint({tuple(r) for r in p2})
    ordered = sorted([tuple(r) for r in p1] + [tuple(r) for r in p2])
    assert ordered == [tuple(r) for r in p1] + [tuple(r) for r in p2]

    # the /catalog index serves first docstring lines for every entry
    for name, fn in registry.QUERIES.items():
        assert (fn.__doc__ or "").strip(), f"{name} has no docstring"


def test_keyset_walk_equals_sort_on_null_bearing_view(spark):
    """The strictly-after predicate must replicate Spark's ASC NULLS
    FIRST total order exactly, including cursors whose cells are NULL.
    Deterministic pseudo-random view with nulls in every column; the
    keyset walk must reproduce the full sorted view with no skip/dup."""
    v = spark.range(90).select(
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 5).cast("string")))
        .alias("grp"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 3).cast("int")).alias("bucket"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise((F.col("id") * 7 % 19).cast("long")).alias("val"))

    # Python mirror of Spark's ASC NULLS FIRST total order
    expected = sorted([tuple(r) for r in v.collect()],
                      key=lambda t: ((t[0] is not None, t[0] or ""),
                                     (t[1] is not None, t[1] or 0),
                                     (t[2] is not None, t[2] or 0)))
    pages, cursor, n = [], None, 0
    while True:
        page, _, _ = paginate(v, limit=13, after=cursor)
        if not page:
            break
        n += 1
        assert n <= 10
        pages.extend(tuple(r) for r in page)
        cursor = tuple(page[-1])
    assert pages == expected
    assert len(pages) == 90


# --- r8 advice: cursor validation + universal ``next`` -----------------


def test_parse_cursor_round_trips_a_page_tail(spark):
    from python_etl_rest_api_spark.api.app import next_cursor, parse_cursor
    import json

    v = _view(spark, n=25)
    p1, limit, _ = paginate(v, limit=10, offset=0)
    nxt = next_cursor(v.columns, p1, limit)
    assert nxt is not None
    cursor = parse_cursor(v, json.dumps(nxt))
    p2, _, _ = paginate(v, limit=10, after=cursor)
    assert [r.company for r in p2][0] == "co_010"


def test_next_emitted_for_offset_pages_too(spark):
    """Advice r7: an offset client must get a server-built cursor on
    every FULL page so it can switch to keyset before MAX_OFFSET."""
    from python_etl_rest_api_spark.api.app import next_cursor

    v = _view(spark, n=25)
    full, limit, _ = paginate(v, limit=10, offset=10)   # offset style
    assert next_cursor(v.columns, full, limit) is not None
    short, limit, _ = paginate(v, limit=10, offset=20)  # 5 rows left
    assert next_cursor(v.columns, short, limit) is None


def test_parse_cursor_rejects_bad_shapes(spark):
    import pytest

    from python_etl_rest_api_spark.api.app import parse_cursor

    v = _view(spark)  # 3 columns
    with pytest.raises(ValueError, match="JSON list"):
        parse_cursor(v, "not json {")
    with pytest.raises(ValueError, match="JSON list"):
        parse_cursor(v, '{"a": 1}')
    with pytest.raises(ValueError, match="all 3 columns"):
        parse_cursor(v, '["co_001", "2024-01-01"]')      # prefix cursor
    with pytest.raises(ValueError, match="scalars or null"):
        parse_cursor(v, '["co_001", ["2024-01-01"], 10.0]')
    with pytest.raises(ValueError, match="scalars or null"):
        parse_cursor(v, '["co_001", {"d": 1}, 10.0]')


def test_parse_cursor_rejects_uncastable_cells(spark):
    """A castable-but-garbage string casts to NULL and would silently
    return empty pages forever; the probe turns it into a 400."""
    import pytest

    from python_etl_rest_api_spark.api.app import parse_cursor

    v = _view(spark)
    with pytest.raises(ValueError, match="transaction_date"):
        parse_cursor(v, '["co_001", "not-a-date", 10.0]')
    with pytest.raises(ValueError, match="cast to NULL"):
        parse_cursor(v, '["co_001", "2024-01-01", "ten"]')
    # null cells and in-format strings are fine
    got = parse_cursor(v, '[null, "2024-01-01", "10.0"]')
    assert got == (None, "2024-01-01", "10.0")

def test_parse_cursor_rejects_out_of_int64_cells(spark):
    """JSON ints are arbitrary-precision; a cell outside int64 used to
    reach F.lit, raise Py4JError (NumberFormatException, not
    AnalysisException) and escape the ValueError->400 mapping as an
    unhandled 500. Now it is a clean 400 before any lit is built."""
    import pytest

    from python_etl_rest_api_spark.api.app import parse_cursor

    v = _view(spark)
    with pytest.raises(ValueError, match="64-bit"):
        parse_cursor(v, '["co_001", "2024-01-01", '
                        '99999999999999999999999999]')
    with pytest.raises(ValueError, match="64-bit"):
        parse_cursor(v, f'["co_001", "2024-01-01", {-(2 ** 63) - 1}]')
    # int64 boundary values themselves must still reach the cast probe
    # (amount is double: 2**63-1 casts fine)
    got = parse_cursor(v, f'["co_001", "2024-01-01", {2 ** 63 - 1}]')
    assert got[2] == 2 ** 63 - 1


def test_parse_cursor_probe_runs_no_spark_job(spark):
    """The cast probe reads constant-folded literals off the optimized
    plan — per-request paging validation must not enqueue a job on the
    shared session (throughput tax under concurrent clients)."""
    from python_etl_rest_api_spark.api.app import parse_cursor

    v = _view(spark)
    v.count()  # materialize the view's own lazy bits first
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    parse_cursor(v, '["co_001", "2024-01-01", 10.0]')
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "cast probe scheduled a Spark job"
