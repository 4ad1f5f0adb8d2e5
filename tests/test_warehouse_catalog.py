"""Warehouse-analytics catalog entries (catalog_warehouse.py): semantic
invariants at sf0.001 plus the plan-shape properties that make each
operator's 100 TB story true (pushdown on Q6, broadcast star on Q5,
single-exchange SCD2, covering-window WAU >= DAU).

Value-level correctness is covered by the DuckDB oracles
(tools/check_oracle.py, driver CORRECTNESS); these tests pin the
physical-plan and invariant properties the oracle cannot see.
"""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark import catalog_warehouse as cw
from python_etl_rest_api_spark.plans import explain

SF_DIR = "/root/testdata/sf0.001"


def test_q6_pushes_all_scan_predicates(spark):
    df = cw.q6_forecast_revenue(spark, SF_DIR)
    # every predicate is a plain comparison on a stored column: all three
    # must reach the parquet scan for row-group pruning
    assert explain.has_pushed_filter(df, "l_shipdate")
    assert explain.has_pushed_filter(df, "l_discount")
    assert explain.has_pushed_filter(df, "l_quantity")
    # and the scan must be pruned to the two aggregated columns + filters
    cols = explain.read_schema_columns(df)
    assert set(cols) <= {"l_extendedprice", "l_discount", "l_shipdate",
                         "l_quantity"}
    row = df.collect()[0]
    assert row.n_lines > 0 and row.revenue > 0


def test_q5_star_join_broadcasts_dims(spark):
    df = cw.q5_local_supplier_volume(spark, SF_DIR)
    plan = explain.physical_plan(df)
    # only region/nation carry broadcast HINTS (supplier/customer are
    # fact-scale at 100 TB and must stay AQE-sized), but at test scale
    # parquet size stats put every dim under the broadcast threshold —
    # the planner should still broadcast them all, with no cartesian
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 5  # at most the 5 nations of one region
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q10_topk_no_global_sort(spark):
    df = cw.q10_returned_value(spark, SF_DIR)
    assert "TakeOrderedAndProject" in explain.physical_plan(df)
    rows = df.collect()
    assert len(rows) <= 20
    assert all(r.lost_revenue > 0 for r in rows)


def test_q18_one_pass_over_lineitem(spark):
    """r10 reshape: the qualifying (orderkey, sq) aggregate feeds the
    joins directly - ONE lineitem scan, no semi-join, no re-aggregation
    of raw rows (the oracle keeps the two-pass SQL; equivalence is
    exact for any multiset - see the operator docstring)."""
    df = cw.q18_large_orders(spark, SF_DIR)
    plan = explain.physical_plan(df)
    assert plan.count("lineitem") == 1  # one scan
    assert "LeftSemi" not in plan       # aggregate joins directly
    for r in df.collect():
        assert r.sum_qty > 300


def test_scd2_versions_are_contiguous_intervals(spark):
    df = cw.scd2_status_history(spark, SF_DIR)
    # one (custkey) exchange serves the windows and the groupBy
    assert explain.shuffle_count(df) == 1
    rows = df.filter(F.col("custkey") < 50).collect()
    assert rows
    by_cust = {}
    for r in rows:
        assert r.valid_from <= r.valid_to
        by_cust.setdefault(r.custkey, []).append(r)
    for cust, vs in by_cust.items():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a.status != b.status  # islands merge equal neighbors
            assert a.valid_to <= b.valid_from


def test_cdc_classification_is_consistent(spark):
    rows = cw.cdc_snapshot_diff(spark, SF_DIR).collect()
    assert rows
    kinds = {r.change_type for r in rows}
    assert kinds == {"added", "removed", "changed"}
    for r in rows:
        if r.change_type == "added":
            assert r.old_status is None and r.new_status is not None
        elif r.change_type == "removed":
            assert r.new_status is None and r.old_status is not None
        else:
            assert r.old_status != r.new_status


def test_dau_wau_dominance(spark):
    rows = cw.events_dau_wau(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.wau >= r.dau > 0


def test_corr_pairs_bounded_and_deterministic(spark):
    df = cw.stats_corr_pairs(spark, SF_DIR)
    rows = {(r.x_col, r.y_col): r.r for r in df.collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert -1.0 <= r <= 1.0
    # decimal sufficient statistics => bit-identical r across re-runs
    # (a double-sum implementation would wobble with partition order)
    again = {(r.x_col, r.y_col): r.r for r in df.collect()}
    assert rows == again


def test_ann_recall_bounded(spark):
    rows = cw.ann_recall_at_k(spark, SF_DIR).collect()
    assert len(rows) == 3  # one per query vector
    for r in rows:
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert r.n_hits == pytest.approx(r.recall_at_10 * 10)


def test_source_mix_shares_sum_to_one(spark):
    rows = cw.docs_source_mix(spark, SF_DIR).collect()
    assert sum(r.token_share for r in rows) == pytest.approx(1.0)
    assert all(r.est_tokens > 0 for r in rows)


def test_dup_ratio_bounds(spark):
    rows = cw.dedup_ratio_by_source(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_ratio < 1.0
        assert r.n_dup_docs <= r.n_docs


def test_q7_directions_and_years(spark):
    # sf0.001 is too sparse for this specific nation pair; sf0.01 (the
    # oracle gate's scale) always has bilateral trade
    rows = cw.q7_volume_shipping(spark, "/root/testdata/sf0.01").collect()
    assert rows
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert dirs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.volume > 0 and 1995 <= r.l_year <= 2001 for r in rows)


def test_q14_share_bounded_and_part_broadcast(spark):
    df = cw.q14_promo_revenue_share(spark, SF_DIR)
    assert "BroadcastHashJoin" in explain.physical_plan(df)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.promo_share_pct <= 100.0
        assert len(r.ship_month) == 7  # yyyy-MM


def test_ntile_deciles_are_balanced_and_ordered(spark):
    rows = cw.ntile_customer_deciles(spark, SF_DIR).collect()
    n = len(rows)
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, []).append(r.total_spend)
    assert set(by_decile) == set(range(1, 11))
    sizes = [len(by_decile[d]) for d in range(1, 11)]
    assert max(sizes) - min(sizes) <= 1  # ntile balance property
    assert sum(sizes) == n
    # deciles respect the spend ordering: min of decile d >= max of d+1
    for d in range(1, 10):
        assert min(by_decile[d]) >= max(by_decile[d + 1])


def test_per_group_topn_caps_each_language(spark):
    rows = cw.sample_per_group_topn(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang and all(n <= 50 for n in by_lang.values())
    # deterministic across invocations (content-hash order, no rand())
    again = cw.sample_per_group_topn(spark, SF_DIR).collect()
    assert sorted((r.doc_id, r.lang) for r in rows) == \
        sorted((r.doc_id, r.lang) for r in again)


def test_skew_profile_shares(spark):
    rows = cw.skew_key_profile(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0.0 < r.row_share <= 1.0 for r in rows)
    assert sum(r.row_share for r in rows) <= 1.0 + 1e-9
