"""TPC-H-profile completion suite (catalog_tpch.py): value checks at
sf0.001 plus the plan-shape invariants that make each query shape safe
at 100 TB. Cross-engine value equality for all 14 entries is covered by
tools/check_oracle.py (driver gate); here we assert the structural
properties correctness checks can't see."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog_tpch import (
    q2_min_cost_supplier,
    q4_priority_count,
    q8_market_share,
    q11_important_parts,
    q13_order_distribution,
    q15_top_supplier,
    q16_part_supplier_counts,
    q17_small_qty_revenue,
    q19_disjunctive_revenue,
    q21_sole_blamed_supplier,
    q22_dormant_customers,
)
from python_etl_rest_api_spark.plans.explain import (
    has_pushed_filter,
    simple_plan,
    uses_broadcast_join,
)

SF = "/root/testdata/sf0.001"


def test_q4_semi_join_not_inner(spark):
    """EXISTS must not duplicate orders with several returned lines:
    the per-priority counts must sum to at most the order count."""
    rows = q4_priority_count(spark, SF).collect()
    n_orders = (spark.read.parquet(f"{SF}/orders.parquet")
                .filter((F.col("o_orderdate") >= "1996-07-01")
                        & (F.col("o_orderdate") < "1996-10-01")).count())
    assert sum(r.order_count for r in rows) <= n_orders
    plan = simple_plan(q4_priority_count(spark, SF))
    assert "LeftSemi" in plan or "left_semi" in plan


def test_q8_share_bounded(spark):
    for r in q8_market_share(spark, SF).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_q11_threshold_filters_to_subset(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    got = q11_important_parts(spark, SF).count()
    assert 0 < got < n_parts


def test_q13_keeps_zero_order_customers(spark):
    """The left join is the point of q13: the histogram must account
    for EVERY customer, including those with no qualifying orders."""
    rows = q13_order_distribution(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q15_returns_exactly_the_max(spark):
    rows = q15_top_supplier(spark, SF).collect()
    assert len(rows) >= 1
    assert len({round(r.total_revenue, 4) for r in rows}) == 1


def test_q16_anti_join_excludes_negative_balance(spark):
    plan = simple_plan(q16_part_supplier_counts(spark, SF))
    assert "LeftAnti" in plan or "left_anti" in plan


def test_q17_threshold_join_not_correlated_rescan(spark):
    """The per-part average must appear as ONE aggregate joined back,
    never a per-row subquery; and the result is a single row."""
    df = q17_small_qty_revenue(spark, SF)
    assert df.count() == 1
    plan = simple_plan(df)
    assert "CartesianProduct" not in plan


def test_q19_single_column_residues_pushed(spark):
    """Catalyst must derive per-scan supersets of the disjunction so
    parquet row-group stats can prune (brand IN / quantity bounds)."""
    df = q19_disjunctive_revenue(spark, SF)
    assert has_pushed_filter(df, "l_quantity") or \
        has_pushed_filter(df, "p_brand")


def test_q21_multi_supplier_sole_blame(spark):
    """Every reported supplier must come from an order with >1 supplier
    where exactly one supplier had returned lines — spot-check via
    recomputation at tiny scale."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    stats = (li.select("l_orderkey", "l_suppkey").distinct()
             .groupBy("l_orderkey")
             .agg(F.countDistinct("l_suppkey").alias("ns")))
    multi = {r.l_orderkey for r in
             stats.filter("ns > 1").collect()}
    assert multi, "fixture must contain multi-supplier orders"
    total = q21_sole_blamed_supplier(spark, SF) \
        .agg(F.sum("numwait")).collect()[0][0]
    assert total is None or total <= len(multi)


def test_q2_and_q22_scalar_subqueries_broadcast(spark):
    """The grand-total / cutoff scalars must ride a broadcast, never a
    shuffled join: a 1-row cross join is free, a shuffled one is not."""
    for fn in (q11_important_parts, q22_dormant_customers):
        assert uses_broadcast_join(fn(spark, SF))


def test_q2_min_is_per_part(spark):
    """Each reported (part, supplier) must carry that part's true
    minimum acctbal among its reported candidates."""
    rows = q2_min_cost_supplier(spark, SF).collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r.s_acctbal)
    for vals in by_part.values():
        assert len({round(v, 2) for v in vals}) == 1
