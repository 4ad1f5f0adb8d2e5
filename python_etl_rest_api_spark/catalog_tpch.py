"""Round-4 completion of the TPC-H-profile suite: the 14 query shapes
not yet in the catalog (q2, q4, q8, q9, q11, q12, q13, q15, q16, q17,
q19, q20, q21, q22), adapted to the testdata's columns (no partsupp /
l_commitdate / l_shipmode / p_container / c_phone — each entry's
docstring names the stand-in it uses for the missing column while
preserving the ORIGINAL query's plan shape: correlated min (q2),
exists semi-join (q4), market-share conditional ratio (q8), per-group
scalar threshold (q11/q17), left-join histogram (q13), argmax-on-
aggregate (q15), NOT-IN anti-join (q16), disjunctive join predicate
(q19), exists/not-exists double correlation (q21), scalar-subquery +
anti-join (q22)).

The reference (a 313-line pandas/FastAPI technical test) has no
warehouse query surface; these extend SURVEY.md §2 H/I families with
the standard analytic join/agg shapes, following the repo's
cross-engine exactness recipe (catalog.py header): DECIMAL money sums,
integer-valued-double quantity sums (exact at any fold order), one
double division at the output boundary, identical expression trees on
both engines.

Scale posture (the repeated pattern, argued once here): only region /
nation are force-broadcast (25 rows at ANY scale factor); every other
join stays declarative so AQE broadcasts what it measures small at
test scale but shuffles co-partitioned at 100 TB; selective filters
are applied on the stored columns BEFORE joins so they reach
PushedFilters; per-group thresholds (q2/q11/q15/q17/q20/q21) are
computed as self-aggregates and equi-joined back — never a driver
collect, never a correlated per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import _t, query
from .functions import intmoney
from .session import broadcast_factscale

# Shared money expressions (identical trees to catalog_warehouse.py).
# Functions, not module constants: Column construction needs a live
# SparkContext in classic mode, and the registry imports this module
# before any session exists.
def _price():
    return F.col("l_extendedprice").cast("decimal(18,2)")


def _rev():
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (_price() * (F.lit(1) - disc)).cast("decimal(18,4)")


def _qty():
    return F.col("l_quantity").cast("decimal(18,2)")

_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(4,2)))")
# integer 1e-4-unit revenue (functions.intmoney) - the r10 hot-path form
_REVU_SQL = intmoney.REV_UNITS_SQL


def _nation_region(spark, sf_dir, region: str):
    """nation keys restricted to one region — a ≤25-row broadcast dim."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey) \
            .select("n_nationkey", "n_name")


# ---------------------------------------------------------------------
# q2 — minimum-cost supplier (correlated-min shape)
# ---------------------------------------------------------------------

@query("q2_min_cost_supplier", """
    WITH ships AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eur AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'),
    cand AS (
      SELECT p.p_partkey, p.p_name, e.s_suppkey, e.s_acctbal,
             e.s_name, e.n_name
      FROM ships sh
      JOIN eur e ON sh.l_suppkey = e.s_suppkey
      JOIN part p ON sh.l_partkey = p.p_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 25)
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_name
    FROM cand c
    JOIN (SELECT p_partkey, MIN(s_acctbal) AS mb
          FROM cand GROUP BY p_partkey) m
      ON c.p_partkey = m.p_partkey AND c.s_acctbal = m.mb
    ORDER BY c.s_acctbal, c.n_name, c.s_name, c.p_partkey LIMIT 100
""")
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2-shaped minimum-cost supplier: for each LARGE small-size
    part (size band <=25), the EUROPE supplier with the lowest account balance among
    suppliers that actually shipped it (s_acctbal stands in for the
    missing ps_supplycost; shipped-distinct for the missing partsupp).
    The original's correlated MIN subquery becomes a self-aggregate
    equi-joined back on (partkey, min) — one shuffle on p_partkey that
    AQE reuses for both the aggregate and the re-join; the double
    equality is exact because both sides carry the same stored parquet
    value. part is filtered before the join so p_type/p_size reach
    PushedFilters."""
    ships = (_t(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    sup = _t(spark, sf_dir, "supplier")
    eur = (sup.join(F.broadcast(_nation_region(spark, sf_dir, "EUROPE")),
                    sup.s_nationkey == F.col("n_nationkey"))
           .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 25))
         .select("p_partkey", "p_name"))
    cand = (ships.join(eur, ships.l_suppkey == eur.s_suppkey)
            .join(p, ships.l_partkey == p.p_partkey)
            .select("p_partkey", "p_name", "s_acctbal", "s_name", "n_name"))
    mins = cand.groupBy("p_partkey").agg(F.min("s_acctbal").alias("mb")) \
               .withColumnRenamed("p_partkey", "mk")
    return (cand.join(mins, (cand.p_partkey == mins.mk)
                      & (cand.s_acctbal == mins.mb))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
            .orderBy("s_acctbal", "n_name", "s_name", "p_partkey")
            .limit(100))


# ---------------------------------------------------------------------
# q4 — order-priority checking (EXISTS semi-join shape)
# ---------------------------------------------------------------------

@query("q4_priority_count", """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def q4_priority_count(spark, sf_dir):
    """TPC-H-Q4-shaped order-priority check: orders in one quarter with
    at least one returned line (l_returnflag='R' stands in for the
    missing commitdate<receiptdate late-line predicate). The EXISTS is
    a left-semi join against the R-filtered lineitem keys — returnflag
    is pushed to the lineitem scan, the quarter window to the orders
    scan, and the semi-join shuffles only orderkeys, never payloads.
    The 5-row result groups on the already-semi-joined orders."""
    o = (_t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate") >= "1996-07-01 00:00:00")
                 & (F.col("o_orderdate") < "1996-10-01 00:00:00"))
         .select("o_orderkey", "o_orderpriority"))
    ret = (_t(spark, sf_dir, "lineitem")
           .filter(F.col("l_returnflag") == "R")
           .select("l_orderkey"))
    return (o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


# ---------------------------------------------------------------------
# q8 — national market share (conditional ratio over a star join)
# ---------------------------------------------------------------------

@query("q8_market_share", """
    WITH all_nations AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             {rev} AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region cr  ON cn.n_regionkey = cr.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE cr.r_name = 'AMERICA' AND p.p_type = 'ECONOMY')
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                              THEN volume ELSE 0 END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM all_nations GROUP BY o_year ORDER BY o_year
""".format(rev=_REVU_SQL))
def q8_market_share(spark, sf_dir):
    """TPC-H-Q8-shaped national market share: NATION_1's share of the
    AMERICA market for ECONOMY parts, by order year. Both sums run in
    DECIMAL (order-independent) and the single double division happens
    at the output boundary, so the ratio is bit-identical across
    engines. part/p_type and region are filtered pre-join; nation and
    region are the only forced broadcasts; supplier/customer/part
    joins stay declarative for AQE."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey",
        "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = _nation_region(spark, sf_dir, "AMERICA") \
        .withColumnRenamed("n_nationkey", "cn_key").drop("n_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    df = (li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
          .join(s, li.l_suppkey == s.s_suppkey)
          .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
          .join(p, li.l_partkey == p.p_partkey)
          .select(F.year("o_orderdate").alias("o_year"),
                  intmoney.rev_units().alias("volume"), "supp_nation"))
    # exact 1e-4 units; the units cancel in the ratio. Per-year groups
    # are unbounded -> limb-pair sums on both legs.
    df = df.withColumn(
        "nat_vol", F.when(F.col("supp_nation") == "NATION_1",
                          F.col("volume")).otherwise(F.lit(0).cast("long")))
    return (df.groupBy("o_year")
            .agg((intmoney.limb_sum_exact("nat_vol").cast("double")
                  / intmoney.limb_sum_exact("volume").cast("double"))
                 .alias("mkt_share"),
                 F.count(F.lit(1)).alias("n_lines"))
            .orderBy("o_year"))


# ---------------------------------------------------------------------
# q9 — product-type profit (LIKE filter + two-dim rollup)
# ---------------------------------------------------------------------

@query("q9_product_profit", """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({rev}) AS DOUBLE) / 10000.0 AS profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, o_year
    ORDER BY nation, o_year DESC
""".format(rev=_REVU_SQL))
def q9_product_profit(spark, sf_dir):
    """TPC-H-Q9-shaped product profit: discounted revenue (the missing
    ps_supplycost term is dropped — no partsupp table) for parts named
    like '%gear%', by supplier nation and order year.

    Join order is the whole game here: the '%gear%' LIKE keeps ~1/8 of
    part (254k keys at the 100x corpus — a ~2 MB single-int broadcast),
    so lineitem is pruned 60M -> 7.6M rows by BROADCAST joins against
    filtered part + supplier + nation BEFORE the orders join. Only the
    pruned (l_orderkey, rev_u, nation) triple reaches the one shuffle
    join (vs the r11 form, which shuffle-joined the FULL 60M-row
    lineitem against orders first and pruned after: measured 4.34 ->
    2.69 s at 100x, value-identical on all 175 rows). Catalyst does not
    reorder joins without CBO stats, so the pruning order is explicit.
    One shuffle for li<->orders, one for the (nation, year) rollup.
    The part/supplier broadcasts are FACT-SCALE and route through
    session.broadcast_factscale (droppable per deployment via
    SPARK_GRAFT_NO_FACTSCALE_BROADCAST=1 — ADVICE r13 #1); nation's
    stays unconditional (<= 25 rows at any scale)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey",
        intmoney.rev_units().alias("rev_u"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%gear%")).select("p_partkey"))
    # profit in exact 1e-4 units projected before the join chain;
    # (nation, year) groups are unbounded -> limb-pair sums
    return (li.join(broadcast_factscale(p), li.l_partkey == p.p_partkey)
            .join(broadcast_factscale(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("l_orderkey", "rev_u", "nation")
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg(intmoney.limb_sum_double("rev_u", 10000.0)
                 .alias("profit"))
            .orderBy(F.col("nation"), F.col("o_year").desc()))


# ---------------------------------------------------------------------
# q11 — important parts (group HAVING sum > fraction * grand total)
# ---------------------------------------------------------------------

@query("q11_important_parts", """
    WITH pv AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey)
    SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS value
    FROM pv
    WHERE CAST(value AS DOUBLE) >
          1.5 * (SELECT CAST(SUM(value) AS DOUBLE) / COUNT(*) FROM pv)
    ORDER BY value DESC, partkey
""")
def q11_important_parts(spark, sf_dir):
    """TPC-H-Q11-shaped important stock: parts whose shipped value from
    EUROPE suppliers exceeds 1.5x the average per-part value (the
    original's 0.0001/SF fraction-of-total is scale-dependent by
    design; a multiple-of-average keeps the result set non-degenerate
    at every test scale factor)
    (lineitem extendedprice stands in for the missing partsupp
    supplycost*availqty). The scalar subquery is a 1-row broadcast
    cross-join — the per-part aggregate is computed ONCE and reused
    for both the numerator rows and the grand total (same shuffle),
    never re-scanned. Both sides sum in DECIMAL and compare in double
    with the identical 0.002 literal."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sup = (s.join(F.broadcast(_nation_region(spark, sf_dir, "EUROPE")),
                  s.s_nationkey == F.col("n_nationkey"))
           .select("s_suppkey"))
    pv = (li.join(sup, li.l_suppkey == sup.s_suppkey)
          .groupBy("l_partkey")
          .agg(F.sum(_price()).alias("dv"))
          .select(F.col("l_partkey").alias("partkey"),
                  F.col("dv").cast("double").alias("value"),
                  "dv"))
    total = pv.agg(
        (F.sum("dv").cast("double")
         / F.count(F.lit(1)) * F.lit(1.5)).alias("threshold"))
    return (pv.crossJoin(F.broadcast(total))
            .filter(F.col("value") > F.col("threshold"))
            .select("partkey", "value")
            .orderBy(F.col("value").desc(), F.col("partkey")))


# ---------------------------------------------------------------------
# q12 — shipping-priority split (derived category + conditional counts)
# ---------------------------------------------------------------------

@query("q12_tax_priority", """
    SELECT CASE WHEN l.l_tax >= 0.04 THEN 'HIGH-TAX'
                ELSE 'LOW-TAX' END AS tax_mode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY tax_mode ORDER BY tax_mode
""")
def q12_tax_priority(spark, sf_dir):
    """TPC-H-Q12-shaped priority-by-mode split: lines shipped in 1997
    classified by a derived category (a tax band stands in for the
    missing l_shipmode), counting urgent vs non-urgent order
    priorities into parallel conditional sums — the one-pass pivot
    idiom. The year window is pushed to the lineitem scan; the join
    carries only (orderkey, tax) against (orderkey, priority). The
    oracle sums are cast to BIGINT: DuckDB types an uncast
    SUM(CASE->1/0) as HUGEINT (int128) while Spark emits BIGINT, and
    the driver's value hash is type-sensitive (this exact divergence
    was the r5 red)."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01 00:00:00")
                  & (F.col("l_shipdate") < "1998-01-01 00:00:00"))
          .select("l_orderkey", "l_tax"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .select(F.when(F.col("l_tax") >= 0.04, "HIGH-TAX")
                    .otherwise("LOW-TAX").alias("tax_mode"),
                    "o_orderpriority")
            .groupBy("tax_mode")
            .agg(F.sum(F.when(urgent, 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(~urgent, 1).otherwise(0))
                 .alias("low_line_count"))
            .orderBy("tax_mode"))


# ---------------------------------------------------------------------
# q13 — customer order-count distribution (left join + histogram)
# ---------------------------------------------------------------------

@query("q13_order_distribution", """
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
""")
def q13_order_distribution(spark, sf_dir):
    """TPC-H-Q13-shaped customer distribution: per-customer order
    counts INCLUDING zero-order customers (the left join is the whole
    point — an inner join silently drops them), with a priority
    exclusion standing in for the original's comment-pattern NOT LIKE.
    COUNT(o_orderkey) counts only matched rows (null-skipping) on both
    engines. Two shuffles: one per aggregation level; the histogram's
    key space is tiny so the second is trivial."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
         .select("o_custkey", "o_orderkey"))
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


# ---------------------------------------------------------------------
# q15 — top supplier (argmax against a self-aggregate)
# ---------------------------------------------------------------------

@query("q15_top_supplier", """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({rev}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
""".format(rev=_REVU_SQL))
def q15_top_supplier(spark, sf_dir):
    """TPC-H-Q15-shaped top supplier: the supplier(s) with maximum
    revenue in one quarter. The revenue view is computed once; its max
    is a 1-row broadcast cross-joined back, and the equality compares
    DECIMAL against DECIMAL — exact, so ties surface identically on
    both engines (the reason the comparison must NOT happen in
    double). Supplier join is declarative (AQE broadcasts the ~100-row
    qualifying set at test scale)."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01 00:00:00")
                  & (F.col("l_shipdate") < "1997-04-01 00:00:00"))
          .select("l_suppkey", "l_extendedprice", "l_discount"))
    # per-supplier totals as exact integers (limb-pair sums in 1e-4
    # units recombined to decimal(38,0)): the max and the equality
    # compare EXACT values, so ties surface identically on both
    # engines, and the conversion to double happens once per output row
    li = li.select("l_suppkey", intmoney.rev_units().alias("rev_u"))
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")) \
            .agg(intmoney.limb_sum_exact("rev_u").alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("mx"))
            .join(s, F.col("supplier_no") == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    (F.col("total_rev").cast("double") / F.lit(10000.0))
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


# ---------------------------------------------------------------------
# q16 — supplier-part relationship counts (NOT IN anti-join)
# ---------------------------------------------------------------------

@query("q16_part_supplier_counts", """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 100
""")
def q16_part_supplier_counts(spark, sf_dir):
    """TPC-H-Q16-shaped part/supplier relationship: distinct supplier
    counts per (brand, type, size) bucket, excluding one brand/type
    and negative-balance suppliers (standing in for the original's
    complaint-comment exclusion; shipped-distinct pairs stand in for
    partsupp). The NOT IN is a left-anti join against a tiny filtered
    supplier list (s_suppkey is never null, so NOT IN ≡ anti-join);
    part predicates are pushed to its scan. The distinct + grouped
    count-distinct share the (partkey, suppkey) exchange."""
    pairs = (_t(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    bad = (_t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#5")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
            .join(p, pairs.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size")
            .limit(100))


# ---------------------------------------------------------------------
# q17 — small-quantity revenue (per-group scalar threshold)
# ---------------------------------------------------------------------

@query("q17_small_qty_revenue", """
    WITH thresh AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                         AS DOUBLE) / COUNT(*)) AS tq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p   ON p.p_partkey = l.l_partkey
    JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < t.tq
""")
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17-shaped small-quantity revenue: lines of Brand#3/SMALL
    parts whose quantity is below 20% of that part's average. The
    original's correlated AVG subquery becomes a per-part aggregate
    equi-joined back (one extra shuffle on l_partkey, reused by AQE
    for the probe join — never a per-row re-scan). The average is
    computed as exact-decimal-sum / count in double on BOTH engines
    (never the engine's AVG, whose fold order over raw doubles is
    unspecified), so the 0.2× threshold is bit-identical."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    thresh = (li.groupBy("l_partkey")
              .agg(((F.sum(_qty()).cast("double")
                     / F.count(F.lit(1))) * F.lit(0.2)).alias("tq"))
              .withColumnRenamed("l_partkey", "tk"))
    p = (_t(spark, sf_dir, "part")
         .filter((F.col("p_brand") == "Brand#3")
                 & (F.col("p_type") == "SMALL"))
         .select("p_partkey"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(thresh, li.l_partkey == thresh.tk)
            .filter(F.col("l_quantity") < F.col("tq"))
            .agg((F.sum(_price()).cast("double") / F.lit(7.0))
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))


# ---------------------------------------------------------------------
# q19 — disjunctive-predicate join revenue
# ---------------------------------------------------------------------

@query("q19_disjunctive_revenue", """
    SELECT CAST(SUM({rev}) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""".format(rev=_REVU_SQL))
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H-Q19-shaped discounted revenue with a three-branch
    disjunction spanning both join sides (brand/size bands stand in
    for the original's container lists). The single-column residues
    ARE pushed down: Catalyst derives p_brand IN (…) / p_size <= 15 /
    l_quantity BETWEEN 1 AND 30 supersets of the disjunction for each
    scan, then applies the cross-table disjunction post-join — the
    standard plan for q19 on any columnar engine."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5)
         & (qty >= 1) & (qty <= 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10)
           & (qty >= 10) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15)
           & (qty >= 20) & (qty <= 30)))
    # global sum -> limb pairs; revenue units projected post-filter
    pre = (li.join(p, li.l_partkey == p.p_partkey)
           .filter(cond)
           .select(intmoney.rev_units().alias("rev_u")))
    return pre.agg(
        intmoney.limb_sum_double("rev_u", 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


# ---------------------------------------------------------------------
# q20 — part-promotion suppliers (share-of-part threshold semi-join)
# ---------------------------------------------------------------------

@query("q20_promo_suppliers", """
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE '%bolt%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey),
    totals AS (
      SELECT l_partkey, SUM(sq) AS tq FROM shipped GROUP BY l_partkey),
    qualifying AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s JOIN totals t ON s.l_partkey = t.l_partkey
      WHERE CAST(s.sq AS DOUBLE) > 0.3 * CAST(t.tq AS DOUBLE))
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AFRICA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qualifying)
    ORDER BY s.s_name
""")
def q20_promo_suppliers(spark, sf_dir):
    """TPC-H-Q20-shaped promotion candidates: AFRICA suppliers who
    shipped more than 30% of some '%bolt%' part's 1997 volume (their
    own shipped share stands in for the missing partsupp availqty
    rule). Two stacked aggregates share the l_partkey exchange; the
    share comparison runs on exact decimal sums cast to double with
    the same 0.3 literal; the final IN is a left-semi join on a
    distinct suppkey set that stays distributed."""
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%bolt%")).select("p_partkey"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01 00:00:00")
                  & (F.col("l_shipdate") < "1998-01-01 00:00:00"))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    shipped = (li.join(p, li.l_partkey == p.p_partkey)
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(_qty()).alias("sq")))
    totals = shipped.groupBy("l_partkey").agg(F.sum("sq").alias("tq")) \
                    .withColumnRenamed("l_partkey", "tk")
    qual = (shipped.join(totals, shipped.l_partkey == totals.tk)
            .filter(F.col("sq").cast("double")
                    > F.lit(0.3) * F.col("tq").cast("double"))
            .select("l_suppkey").distinct())
    s = _t(spark, sf_dir, "supplier")
    afr = (s.join(F.broadcast(_nation_region(spark, sf_dir, "AFRICA")),
                  s.s_nationkey == F.col("n_nationkey"))
           .select("s_suppkey", "s_name", "n_name"))
    return (afr.join(qual, afr.s_suppkey == qual.l_suppkey, "left_semi")
            .select("s_name", "n_name")
            .orderBy("s_name"))


# ---------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (exists / not-exists)
# ---------------------------------------------------------------------

@query("q21_sole_blamed_supplier", """
    WITH pair AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem GROUP BY l_orderkey, l_suppkey),
    qual AS (
      SELECT l_orderkey FROM pair GROUP BY l_orderkey
      HAVING COUNT(*) > 1 AND SUM(has_r) = 1)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM pair p
    JOIN qual q ON p.l_orderkey = q.l_orderkey
    JOIN orders o ON p.l_orderkey = o.o_orderkey
    JOIN supplier s ON p.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.has_r = 1 AND o.o_orderstatus = 'F' AND r.r_name = 'ASIA'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 100
""")
def q21_sole_blamed_supplier(spark, sf_dir):
    """TPC-H-Q21-shaped waiting-orders blame: ASIA suppliers who were
    the ONLY supplier with a returned line in a finished multi-supplier
    order (returnflag='R' stands in for the missing
    receiptdate>commitdate lateness). The original's
    EXISTS(other supplier) AND NOT EXISTS(other late supplier) double
    correlation is recast as stacked aggregates over ONE lineitem scan:
    per-(order, supplier) has-returned flags, then per-order counts —
    COUNT(*) > 1 encodes the EXISTS, SUM(has_r) = 1 the NOT-EXISTS.
    (The first cut ran two lineitem scans — distinct pairs + distinct
    R-pairs — left-joined against each other: same answer, measured
    ~1.7 s at sf0.1; folding both into the has_r flag removed a scan,
    a distinct, and the pair-level join.) Supplier blame is filtered
    to has_r = 1 BEFORE the dimension joins.

    The qual aggregate and the blame probe collapse into ONE per-order
    aggregate: when SUM(has_r) = 1 there is exactly one supplier with a
    returned line, so MAX(CASE WHEN has_r=1 THEN suppkey END) IS the
    blamed supplier — the oracle's pair-join against qual re-derives
    the same (orderkey, blamed) rows. (Earlier forms computed pair
    twice — ReuseExchange cannot dedup the subtrees because the blame
    branch's join pushes an isnotnull(l_suppkey) the qual branch must
    not have — and r10 bridged that with an opcache'd pair frame,
    12.1 -> 8.7 s at 100x. The one-pass form beats the cache: no ~55M-
    row materialization, and nothing resident between entries.)

    Shuffle shape: lineitem repartitions on l_orderkey FIRST, so the
    (orderkey, suppkey) aggregate AND the per-order rollup both run in
    that one exchange's stage (HashPartitioning(ok) satisfies
    ClusteredDistribution(ok, sk) and ClusteredDistribution(ok)) — one
    shuffle of the 3-column scan instead of two back-to-back aggregate
    exchanges. Lines-per-order is bounded (TPC-H ~4-7), so the
    orderkey shuffle cannot skew. A NULL-suppkey blamed row survives
    the rollup as blamed=NULL and drops at the supplier inner join,
    exactly like the oracle's pair-row join. Measured at the 100x
    point: 13.4 (cached two-pass, in-suite) -> ~8 s."""
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_returnflag")
          .repartition("l_orderkey"))
    pair = (li.groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(F.when(F.col("l_returnflag") == "R", 1)
                       .otherwise(0)).alias("has_r")))
    order_stats = (pair.groupBy("l_orderkey")
                   .agg(F.count(F.lit(1)).alias("n_supps"),
                        F.sum("has_r").alias("n_r"),
                        F.max(F.when(F.col("has_r") == 1,
                                     F.col("l_suppkey")))
                        .alias("blamed_supp")))
    blamed = (order_stats
              .filter((F.col("n_supps") > 1) & (F.col("n_r") == 1))
              .select("l_orderkey", "blamed_supp"))
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F").select("o_orderkey"))
    s = _t(spark, sf_dir, "supplier")
    asia = (s.join(F.broadcast(_nation_region(spark, sf_dir, "ASIA")),
                   s.s_nationkey == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"))
    return (blamed
            .join(o, blamed.l_orderkey == o.o_orderkey, "left_semi")
            .join(asia, blamed.blamed_supp == asia.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name"))
            .limit(100))


# ---------------------------------------------------------------------
# q22 — global sales opportunity (scalar subquery + anti-join)
# ---------------------------------------------------------------------

@query("q22_dormant_customers", """
    WITH eligible AS (
      SELECT c_custkey, c_acctbal,
             CAST(c_custkey % 7 AS INTEGER) AS code
      FROM customer
      WHERE CAST(c_custkey % 7 AS INTEGER) IN (1, 3, 5)),
    cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_bal
      FROM eligible WHERE c_acctbal > 0.0)
    SELECT e.code AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(e.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM eligible e, cutoff
    WHERE e.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderdate >=
                            TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY e.code ORDER BY e.code
""")
def q22_dormant_customers(spark, sf_dir):
    """TPC-H-Q22-shaped dormant high-balance customers: per country
    code (custkey mod 7 stands in for the missing phone prefix),
    customers with above-average positive balance and no RECENT orders
    (none since 1999 — the unbounded variant is vacuous on this data:
    nearly every customer has some historical order). The
    scalar average is a 1-row broadcast (exact decimal sum / count,
    one double division — identical on both engines); the NOT EXISTS
    is a left-anti join on custkey. At 100 TB the anti-join is the
    dominant shuffle and it moves only (custkey, acctbal, code)."""
    code = (F.col("c_custkey") % 7).cast("int")
    eligible = (_t(spark, sf_dir, "customer")
                .select("c_custkey", "c_acctbal", code.alias("code"))
                .filter(F.col("code").isin(1, 3, 5)))
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    cutoff = (eligible.filter(F.col("c_acctbal") > 0.0)
              .agg((F.sum(bal).cast("double")
                    / F.count(F.lit(1))).alias("avg_bal")))
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= "1999-01-01 00:00:00")
         .select("o_custkey"))
    return (eligible.crossJoin(F.broadcast(cutoff))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
            .groupBy(F.col("code").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum(bal).cast("double").alias("totacctbal"))
            .orderBy("cntrycode"))
