"""Aggregation / subquery / reshape catalog entries: conditional (FILTER)
aggregates, struct-max argmax, numerically-exact moments, CUBE grouping
sets, UNPIVOT (melt), semi/anti joins as EXISTS/NOT EXISTS, broadcast
scalar-subquery share-of-total, union-distinct, fixed-width histograms, and
a rank-window pack (ntile / percent_rank / cume_dist).

None of these exist in the reference (its whole aggregate surface is the
join+group-by+sum view sql/02_view.sql:4-11 and the count audits
readme.md:132-145 — SURVEY.md §2.H); they are the next ring of warehouse
surface, each written so the exchange count is the theoretical minimum and
every computed value is bit-identical to the DuckDB oracle (decimal sums,
fixed-order double arithmetic, id tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import _t, query
from .functions.cleaning import money

# ---------------------------------------------------------------------
# Conditional / argmax / exact-moment aggregation
# ---------------------------------------------------------------------

@query("agg_conditional_filter", """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE)
               AS finished_revenue
    FROM orders GROUP BY o_orderpriority
""")
def agg_conditional_filter(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause): several predicated
    aggregates in ONE pass over the fact table — the idiom that replaces N
    self-joins with N when() branches inside a single partial+final hash
    aggregate."""
    o = _t(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    is_o = F.col("o_orderstatus") == "O"
    return (o.groupBy("o_orderpriority")
            .agg(F.count_if(is_f).alias("n_finished"),
                 F.count_if(is_o).alias("n_open"),
                 F.coalesce(F.sum(F.when(is_f, money("o_totalprice"))),
                            F.lit(0).cast("decimal(18,2)"))
                 .cast("double").alias("finished_revenue")))


@query("agg_argmax_best_order", """
    SELECT o_custkey,
           (max({'p': o_totalprice, 'id': o_orderkey})).id AS best_orderkey,
           (max({'p': o_totalprice, 'id': o_orderkey})).p  AS best_price
    FROM orders GROUP BY o_custkey
""")
def agg_argmax_best_order(spark, sf_dir):
    """Argmax without a join-back or window: lexicographic struct max keeps
    (price, id) together through the partial+final aggregate — one shuffle,
    deterministic ties (id breaks them), and no second pass over the fact.
    The scalable form of "row of the max" that max_by alone can't make
    deterministic."""
    o = _t(spark, sf_dir, "orders")
    best = F.max(F.struct(F.col("o_totalprice").alias("p"),
                          F.col("o_orderkey").alias("id")))
    return (o.groupBy("o_custkey").agg(best.alias("b"))
            .select("o_custkey",
                    F.col("b.id").alias("best_orderkey"),
                    F.col("b.p").alias("best_price")))


@query("stats_exact_moments", """
    WITH s AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))
                 * CAST(o_totalprice AS DECIMAL(18,2))) AS sxx
      FROM orders GROUP BY o_orderpriority),
    d AS (
      -- DuckDB's direct DECIMAL->DOUBLE cast double-rounds via int128;
      -- the VARCHAR route is correctly rounded, matching Spark/Java.
      SELECT o_orderpriority, n,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd
      FROM s)
    SELECT o_orderpriority, n,
           sxd / n AS mean_price,
           (sxxd - sxd * sxd / n) / (n - 1) AS var_price,
           sqrt((sxxd - sxd * sxd / n) / (n - 1)) AS std_price
    FROM d
""")
def stats_exact_moments(spark, sf_dir):
    """Mean / sample variance / stddev from EXACT decimal power sums.
    Native stddev_samp over doubles is partition-order-dependent (its
    low bits change with the shuffle layout); sum/sum-of-squares in
    decimal are order-independent, so the derived doubles are bit-stable
    at any parallelism — the only way float moments hash-match another
    engine."""
    o = _t(spark, sf_dir, "orders")
    d = money("o_totalprice")
    agg = (o.groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(d).alias("sx"),
                F.sum(d * d).alias("sxx")))
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    n = F.col("n")
    var = (sxx - sx * sx / n) / (n - 1)
    return agg.select("o_orderpriority", "n",
                      (sx / n).alias("mean_price"),
                      var.alias("var_price"),
                      F.sqrt(var).alias("std_price"))


@query("agg_cube_grouping", """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""")
def agg_cube_grouping(spark, sf_dir):
    """CUBE over (status, priority) with the grouping-id bitmask: all four
    grouping sets in one Expand + single shuffle, instead of four scans
    unioned. gid disambiguates real NULL keys from subtotal rows."""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.grouping_id().alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(money("o_totalprice")).cast("double").alias("revenue"))
            .select("o_orderstatus", "o_orderpriority", "gid", "n", "revenue"))


# ---------------------------------------------------------------------
# Reshape: UNPIVOT (melt)
# ---------------------------------------------------------------------

@query("unpivot_measures", """
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
             CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice',
             CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount',
             CAST(l_discount AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax',
             CAST(l_tax AS DOUBLE) FROM lineitem)
    WHERE l_orderkey < 1000
""")
def unpivot_measures(spark, sf_dir):
    """UNPIVOT / melt: wide measures to long (key, measure, value) form —
    the bridge into generic per-metric pipelines. Spark's unpivot is a
    single Expand pass (each row emits 4), not 4 scans unioned."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    cast = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"))
    return cast.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure", "value")


# ---------------------------------------------------------------------
# Semi / anti joins, scalar subquery, union-distinct
# ---------------------------------------------------------------------

@query("join_semi_exists", """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""")
def join_semi_exists(spark, sf_dir):
    """EXISTS as a left-semi join: emits each customer at most once, never
    multiplies rows, and ships only the join key of the fact side — the
    correct decorrelation of the subquery (a join+distinct would shuffle
    full fact rows then pay a second dedup shuffle)."""
    c = _t(spark, sf_dir, "customer")
    urgent = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")))
    return c.join(urgent, "c_custkey", "left_semi").select("c_custkey", "c_name")


@query("join_anti_no_orders", """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
""")
def join_anti_no_orders(spark, sf_dir):
    """NOT EXISTS as a left-anti join: customers with zero orders. Same
    shuffle shape as the semi join; the fact side is pre-projected to its
    key only before the exchange."""
    c = _t(spark, sf_dir, "customer")
    keys = _t(spark, sf_dir, "orders") \
        .select(F.col("o_custkey").alias("c_custkey"))
    return c.join(keys, "c_custkey", "left_anti").select("c_custkey", "c_name")


@query("scalar_share_of_total", """
    SELECT o_orderkey, o_totalprice,
           o_totalprice /
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            FROM orders) AS revenue_share
    FROM orders WHERE o_totalprice > 400000
""")
def scalar_share_of_total(spark, sf_dir):
    """Scalar subquery (share of grand total): the one-row global aggregate
    is broadcast and cross-joined, so the fact table never reshuffles and
    the plan stays embarrassingly parallel — the distributed form of a
    correlated scalar. Total in exact decimal, division in double."""
    o = _t(spark, sf_dir, "orders")
    total = o.agg(F.sum(money("o_totalprice")).cast("double").alias("_total"))
    return (o.filter(F.col("o_totalprice") > 400000)
            .join(F.broadcast(total))
            .select("o_orderkey", "o_totalprice",
                    (F.col("o_totalprice") / F.col("_total"))
                    .alias("revenue_share")))


@query("set_union_distinct", """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
""")
def set_union_distinct(spark, sf_dir):
    """UNION DISTINCT across two relations: union is free (no shuffle),
    the single dedup exchange runs on the already-projected 1-column set."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# ---------------------------------------------------------------------
# Histogram + rank-window pack
# ---------------------------------------------------------------------

@query("hist_price_bins", """
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY 1
""")
def hist_price_bins(spark, sf_dir):
    """Fixed-width histogram by floor division — a full distribution in one
    aggregate pass (bins are the group keys; no sort, no per-bin scans).
    The building block for distribution profiling at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.floor(F.col("o_totalprice") / 50000.0).alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("o_totalprice").cast("double").alias("lo"),
                 F.max("o_totalprice").cast("double").alias("hi")))


@query("w6_rank_pack", """
    SELECT o_custkey, o_orderkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""")
def w6_rank_pack(spark, sf_dir):
    """Distribution-rank window pack (ntile / percent_rank / cume_dist) in
    one window frame: one shuffle on the partition key serves all three.
    percent_rank/cume_dist are exact integer-ratio doubles, so they
    hash-match cross-engine."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select("o_custkey", "o_orderkey",
                    F.ntile(4).over(w).alias("quartile"),
                    F.percent_rank().over(w).alias("pr"),
                    F.cume_dist().over(w).alias("cd"))
