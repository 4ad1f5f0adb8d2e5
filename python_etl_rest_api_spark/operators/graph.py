"""Graph algorithms as iterative DataFrame algebra: co-purchase edge
derivation and an integer-exact PageRank.

The reference (/root/reference/etl/03_transform_and_load.py) has no graph
surface at all; this extends the engine toward the link-analysis /
influence-scoring operators a training-data pipeline uses for source
weighting (e.g. page quality priors over a hyperlink graph). The design
constraint driving everything here is CROSS-ENGINE EXACTNESS: PageRank is
normally float arithmetic whose per-node sums associate differently
between engines, so this implementation works in integer micro-units with
truncating integer division only (verified identical semantics: Spark
``div`` and DuckDB ``//`` both truncate toward zero) - every iteration is
bit-reproducible on any engine that implements the same recurrence, which
is what lets the driver value-hash a 5-iteration fixpoint.

Scale posture: edges are derived with a per-order self-join (orders are
small groups, so the join explodes quadratically only within an order -
bounded by max basket size, never a global cartesian), and each PageRank
iteration is one shuffle (groupBy dst) over the edge list plus a
broadcast-size rank table join. The driver loop holds only DataFrame
handles; ``localCheckpoint`` truncates lineage each round exactly as
``dedup.connected_components`` does (the proven iterative pattern in this
repo). At 100 TB the edge list partitions by src and the rank table
co-partitions - the per-iteration cost is one shuffle of (node, contrib)
pairs, which is the textbook Pregel-on-relations layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(lineitem: DataFrame,
                     order_col: str = "l_orderkey",
                     item_col: str = "l_partkey") -> DataFrame:
    """Distinct undirected co-purchase pairs (a < b) of items appearing
    in the same order. The self-join keys on the order id, so the
    quadratic blowup is per-basket (a handful of lines), never a global
    cartesian; distinct collapses repeat pairs across orders."""
    # one distinct projection, self-joined: the (order, item) dedup
    # shuffle is paid once and both join sides read the same exchange
    # (ReusedExchange in the plan), not two copies of it
    oi = (lineitem.select(F.col(order_col).alias("o"),
                          F.col(item_col).alias("i")).distinct())
    return (oi.alias("x").join(oi.alias("y"), "o")
            .filter(F.col("x.i") < F.col("y.i"))
            .select(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
            .distinct())


def copurchase_edges(lineitem: DataFrame,
                     order_col: str = "l_orderkey",
                     item_col: str = "l_partkey") -> DataFrame:
    """Co-purchase pairs emitted in BOTH directions as (src, dst) for
    walk-style algorithms (PageRank and friends)."""
    pairs = copurchase_pairs(lineitem, order_col, item_col)
    return (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .union(pairs.select(F.col("b").alias("src"),
                                F.col("a").alias("dst"))))


def pagerank_int(edges: DataFrame, iters: int = 5,
                 damping_milli: int = 850,
                 unit: int = 1_000_000,
                 broadcast_ranks: bool = True) -> DataFrame:
    """PageRank in integer micro-units: rank starts at ``unit`` per node,
    each iteration each node sends ``rank div out_degree`` along its out
    edges and receives

        new_rank = (1000 - damping_milli) * unit // 1000
                   + damping_milli * sum(incoming contribs) // 1000

    All arithmetic is BIGINT with truncating integer division, so the
    fixpoint after ``iters`` rounds is exactly reproducible in any engine
    (no float association, no rounding mode). Ranks stay non-negative so
    truncation direction can never matter. Returns (node, rank) for every
    node; symmetrized edge lists guarantee every node has out_degree >= 1
    (no dangling-mass term needed - callers feeding directed graphs with
    sinks should pre-symmetrize or add self-loops).

    Plan shape: the edge list materializes ONCE (localCheckpoint) and
    each iteration is edge-scan -> broadcast-join the rank table ->
    one shuffle (groupBy dst). The fixed iteration count needs no
    convergence check, so the loop body stays LAZY - no per-iteration
    checkpoint barrier; the whole 5-round recurrence compiles into one
    pipelined job whose only exchanges are the per-round dst shuffles.
    (Per-round localCheckpoint cost 3-4x wall: 5 sequential jobs, each
    re-paying scheduling + materialization; and checkpointed rank
    tables lose size stats, so the planner stopped broadcasting them
    and sort-merge-shuffled the EDGES every round.) ``broadcast_ranks``
    is right while the node table is dimension-sized relative to edges
    (every real item/page graph); for node sets too big to broadcast,
    pass False and pre-partition edges by src so the join co-locates.
    """
    teleport = (1000 - damping_milli) * unit // 1000
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edeg = edges.join(deg, "src").localCheckpoint()
    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(unit).cast("long").alias("rank"))
    for _ in range(iters):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (edeg.join(r, edeg.src == r.node)
                   .select(F.col("dst"),
                           F.expr("rank div deg").alias("c")))
        ranks = (contrib.groupBy("dst")
                 .agg(F.sum("c").alias("s"))
                 .select(F.col("dst").alias("node"),
                         (F.lit(teleport)
                          + F.expr(f"({damping_milli} * s) div 1000")
                          ).cast("long").alias("rank")))
    return ranks


def top_ranks(ranks: DataFrame, k: int = 25) -> DataFrame:
    """Deterministic top-k by the TOTAL order (rank desc, node asc): the
    tiebreak makes the boundary unambiguous, and orderBy+limit compiles to
    TakeOrderedAndProject - a parallel per-partition heap merged on the
    driver, NOT a single-partition global window (the antipattern this
    repo's plan audit hunts)."""
    return (ranks.orderBy(F.col("rank").desc(), F.col("node"))
            .limit(k)
            .select(F.col("node").alias("part"),
                    F.col("rank").alias("rank_micro")))


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Global triangle census over an undirected edge list given as
    oriented pairs (a < b): triangles via the oriented two-hop join
    (a<b<c joins (a,b)+(b,c) then probes (a,c)), wedges as
    sum(deg*(deg-1))/2, and global transitivity = 3*tri/wedges.

    The orientation is the scale trick: joining oriented edges counts
    each triangle exactly once and bounds the two-hop intermediate by
    sum over nodes of out_deg^2 where out-degree only counts HIGHER
    neighbors - the standard compact-forward shape. Degree-skewed
    graphs should pre-orient by (degree, id) instead of raw id; id
    order is used here because the co-purchase input is pre-bounded.
    Returns one row: (n_edges, n_triangles, n_wedges, transitivity).
    """
    p = pairs.select("a", "b").distinct().localCheckpoint()
    hop = (p.alias("e1")
           .join(p.alias("e2"), F.col("e1.b") == F.col("e2.a"))
           .select(F.col("e1.a").alias("a"), F.col("e2.b").alias("c")))
    tri = hop.join(p, (hop.a == p.a) & (hop.c == p.b)).count()
    both = p.select(F.col("a").alias("v")).union(
        p.select(F.col("b").alias("v")))
    deg = both.groupBy("v").agg(F.count("*").alias("d"))
    agg = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1)).alias("wedge2"))
    n_edges = p.count()
    return agg.select(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(tri).cast("long").alias("n_triangles"),
        F.expr("wedge2 div 2").cast("long").alias("n_wedges"),
        F.when(F.col("wedge2") > 0,
               F.lit(3.0) * F.lit(tri).cast("double")
               / (F.expr("wedge2 div 2")).cast("double"))
        .otherwise(F.lit(0.0)).alias("transitivity"))


def kcore_prune(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """Iterative k-core pruning: each round recomputes degrees, drops
    nodes with degree < k, and restricts edges to surviving endpoints.

    ``rounds`` is FIXED (not run-to-fixpoint) so the published state is
    deterministic and value-hashable — the same discipline as
    pagerank_int; a production decomposition loops until no node drops
    (convergence-guarded like dedup.connected_components). Each round is
    one degree aggregation + two semi-join-shaped edge restrictions, all
    shuffling (node, node) pairs only; localCheckpoint truncates the
    lineage so the plan stays round-sized.

    Expects symmetric edges (both directions present) so the per-src
    count IS the undirected degree. Returns (src, deg) for nodes
    surviving ``rounds`` rounds of k-core pruning.
    """
    e = edges.localCheckpoint()
    for _ in range(rounds):
        keep = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= k).select("src"))
        e = (e.join(keep, "src")
             .join(keep.select(F.col("src").alias("dst")), "dst")
             .localCheckpoint())
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))


def bfs_levels(edges: DataFrame, sources: DataFrame,
               rounds: int = 3) -> DataFrame:
    """Multi-source breadth-first search, fixed ``rounds`` hops: returns
    (node, dist) for every node reached within ``rounds`` of any source
    (dist = hop count of the FIRST round that reached it, i.e. the
    exact shortest-path level; sources are dist 0).

    ``sources`` must be a (node) frame. Each round expands the frontier
    through one equi-join and anti-joins the already-visited set — the
    standard distributed BFS where only (node, dist) pairs shuffle;
    localCheckpoint truncates lineage per round so the plan stays
    round-sized. Fixed rounds keep the published state deterministic
    (the pagerank_int / kcore_prune discipline); production loops until
    the frontier empties."""
    visited = (sources.select(F.col(sources.columns[0]).alias("node"))
               .distinct()
               .withColumn("dist", F.lit(0).cast("int"))
               .localCheckpoint())
    frontier = visited.select("node")
    for hop in range(1, rounds + 1):
        nxt = (edges.join(frontier.withColumnRenamed("node", "src"),
                          "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("dist", F.lit(hop).cast("int"))
               .localCheckpoint())
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return visited
