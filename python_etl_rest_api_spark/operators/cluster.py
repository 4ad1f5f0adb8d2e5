"""K-means training as iterative DataFrame algebra over INTEGER-quantized
vectors - Lloyd's algorithm made bit-reproducible across engines.

The reference (/root/reference/etl/03_transform_and_load.py) has no
clustering; this is the engine-side primitive behind IVF coarse
quantizers, SemDeDup cluster pruning, and topic-balanced sampling in a
training-data pipeline. Float k-means is NOT cross-engine exact (centroid
means sum floats in partition order), so this implementation:

- quantizes each float to an integer on a fixed micro grid with the
  repo's portable rounding recipe ``floor(x * scale + 0.5)`` (round()
  half-tie direction differs between Java and C; floor(+0.5) does not);
- computes squared L2 distances as BIGINT folds (64 dims at |q| <= ~1e6
  peaks ~7e13 per distance - far inside int64);
- updates centroids with truncating integer mean ``sum div count``
  (Spark ``div`` == DuckDB ``//`` semantics, verified both truncate
  toward zero);
- seeds deterministically from the k smallest vec_ids.

Every assignment and every centroid after any number of iterations is
therefore exactly reproducible, which lets the driver value-hash a
3-iteration training run instead of settling for rows-only checks.

Scale posture: assignment is a broadcast join of the k-row centroid table
against the vector corpus (narrow, no shuffle of the corpus); the update
step shuffles (cluster, pos, component) triples - O(n*d) rows but tiny
ones, the same partial-aggregation shape as embed_gram_matrix. The driver
loop holds DataFrame handles only, localCheckpoint per round truncates
lineage (the proven pattern from dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_int(df: DataFrame, vec_col: str = "embedding",
                 scale: int = 1_000_000) -> DataFrame:
    """Add ``qvec``: the float vector snapped to an integer micro grid
    with portable rounding. Keeps all other columns."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
        .cast("long"))
    return df.withColumn("qvec", q)


def _sqdist(a, b):
    """BIGINT squared L2 distance between two equal-length long arrays,
    folded sequentially (order-fixed, overflow-free at embedding scale)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, d: acc + d)


def kmeans_int(df: DataFrame, k: int = 8, iters: int = 3,
               id_col: str = "vec_id") -> DataFrame:
    """Lloyd's k-means on integer-quantized vectors (``qvec`` from
    quantize_int). Seeds = the k rows with smallest ``id_col``; each
    iteration assigns every vector to the argmin-distance centroid
    (ties -> smallest cluster id) and recomputes centroids as the
    per-dimension truncating integer mean. Empty clusters keep their
    previous centroid (deterministic; documented semantics).

    Returns the final assignment (id, cluster, dist) - callers derive
    centroids or cluster profiles from it with plain aggregation.
    """
    vecs = df.select(F.col(id_col).alias("id"), "qvec").localCheckpoint()
    # row_number over the k seed rows only: the window input is k rows
    # (post-limit), so the single-partition sort is O(k), not O(n).
    cents = (vecs.orderBy("id").limit(k)
             .select(F.row_number().over(Window.orderBy("id"))
                     .alias("cluster"),
                     F.col("qvec").alias("cvec"))
             .localCheckpoint())
    assign = None
    for _ in range(iters):
        d = (vecs.crossJoin(F.broadcast(cents))
             .select("id", "cluster",
                     _sqdist(F.col("qvec"), F.col("cvec")).alias("dist")))
        assign = (d.groupBy("id")
                  .agg(F.min(F.struct("dist", "cluster")).alias("best"))
                  .select("id", F.col("best.cluster").alias("cluster"),
                          F.col("best.dist").alias("dist"))
                  .localCheckpoint())
        comp = (vecs.join(assign, "id")
                .select("cluster", F.posexplode("qvec").alias("pos", "v")))
        newc = (comp.groupBy("cluster", "pos")
                .agg(F.expr("sum(v) div count(v)").alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(
                    F.collect_list(F.struct("pos", "m"))).alias("pm"))
                .select("cluster",
                        F.transform("pm", lambda s: s["m"]).alias("cvec")))
        cents = (cents.select("cluster",
                              F.col("cvec").alias("prev"))
                 .join(newc, "cluster", "left")
                 .select("cluster",
                         F.coalesce("cvec", "prev").alias("cvec"))
                 .localCheckpoint())
    return assign
