"""Persisted ANN indexes: build once, serve many.

The r4 verdict's gap #4: every ``topk_ann_*`` call re-bucketed /
re-assigned / re-encoded the corpus, but a real pipeline builds the
index ONCE (the corpus-sized job) and serves many query batches against
the stored artifact. This module materializes each index family to
parquet and serves top-k from the stored form:

- SRP: ``(table_id, bucket_key, id)`` - the inverted bucket file. The
  vectors are NOT duplicated into the index (that would store the
  corpus ``tables`` times over); candidates are joined back to the
  corpus by id for the exact re-rank - an equi-join on the key the
  corpus can be bucketed by.
- IVF: the ``(centroid_id, centroid)`` codebook plus the
  ``(id, centroid_id)`` inverted file.
- PQ: the ``(m, c, sub)`` codebooks plus the ``(id, codes)`` byte
  codes - the only corpus-sized artifact any serve path scans, m_sub
  bytes per vector.

A one-row ``meta`` parquet pins the build parameters (dim, bits,
tables, n_centroids, refine_steps, m_sub, n_codewords); serve functions
read their geometry from it so an index can never be probed with
mismatched hyperplanes/codebooks. Serve results are value-identical to
the recompute paths (same candidate sets, same sequential-fold cosine),
proven by the ``sim_ann_index_*_serve`` catalog entries sharing the
recompute entries' oracles, and the amortization is measured in bench
(build once vs per-batch recompute).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import similarity

META_SCHEMA = ("dim int, bits int, tables int, n_centroids int, "
               "refine_steps int, m_sub int, n_codewords int, "
               "kinds string")

ALL_KINDS = ("srp", "ivf", "pq")


def _meta_kinds(m) -> tuple[str, ...]:
    """Index families recorded at build time; indexes written before
    the meta carried ``kinds`` fall back to assuming all families."""
    raw = getattr(m, "kinds", None)
    return tuple(raw.split(",")) if raw else ALL_KINDS


def build_ann_index(corpus: DataFrame, path: str, dim: int,
                    kinds: tuple[str, ...] = ALL_KINDS, *,
                    bits: int = 6, tables: int = 4,
                    n_centroids: int = 16, refine_steps: int = 0,
                    m_sub: int = 4, n_codewords: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """Materialize the requested index families under ``path`` (one
    corpus pass per family - the build cost the serve paths amortize).
    Returns ``path``."""
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(dim, bits, tables, n_centroids, refine_steps, m_sub,
          n_codewords, ",".join(kinds))], META_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    if "srp" in kinds:
        (similarity.srp_buckets(corpus, dim, bits, tables, id_col, vec_col)
         .select("table_id", "bucket_key", id_col)
         .write.mode("overwrite").parquet(f"{path}/srp_buckets"))
    if "ivf" in kinds:
        cent = similarity.ivf_centroids(
            corpus, n_centroids, dim, refine_steps=refine_steps,
            id_col=id_col, vec_col=vec_col)
        spark.createDataFrame(
            [(int(i), [float(x) for x in row])
             for i, row in enumerate(cent)],
            "centroid_id long, centroid array<double>") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{path}/ivf_centroids")
        (similarity.ivf_assignments(corpus, cent, nprobe=1,
                                    id_col=id_col, vec_col=vec_col)
         .select(id_col, "centroid_id")
         .write.mode("overwrite").parquet(f"{path}/ivf_assignments"))
    if "pq" in kinds:
        cb = similarity.pq_codebooks(corpus, n_codewords, m_sub, dim,
                                     id_col, vec_col)
        spark.createDataFrame(
            [(int(m), int(c), [float(x) for x in cb[m, c]])
             for m in range(cb.shape[0]) for c in range(cb.shape[1])],
            "m int, c int, sub array<double>") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{path}/pq_codebooks")
        (similarity.pq_encode(corpus, cb, id_col, vec_col)
         .select(id_col, "codes")
         .write.mode("overwrite").parquet(f"{path}/pq_codes"))
    return path


def _meta(spark, path: str):
    return spark.read.parquet(f"{path}/meta").collect()[0]


def append_to_ann_index(new_rows: DataFrame, path: str,
                        kinds: tuple[str, ...] = ALL_KINDS,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> None:
    """Incrementally index NEW vectors into an existing ANN index - the
    maintenance path a production corpus needs (a nightly crawl appends
    millions of vectors; rebuilding the whole index per delta is the
    anti-pattern). The stored geometry (hyperplanes from the meta
    parameters, centroids, codebooks) is FROZEN: new rows are bucketed
    / assigned / encoded against it and parquet-APPENDED, so serving
    keeps working mid-append and the result is row-identical to a full
    rebuild over the union EXCEPT that seed-derived artifacts
    (centroids, codebooks) intentionally do not drift - the standard
    freeze-then-retrain trade, retrain by rebuilding when recall decays.
    Caller contract: ``new_rows`` ids must be disjoint from the indexed
    corpus (duplicate ids would double-serve; enforce upstream with an
    anti-join on the stored id set).

    ``kinds`` is validated against the families recorded in the index
    meta at build time: appending an unbuilt family would otherwise die
    reading a nonexistent artifact parquet with an opaque
    AnalysisException instead of a contract error. The default
    (ALL_KINDS) silently narrows to what was built - append keeps the
    index exactly as complete as it was."""
    spark = new_rows.sparkSession
    m = _meta(spark, path)
    built = _meta_kinds(m)
    if kinds == ALL_KINDS:
        kinds = built
    else:
        missing = [kd for kd in kinds if kd not in built]
        if missing:
            raise ValueError(
                f"index at {path} was built with kinds={built}; "
                f"cannot append to unbuilt families {missing} - "
                f"rebuild with build_ann_index to add them")
    if "srp" in kinds:
        (similarity.srp_buckets(new_rows, m.dim, m.bits, m.tables,
                                id_col, vec_col)
         .select("table_id", "bucket_key", id_col)
         .write.mode("append").parquet(f"{path}/srp_buckets"))
    if "ivf" in kinds:
        cent_rows = (spark.read.parquet(f"{path}/ivf_centroids")
                     .orderBy("centroid_id").collect())
        cent = np.array([r["centroid"] for r in cent_rows],
                        dtype=np.float64)
        if cent.size == 0:
            # assignment against zero centroids would die with an
            # opaque numpy shape error inside the executor UDF
            raise ValueError(
                "index has no centroids (built on an empty corpus); "
                "rebuild with build_ann_index instead of appending")
        (similarity.ivf_assignments(new_rows, cent, nprobe=1,
                                    id_col=id_col, vec_col=vec_col)
         .select(id_col, "centroid_id")
         .write.mode("append").parquet(f"{path}/ivf_assignments"))
    if "pq" in kinds:
        cb = _load_pq_codebooks(spark, path, m.dim, m.m_sub)
        if cb.shape[1] == 0:
            raise ValueError(
                "index has no PQ codewords (built on an empty corpus); "
                "rebuild with build_ann_index instead of appending")
        (similarity.pq_encode(new_rows, cb, id_col, vec_col)
         .select(id_col, "codes")
         .write.mode("append").parquet(f"{path}/pq_codes"))


def topk_ann_srp_indexed(corpus: DataFrame, queries: DataFrame, path: str,
                         k: int = 10, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         qid_col: str = "qid",
                         tables: int | None = None) -> DataFrame:
    """Serve SRP ANN top-k from the persisted bucket file: probe buckets
    are computed live for the (small) query batch with the geometry
    pinned in the index meta; the corpus-side cost is the stored
    ``(table, bucket, id)`` scan plus an id equi-join to fetch candidate
    vectors - value-identical to :func:`similarity.topk_ann_srp`.

    ``tables`` (default: all built) probes only the first N hash
    tables — the SRP recall/latency knob at query time, symmetric with
    IVF's ``nprobe`` (table t's hyperplanes depend only on t, so the
    first-N subset of a wider index is exactly an N-table index)."""
    spark = corpus.sparkSession
    m = _meta(spark, path)
    if tables is not None and tables < 1:
        # a non-positive probe count would filter table_id < 0 and
        # silently serve ZERO neighbors — fail loudly instead, matching
        # the module's contract-error style (append-to-unbuilt, etc.)
        raise ValueError(f"tables must be >= 1, got {tables}")
    use_tables = m.tables if tables is None else min(tables, m.tables)
    idx = spark.read.parquet(f"{path}/srp_buckets") \
        .filter(F.col("table_id") < use_tables)
    qb = (similarity.srp_buckets(
        queries.select(F.col(qid_col).alias(id_col),
                       F.col("qv").alias(vec_col)),
        m.dim, m.bits, use_tables, id_col, vec_col)
        .select(F.col(id_col).alias(qid_col), F.col(vec_col).alias("qv"),
                F.col("table_id").alias("q_table"),
                F.col("bucket_key").alias("q_bucket")))
    cand = (idx.join(F.broadcast(qb),
                     (F.col("table_id") == F.col("q_table")) &
                     (F.col("bucket_key") == F.col("q_bucket")) &
                     (F.col(qid_col) != F.col(id_col)))
            .select(qid_col, "qv", id_col)
            .dropDuplicates([qid_col, id_col])
            .join(corpus.select(id_col, vec_col), id_col))
    pairs = cand.select(qid_col, id_col,
                        similarity.cosine(F.col("qv"), F.col(vec_col))
                        .alias("sim"))
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(),
                                            F.col(id_col).asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def topk_ann_ivf_indexed(corpus: DataFrame, queries: DataFrame, path: str,
                         k: int = 10, nprobe: int = 8,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         qid_col: str = "qid") -> DataFrame:
    """Serve IVF ANN top-k from the persisted inverted file: the stored
    codebook (k x dim - driver-tiny) assigns probes to the query batch,
    candidates come from the stored ``(id, centroid_id)`` file joined
    back to the corpus for vectors. ``nprobe`` stays a query-time knob
    (recall/latency trade per batch); the codebook geometry comes from
    the index meta."""
    spark = corpus.sparkSession
    cent_rows = (spark.read.parquet(f"{path}/ivf_centroids")
                 .orderBy("centroid_id").collect())
    cent = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    inv = spark.read.parquet(f"{path}/ivf_assignments")
    probes = (similarity.ivf_assignments(
        queries.select(F.col(qid_col).alias(id_col),
                       F.col("qv").alias(vec_col)),
        cent, nprobe=nprobe, id_col=id_col, vec_col=vec_col)
        .select(F.col(id_col).alias(qid_col), F.col(vec_col).alias("qv"),
                F.col("centroid_id").alias("probe_centroid")))
    cand = (inv.join(F.broadcast(probes),
                     (F.col("centroid_id") == F.col("probe_centroid")) &
                     (F.col(qid_col) != F.col(id_col)))
            .select(qid_col, "qv", id_col)
            .dropDuplicates([qid_col, id_col])
            .join(corpus.select(id_col, vec_col), id_col))
    pairs = cand.select(qid_col, id_col,
                        similarity.cosine(F.col("qv"), F.col(vec_col))
                        .alias("sim"))
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(),
                                            F.col(id_col).asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _load_pq_codebooks(spark, path: str, dim: int, m_sub: int
                       ) -> np.ndarray:
    cb_rows = spark.read.parquet(f"{path}/pq_codebooks") \
        .orderBy("m", "c").collect()
    s = dim // m_sub
    n_cw = max((r["c"] for r in cb_rows), default=-1) + 1
    cb = np.zeros((m_sub, n_cw, s))
    for r in cb_rows:
        cb[r["m"], r["c"], :] = r["sub"]
    return cb


def topk_ann_ivfpq_indexed(corpus: DataFrame, queries: DataFrame,
                           path: str, k: int = 10, pool: int = 100,
                           nprobe: int = 8, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           qid_col: str = "qid") -> DataFrame:
    """Serve the COMPOSED IVF-PQ path entirely from stored artifacts -
    the index a billion-vector deployment actually persists: the
    centroids assign probes (driver-tiny), the stored inverted file
    prunes to probed cells, the stored m_sub-byte codes feed ADC, and
    only the pooled candidates touch full vectors in the re-rank.
    Requires an index built with kinds including both 'ivf' and 'pq'
    (one :func:`build_ann_index` call covers it)."""
    spark = corpus.sparkSession
    m = _meta(spark, path)
    cent_rows = (spark.read.parquet(f"{path}/ivf_centroids")
                 .orderBy("centroid_id").collect())
    cent = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    inv = spark.read.parquet(f"{path}/ivf_assignments")
    cb = _load_pq_codebooks(spark, path, m.dim, m.m_sub)
    codes = spark.read.parquet(f"{path}/pq_codes")
    return similarity.ivfpq_adc_topk(
        inv, codes, cb, cent, corpus, queries, dim=m.dim, k=k, pool=pool,
        nprobe=nprobe, m_sub=m.m_sub, id_col=id_col, vec_col=vec_col,
        qid_col=qid_col)


def topk_ann_pq_indexed(corpus: DataFrame, queries: DataFrame, path: str,
                        k: int = 10, pool: int = 100,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        qid_col: str = "qid") -> DataFrame:
    """Serve PQ-ADC ANN top-k from the persisted codes: codebooks load
    to the driver (m_sub x K x s - tiny), the stored m_sub-byte codes
    are the only corpus-sized input to the ADC pass, and the exact
    re-rank joins the pooled candidates back to the corpus - the
    billion-vector read pattern the PQ family exists for."""
    spark = corpus.sparkSession
    m = _meta(spark, path)
    cb = _load_pq_codebooks(spark, path, m.dim, m.m_sub)
    codes = spark.read.parquet(f"{path}/pq_codes")
    return similarity.pq_adc_topk(
        codes, cb, corpus, queries, dim=m.dim, k=k, pool=pool,
        m_sub=m.m_sub, id_col=id_col, vec_col=vec_col, qid_col=qid_col)
