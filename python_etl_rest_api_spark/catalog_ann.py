"""Persisted-ANN-index catalog entries: each builds ONE index family to
a scratch dir, serves top-k from the stored parquet, and is checked
against the SAME DuckDB oracle as its recompute twin
(sim_topk_ann_{srp,ivf,pq}) - the strongest possible proof that
index-path == recompute-path, since the driver value-hashes both
against one SQL definition. Build-vs-serve amortization is measured in
bench.py's ann-index section.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from . import catalog_pipe  # noqa: F401 - registers the PQ oracle first
from .catalog import ORACLES, _t, query
from .catalog_ext import _IVF_ORACLE_SQL, _SRP_ORACLE_SQL
from .operators import ann_index


def _emb_and_queries(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    return emb, queries


@query("sim_ann_index_srp_serve", _SRP_ORACLE_SQL)
def sim_ann_index_srp_serve(spark, sf_dir):
    """SRP top-k served from the PERSISTED bucket file (build once to
    scratch, then the serve path scans only (table, bucket, id) and
    joins candidates back to the corpus by id). Same parameters and
    same oracle as sim_topk_ann_srp - a value-hash match proves the
    stored index reproduces the recompute path bit-for-bit."""
    emb, queries = _emb_and_queries(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="annidx_srp_")
    ann_index.build_ann_index(emb, path, dim=64, kinds=("srp",), bits=6)
    return ann_index.topk_ann_srp_indexed(emb, queries, path, k=10) \
        .select("qid", "vec_id", "sim", "rank")


@query("sim_ann_index_ivf_serve", _IVF_ORACLE_SQL)
def sim_ann_index_ivf_serve(spark, sf_dir):
    """IVF top-k served from the PERSISTED codebook + inverted file
    (refine_steps=0 seed codebook, like the recompute entry, so the SQL
    oracle reproduces assignments exactly). nprobe stays a query-time
    knob; the stored geometry comes from the index meta."""
    emb, queries = _emb_and_queries(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="annidx_ivf_")
    ann_index.build_ann_index(emb, path, dim=64, kinds=("ivf",),
                              n_centroids=16, refine_steps=0)
    return ann_index.topk_ann_ivf_indexed(emb, queries, path, k=10,
                                          nprobe=4) \
        .select("qid", "vec_id", "sim", "rank")


@query("sim_ann_index_ivfpq_serve", ORACLES["sim_topk_ann_ivfpq"])
def sim_ann_index_ivfpq_serve(spark, sf_dir):
    """The COMPOSED index served from storage: one build call persists
    the inverted file AND the PQ codes; the serve path probes cells
    from the stored centroids, prunes to probed cells via the stored
    assignments, ADC-scores the stored m_sub-byte codes, and re-ranks
    the pool exactly - the full billion-vector read pattern with zero
    recomputation of corpus-sized artifacts. Oracle shared verbatim
    with sim_topk_ann_ivfpq."""
    emb, queries = _emb_and_queries(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="annidx_ivfpq_")
    ann_index.build_ann_index(emb, path, dim=64, kinds=("ivf", "pq"),
                              n_centroids=16, refine_steps=0,
                              m_sub=4, n_codewords=16)
    return ann_index.topk_ann_ivfpq_indexed(emb, queries, path, k=10,
                                            pool=30, nprobe=4)


@query("sim_ann_index_pq_serve", ORACLES["sim_topk_ann_pq"])
def sim_ann_index_pq_serve(spark, sf_dir):
    """PQ-ADC top-k served from the PERSISTED codes: the codebooks load
    driver-side (tiny), the m_sub-byte codes parquet is the only
    corpus-sized scan in the ADC pass, and the pooled candidates join
    back to the corpus for the exact re-rank. Oracle shared verbatim
    with sim_topk_ann_pq."""
    emb, queries = _emb_and_queries(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="annidx_pq_")
    ann_index.build_ann_index(emb, path, dim=64, kinds=("pq",),
                              m_sub=4, n_codewords=16)
    return ann_index.topk_ann_pq_indexed(emb, queries, path, k=10,
                                         pool=30)
