"""Persisted ANN index: the stored-index serve paths must reproduce the
recompute paths row-for-row, and the stored artifacts must have the
shapes the 100 TB story claims (no vectors duplicated into the SRP
bucket file; PQ codes are the only corpus-sized PQ artifact)."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators import ann_index, similarity


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    path = str(tmp_path_factory.mktemp("annidx"))
    ann_index.build_ann_index(emb, path, dim=64, bits=6, tables=4,
                              n_centroids=16, refine_steps=0,
                              m_sub=4, n_codewords=16)
    yield emb, queries, path
    # unpersist: Spark's cache manager substitutes this full-schema
    # InMemoryRelation into ANY later scan of the same path, silently
    # defeating column pruning in other modules' plan assertions
    emb.unpersist(blocking=True)


def _rows(df):
    return sorted(tuple(r) for r in df.select(
        "qid", "vec_id", "sim", "rank").collect())


def test_srp_serve_matches_recompute(spark, built):
    emb, queries, path = built
    served = ann_index.topk_ann_srp_indexed(emb, queries, path, k=10)
    fresh = similarity.topk_ann_srp(emb, queries, dim=64, k=10, bits=6)
    assert _rows(served) == _rows(fresh)


def test_ivf_serve_matches_recompute(spark, built):
    emb, queries, path = built
    served = ann_index.topk_ann_ivf_indexed(emb, queries, path,
                                            k=10, nprobe=4)
    fresh = similarity.topk_ann_ivf(emb, queries, dim=64, k=10,
                                    n_centroids=16, nprobe=4,
                                    refine_steps=0)
    assert _rows(served) == _rows(fresh)


def test_pq_serve_matches_recompute(spark, built):
    emb, queries, path = built
    served = ann_index.topk_ann_pq_indexed(emb, queries, path,
                                           k=10, pool=30)
    fresh = similarity.topk_ann_pq(emb, queries, dim=64, k=10, pool=30)
    assert _rows(served) == _rows(fresh)


def test_ivfpq_serve_matches_recompute(spark, built):
    emb, queries, path = built
    served = ann_index.topk_ann_ivfpq_indexed(emb, queries, path,
                                              k=10, pool=30, nprobe=4)
    fresh = similarity.topk_ann_ivfpq(emb, queries, dim=64, k=10,
                                      pool=30, n_centroids=16, nprobe=4,
                                      refine_steps=0)
    assert _rows(served) == _rows(fresh)


def test_incremental_append_matches_full_rebuild(spark, tmp_path):
    """Index half the corpus, append the other half against the FROZEN
    geometry, and serving must equal a full rebuild - exact here
    because the seed-derived centroids/codebooks (16 lowest ids) live
    entirely in the first half, so freezing them loses nothing."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    first = emb.filter(F.col("vec_id") < n // 2)
    rest = emb.filter(F.col("vec_id") >= n // 2)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    path = str(tmp_path / "idx")
    ann_index.build_ann_index(first, path, dim=64, bits=6, tables=4,
                              n_centroids=16, refine_steps=0,
                              m_sub=4, n_codewords=16)
    ann_index.append_to_ann_index(rest, path)

    assert spark.read.parquet(f"{path}/pq_codes").count() == n
    served = ann_index.topk_ann_srp_indexed(emb, queries, path, k=10)
    fresh = similarity.topk_ann_srp(emb, queries, dim=64, k=10, bits=6)
    assert _rows(served) == _rows(fresh)
    served2 = ann_index.topk_ann_ivfpq_indexed(emb, queries, path,
                                               k=10, pool=30, nprobe=4)
    fresh2 = similarity.topk_ann_ivfpq(emb, queries, dim=64, k=10,
                                       pool=30, n_centroids=16,
                                       nprobe=4, refine_steps=0)
    assert _rows(served2) == _rows(fresh2)


def test_append_to_empty_built_index_fails_loudly(spark, tmp_path):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "emptyidx")
    ann_index.build_ann_index(emb.filter(F.lit(False)), path, dim=64)
    with pytest.raises(ValueError, match="empty corpus"):
        ann_index.append_to_ann_index(emb.limit(5), path, kinds=("ivf",))
    with pytest.raises(ValueError, match="empty corpus"):
        ann_index.append_to_ann_index(emb.limit(5), path, kinds=("pq",))


def test_stored_artifacts_have_scale_shapes(spark, built):
    emb, _, path = built
    n = emb.count()
    srp = spark.read.parquet(f"{path}/srp_buckets")
    # one row per (vector, table), NO vector column in the index
    assert srp.count() == n * 4
    assert set(srp.columns) == {"table_id", "bucket_key", "vec_id"}
    codes = spark.read.parquet(f"{path}/pq_codes")
    assert codes.count() == n
    assert set(codes.columns) == {"vec_id", "codes"}
    cents = spark.read.parquet(f"{path}/ivf_centroids")
    assert cents.count() == 16
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta.dim, meta.bits, meta.tables) == (64, 6, 4)


def test_append_unbuilt_family_is_contract_error(spark, tmp_path):
    """An index built with a subset of families records that subset in
    its meta; appending to an unbuilt family must be a clear ValueError,
    not an AnalysisException from a missing artifact parquet."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "srp_only")
    ann_index.build_ann_index(emb.limit(20), path, dim=64,
                              kinds=("srp",), bits=6)
    with pytest.raises(ValueError, match="built with kinds"):
        ann_index.append_to_ann_index(emb.limit(5), path, kinds=("ivf",))
    # the default (ALL_KINDS) narrows to what was built instead of dying
    before = spark.read.parquet(f"{path}/srp_buckets").count()
    ann_index.append_to_ann_index(
        emb.filter(F.col("vec_id").between(100, 104)), path)
    after = spark.read.parquet(f"{path}/srp_buckets").count()
    assert after > before


def test_srp_tables_subset_equals_narrower_index(spark, built):
    """The query-time ``tables`` knob: probing the first N tables of a
    wide index must serve exactly what an N-table index serves (plane
    j = table*bits + bit is table-local, so the subset IS the narrower
    index), and the default (all built tables) must stay identical to
    the pre-knob behavior."""
    emb, queries, path = built
    narrowed = ann_index.topk_ann_srp_indexed(emb, queries, path, k=10,
                                              tables=2)
    fresh2 = similarity.topk_ann_srp(emb, queries, dim=64, k=10, bits=6,
                                     tables=2)
    assert _rows(narrowed) == _rows(fresh2)
    # over-asking is clamped to what was built
    clamped = ann_index.topk_ann_srp_indexed(emb, queries, path, k=10,
                                             tables=99)
    full = ann_index.topk_ann_srp_indexed(emb, queries, path, k=10)
    assert _rows(clamped) == _rows(full)


def test_nonpositive_knobs_are_contract_errors(spark, built):
    """tables=0 / nprobe=0 used to filter everything and silently serve
    ZERO neighbors (r9 ADVICE); both must fail loudly instead."""
    emb, queries, path = built
    with pytest.raises(ValueError, match="tables"):
        ann_index.topk_ann_srp_indexed(emb, queries, path, k=10, tables=0)
    with pytest.raises(ValueError, match="nprobe"):
        ann_index.topk_ann_ivf_indexed(emb, queries, path, k=10, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        similarity.ivf_assignments(emb, [[0.0] * 64], nprobe=-1)
