"""Second LLM-pipeline pack (catalog_llm.py): semantic invariants the
oracle value-hash can't express — probability normalization, histogram
completeness, weight-mass conservation."""

import math

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog_llm import (
    dedup_cluster_weights,
    mix_temperature_weights,
    ngram_bigram_hitters,
    text_length_histogram,
)

SF = "/root/testdata/sf0.001"


def test_bigram_doc_freq_bounded_by_corpus(spark):
    rows = ngram_bigram_hitters(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert rows, "corpus fixture must produce bigrams"
    for r in rows:
        # doc frequency counts each document at most once
        assert 0 < r.doc_freq <= n_docs
        assert abs(r.doc_share - r.doc_freq / n_docs) < 1e-12
    # descending by construction
    freqs = [r.doc_freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_mix_weights_are_a_distribution(spark):
    rows = mix_temperature_weights(spark, SF).collect()
    assert len(rows) >= 2
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-9
    # temperature flattening: every boost moves shares TOWARD uniform -
    # below-average domains get boost > 1, above-average get boost < 1
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r.raw_share < mean_share - 1e-12:
            assert r.boost > 1.0
        elif r.raw_share > mean_share + 1e-12:
            assert r.boost < 1.0
        assert abs(r.temp_weight
                   - math.sqrt(r.raw_share) * r.temp_weight
                   / math.sqrt(r.raw_share)) < 1e-12


def test_length_histogram_partitions_the_corpus(spark):
    rows = text_length_histogram(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # bucket b holds lengths in [2^(b-1), 2^b)
        assert 2 ** (r.log2_bucket - 1) <= r.min_tokens
        assert r.max_tokens < 2 ** r.log2_bucket


def test_cluster_weights_conserve_distinct_mass(spark):
    df = dedup_cluster_weights(spark, SF)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs, "every doc must get a weight"
    n_components = len({r.component_id for r in rows})
    # sum of 1/cluster_size over all docs == number of distinct contents
    total_weight = sum(r.sample_weight for r in rows)
    assert abs(total_weight - n_components) < 1e-9
    for r in rows:
        assert r.component_id <= r.doc_id or r.cluster_size > 1


def test_mmr_trades_relevance_for_diversity(spark):
    """MMR's selected set must (a) start with the most relevant
    candidate, (b) never exceed plain top-k's total relevance, and
    (c) reduce the max intra-set similarity vs plain top-5."""
    from python_etl_rest_api_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    mmr = similarity.mmr_rerank(emb, q, pool=12, k=5, lam=0.7)
    assert [r[0] for r in mmr] == [1, 2, 3, 4, 5]
    plain = similarity.topk_bruteforce(emb, q, k=5).collect()
    top_ids = [r.vec_id for r in sorted(plain, key=lambda r: r.rank)]
    # MMR rank 1 == plain rank 1 (pure relevance before any diversity)
    assert mmr[0][1] == top_ids[0]
    assert sum(r[2] for r in mmr) <= sum(r.sim for r in plain) + 1e-12

    def max_intra(ids):
        vecs = emb.filter(F.col("vec_id").isin(ids))
        sims = similarity.pairwise_cosine(vecs).collect()
        return max(s.sim for s in sims)

    assert max_intra([r[1] for r in mmr]) <= max_intra(top_ids) + 1e-12
