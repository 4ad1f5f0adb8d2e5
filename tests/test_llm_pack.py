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
