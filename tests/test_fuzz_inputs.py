"""Hostile-VALUE robustness for the riskiest entries: corrupt vector
geometry (empty / wrong-length / NaN-element embeddings), non-finite
doubles, malformed JSON, and pathological text must degrade to
exclusion, never to a crashed job. The FULL 199-entry sweep lives in
tools/fuzz_sweep.py (per-round); this pins the subset the sweep
exposed so a regression fails fast."""

import shutil

import pytest

from python_etl_rest_api_spark.registry import QUERIES
from tools.fuzz_sweep import build_fuzz_fixture

RISKY = [
    "sim_topk_bruteforce",        # zero-norm cosine div-by-zero
    "sim_cosine_near_dups",       # ragged np.stack in seq_cosine
    "sim_topk_ann_srp",           # projection UDF on ragged batch
    "sim_topk_ann_ivf",           # seed/assign dim mismatch
    "sim_topk_ann_pq",            # query batch with corrupt vectors
    "sim_topk_ann_ivfpq",
    "dedup_semantic_clusters",    # ragged seeds for the codebook
    "embed_gram_matrix",          # ragged np.asarray
    "embed_top_pc",
    "ann_recall_at_k",
    "events_value_winsorized",    # 1e6*inf -> long-overflow floor
    "events_linear_trend",        # 1e308 -> decimal overflow
    "stream_tumbling_hourly",     # money() on non-finite values
    "agg_approx_distinct",
    "text_gopher_rules",          # pathological text shapes
    "text_unigram_logprob",
    "events_json_extract",        # malformed props JSON
    "pipeline_training_data",     # full funnel over hostile text
]


@pytest.fixture(scope="module")
def fuzz_dir(spark):
    d = build_fuzz_fixture(spark)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", RISKY)
def test_entry_survives_hostile_values(spark, fuzz_dir, name):
    QUERIES[name](spark, fuzz_dir).limit(5).collect()
