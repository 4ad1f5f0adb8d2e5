"""Empty-input robustness for the entries with driver-side collects or
numeric edge cases (seed codebooks, convergence loops, div-by-total,
sequence bounds). The FULL 165-entry empty sweep lives in
tools/empty_sweep.py (run per-round; too slow for every pytest run) -
this pins the risky subset so a regression fails fast."""

import pytest

from python_etl_rest_api_spark.registry import QUERIES
from tools.empty_sweep import build_empty_fixture

RISKY = [
    "sim_topk_ann_pq",            # (m, K, s) codebook reshape on 0 seeds
    "sim_topk_ann_ivf",           # seed centroids collect
    "sim_topk_ann_srp",           # projection UDF on empty batches
    "sim_topk_bruteforce",
    "sim_mmr_rerank",             # driver greedy loop over empty pool
    "dedup_cluster_components",   # convergence loop over empty edges
    "dedup_containment",          # postings/hset joins
    "dedup_repeated_spans",       # sequence() over empty token arrays
    "sample_weighted_systematic",  # div by null total
    "events_resample_gapfill",    # sequence(lo, hi) with null bounds
    "stats_ks_drift",             # div by (0 - n_s)
    "events_mad_outliers",        # rank median of nothing
    "orders_rfm_segments",        # ntile over empty
    "orders_cycle_time_stats",
    "cdc_apply_changes",
    "events_touch_matrix",
    "profile_table_describe",     # min/max/format of nothing
    "docs_vocab_growth",          # decile marks from a null max_id
    "events_dwell_time",          # lag gaps over empty partitions
    "text_bpe_merges",            # argmax collect of an empty pair table
]


@pytest.fixture(scope="module")
def empty_dir(spark):
    return build_empty_fixture(spark)


@pytest.mark.parametrize("name", RISKY)
def test_entry_survives_empty_input(spark, empty_dir, name):
    rows = QUERIES[name](spark, empty_dir).limit(10).collect()
    if name == "profile_table_describe":
        # a profile of an empty table still lists every column rather
        # than vanishing; n_nulls is NULL (SQL SUM over zero rows, same
        # in the oracle), counts are 0, min/max are NULL
        assert len(rows) == 6
        assert all(r["n_rows"] == 0 and r["n_nulls"] is None
                   and r["n_distinct"] == 0 and r["min_str"] is None
                   for r in rows)
    elif name == "docs_vocab_growth":
        # since the r4-advice fix, checkpoints LEFT-join from the decile
        # marks: an empty corpus still emits all 10 decile rows with a
        # NULL cutoff (max_id over zero rows) and 0 counts - the same
        # rows the oracle's scalar subqueries produce
        assert len(rows) == 10
        assert all(r["cutoff_doc_id"] is None and r["corpus_tokens"] == 0
                   and r["distinct_vocab"] == 0 for r in rows)
    else:
        assert rows == []
