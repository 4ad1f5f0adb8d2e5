"""End-to-end curation funnel: self-consistency invariants that hold at
any scale (the value-exactness check is the DuckDB oracle on the catalog
entry; these assert the SEMANTICS of each stage on the survivors)."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators import dedup
from python_etl_rest_api_spark.operators.curate import curate_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def survivors(spark, docs):
    return curate_documents(docs).cache()


def test_funnel_reduces_and_keeps_schema(docs, survivors):
    n_in, n_out = docs.count(), survivors.count()
    assert 0 < n_out < n_in
    assert survivors.columns == [
        "doc_id", "predicted_lang", "n_tokens", "n_tokens_bpe_est"]


def test_quality_gates_hold_on_survivors(survivors):
    bad = survivors.filter(
        (F.col("predicted_lang") != "en") | (F.col("n_tokens") < 20)).count()
    assert bad == 0


def test_no_near_dups_remain(docs, survivors):
    """Re-running the SAME near-dup detector over the surviving texts must
    find nothing: every verified pair had its higher id dropped, and the
    detector is deterministic, so any remaining pair would have been found
    and broken in the curation pass itself."""
    kept = docs.join(survivors.select("doc_id"), "doc_id", "left_semi")
    assert dedup.minhash_near_dups(kept).count() == 0


def test_exact_dups_resolved_to_lowest_id(spark, docs, survivors):
    """Inject a byte-identical copy of a surviving doc under a higher id:
    the keeper must stay, the copy must not survive."""
    keeper = survivors.orderBy("doc_id").first()
    text = docs.filter(F.col("doc_id") == keeper.doc_id).first().text
    clone_id = 10_000_000
    clone = spark.createDataFrame(
        [(clone_id, text, "en", "synthetic", len(text))], docs.schema)
    out = curate_documents(docs.union(clone))
    ids = {r.doc_id for r in out.collect()}
    assert keeper.doc_id in ids and clone_id not in ids
