"""Text-analysis operator semantics on controlled inputs."""

import pytest

from python_etl_rest_api_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "el gato de la casa es un gato"),
        (2, "zzz qqq xxx"),
        (3, "the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert got == {0: 6, 1: 8, 2: 3, 3: 4}


def test_quality_score(docs):
    got = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert got[3]["distinct_ratio"] == pytest.approx(0.25)   # the x4
    assert got[0]["stopword_ratio"] == pytest.approx(2 / 6)  # 'the' x2
    assert got[2]["stopword_ratio"] == 0.0
    assert got[0]["n_chars_measured"] == len("the cat sat on the mat")


def test_language_id(docs):
    got = {r["doc_id"]: r["predicted_lang"]
           for r in text.language_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "und"


def test_fingerprint_stability(spark, docs):
    fp1 = {r["doc_id"]: r["fp_md5"] for r in text.fingerprint(docs).collect()}
    fp2 = {r["doc_id"]: r["fp_md5"] for r in text.fingerprint(docs).collect()}
    assert fp1 == fp2
    # md5 of normalized text: same text -> same fp; different -> different
    assert len(set(fp1.values())) == 4
    # case/whitespace-insensitive
    shouty = spark.createDataFrame(
        [(9, "  THE CAT SAT ON THE MAT ")], "doc_id long, text string")
    fp9 = text.fingerprint(shouty).collect()[0]["fp_md5"]
    assert fp9 == fp1[0]
