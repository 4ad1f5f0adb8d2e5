"""JSONL corpus source: explicit schema, corrupt-line quarantine,
nested-metadata pruning."""

import json

from pyspark.sql import functions as F

from python_etl_rest_api_spark.sources.jsonl_source import read_jsonl


def _write_corpus(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world",
                    "meta": {"lang": "en", "source": "web",
                             "quality": 0.9}}),
        json.dumps({"doc_id": 2, "text": "bonjour",
                    "meta": {"lang": "fr", "source": "books",
                             "quality": 0.7}}),
        '{"doc_id": 3, "text": "truncated...',          # malformed JSON
        "not json at all",                               # garbage line
        json.dumps({"doc_id": 4, "text": None,
                    "meta": {"lang": "de", "source": "web",
                             "quality": None}}),         # valid, nulls ok
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    path = _write_corpus(tmp_path)
    clean, quarantined = read_jsonl(spark, path)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["text"] == "hello world"
    assert rows[1]["meta"]["lang"] == "en"
    assert rows[4]["text"] is None                 # null field != corrupt
    bad = [r["_corrupt_record"] for r in quarantined.collect()]
    assert len(bad) == 2
    assert "not json at all" in bad
    assert any(b.startswith('{"doc_id": 3') for b in bad)


def test_jsonl_type_mismatch_quarantines(spark, tmp_path):
    """Well-formed JSON whose fields fail the explicit schema is
    captured too - PERMISSIVE quarantine is schema enforcement, not
    just a malformed-line filter."""
    p = tmp_path / "typed.jsonl"
    p.write_text(json.dumps({"doc_id": "not-a-number", "text": "x",
                             "meta": None}) + "\n")
    res = read_jsonl(spark, str(p))
    assert res.clean.count() == 0
    assert res.quarantined.count() == 1
    res.unpersist()


def test_jsonl_unpersist_releases_cache(spark, tmp_path):
    path = _write_corpus(tmp_path)
    res = read_jsonl(spark, path)
    res.clean.count()
    assert res.raw.storageLevel.useMemory
    res.unpersist(blocking=True)
    assert not res.raw.storageLevel.useMemory


def test_jsonl_nested_projection_prunes(spark, tmp_path):
    """Selecting one nested field must prune the read schema to that
    branch (meta.lang), not deserialize whole documents."""
    path = _write_corpus(tmp_path)
    clean, _ = read_jsonl(spark, path)
    langs = clean.select(F.col("meta.lang").alias("lang"))
    got = sorted(r["lang"] for r in langs.collect())
    assert got == ["de", "en", "fr"]
