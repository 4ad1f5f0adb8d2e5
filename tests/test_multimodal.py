"""Multimodal plumbing: schema, Arrow-batched mapInPandas shape, stubbed
decode determinism."""

import pytest

from python_etl_rest_api_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    media_stats,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30).cache()


def test_media_schema_roundtrip(spark, media, tmp_path):
    path = str(tmp_path / "media")
    media.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema["payload"].dataType.typeName() == "binary"
    assert back.count() == 30


def test_extract_features_shape(media):
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-6   # normalized histogram
        assert r["n_bytes"] >= 128


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b


def test_media_stats_no_decode(media):
    stats = {r["kind"]: r["n"] for r in media_stats(media).collect()}
    assert sum(stats.values()) == 30
    assert set(stats) == {"image", "audio", "video"}
