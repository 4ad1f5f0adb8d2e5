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


def test_wav_decode_real_roundtrip(spark):
    """The REAL codec path: stdlib wave encodes PCM16 payloads, the
    mapInPandas decoder reads header + frames back from the bytes."""
    import io
    import wave as wavmod

    from python_etl_rest_api_spark.operators.multimodal import (
        WAV_SAMPLE_RATE,
        decode_wav_features,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(spark, n=12).cache()
    # payloads are genuine WAV files the stdlib reader accepts
    payload = media.filter("media_id = 3").collect()[0]["payload"]
    with wavmod.open(io.BytesIO(bytes(payload))) as w:
        assert w.getframerate() == WAV_SAMPLE_RATE
        assert w.getnchannels() == 1
        assert w.getnframes() == 64 + 3

    rows = {r["media_id"]: r for r in decode_wav_features(media).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        nf = 64 + i
        assert r["sample_rate"] == WAV_SAMPLE_RATE
        assert r["n_channels"] == 1
        assert r["n_frames"] == nf
        assert r["duration_us"] == nf * 1_000_000 // WAV_SAMPLE_RATE
        # closed-form amplitude check against the synthesis formula
        samples = [(((i * 31 + j * 7) % 256) - 128) * 256 for j in range(nf)]
        assert r["peak_amplitude"] == max(abs(s) for s in samples)
        assert r["total_abs_amplitude"] == sum(abs(s) for s in samples)


def test_bmp_decode_real_roundtrip(spark):
    """The REAL image codec path: struct-encoded 24-bpp BMP payloads,
    the mapInPandas decoder parses header + padded pixel rows back from
    the bytes and its sums match the closed-form synthesis formula."""
    from python_etl_rest_api_spark.operators.multimodal import (
        decode_bmp_features,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(spark, n=10).cache()
    payload = bytes(media.filter("media_id = 4").collect()[0]["payload"])
    # genuine BMP: magic, 54-byte pixel offset, 24 bpp, row stride padded
    assert payload[:2] == b"BM"
    import struct as structmod
    off = structmod.unpack_from("<I", payload, 10)[0]
    w, h = structmod.unpack_from("<ii", payload, 18)
    bpp = structmod.unpack_from("<H", payload, 28)[0]
    assert (off, bpp) == (54, 24)
    assert (w, h) == (8 + 4 % 5, 6 + 4 % 3)
    assert len(payload) == 54 + ((w * 3 + 3) & ~3) * h

    rows = {r["media_id"]: r for r in decode_bmp_features(media).collect()}
    assert len(rows) == 10
    for i, r in rows.items():
        w, h = 8 + i % 5, 6 + i % 3
        px = [(i * 7 + x * 3 + y * 5) % 256
              for x in range(w) for y in range(h)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_blue"] == sum(px)
        assert r["sum_green"] == sum((v + 11) % 256 for v in px)
        assert r["sum_red"] == sum((v + 22) % 256 for v in px)
        assert r["peak_rgb"] == max(
            v + (v + 11) % 256 + (v + 22) % 256 for v in px)


def test_png_decode_real_roundtrip(spark):
    """The REAL compressed-image codec path: zlib-deflated PNG payloads
    with all five scanline filter types; the decoder walks chunks,
    inflates, reconstructs pixels through the filter inverses, and its
    sums match the closed-form synthesis formula."""
    import struct as structmod
    import zlib

    from python_etl_rest_api_spark.operators.multimodal import (
        decode_png_features,
        synthesize_png_media,
    )

    media = synthesize_png_media(spark, n=10).cache()
    payload = bytes(media.filter("media_id = 4").collect()[0]["payload"])
    # genuine PNG: signature, IHDR geometry, valid chunk CRCs, and the
    # scanline filters actually cycle through all five spec types
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert payload[12:16] == b"IHDR"
    w, h = structmod.unpack_from(">II", payload, 16)
    assert (w, h) == (8 + 4 % 5, 6 + 4 % 3)
    pos, idat = 8, b""
    while pos < len(payload):
        (length,) = structmod.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        crc = structmod.unpack_from(">I", payload, pos + 8 + length)[0]
        assert zlib.crc32(ctype + data) & 0xFFFFFFFF == crc
        if ctype == b"IDAT":
            idat += data
        pos += 12 + length
    flat = zlib.decompress(idat)
    filters = [flat[y * (w * 3 + 1)] for y in range(h)]
    assert filters == [y % 5 for y in range(h)]

    rows = {r["media_id"]: r for r in decode_png_features(media).collect()}
    assert len(rows) == 10
    for i, r in rows.items():
        w, h = 8 + i % 5, 6 + i % 3
        px = [(i * 7 + x * 3 + y * 5) % 256
              for x in range(w) for y in range(h)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_red"] == sum(px)
        assert r["sum_green"] == sum((v + 11) % 256 for v in px)
        assert r["sum_blue"] == sum((v + 22) % 256 for v in px)
        assert r["peak_rgb"] == max(
            v + (v + 11) % 256 + (v + 22) % 256 for v in px)


def test_png_decoder_rejects_non_png(spark):
    import pytest as _pytest

    from python_etl_rest_api_spark.operators.multimodal import _decode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"BM" + bytes(64))
