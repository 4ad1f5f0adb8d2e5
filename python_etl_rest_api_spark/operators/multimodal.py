"""Multimodal column plumbing (extension surface).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs. The Spark-side machinery - schema, partition sizing, Arrow-batched
mapInPandas transforms, batch shapes - is real and tested; the actual
codec work (image decode, resampling) is STUBBED deterministically because
media libraries are not in this container. Swap ``_decode_stub`` for a
Pillow/torchaudio call and nothing else changes.

Scale notes: binary payloads dominate partition size - size
spark.sql.files.maxPartitionBytes so a partition's decoded batch fits
executor memory; mapInPandas streams Arrow batches, never materializing a
partition at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed envelope for any media payload.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),       # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes([(i * 31 + j * 7) % 256 for j in range(128 + i)])
        rows.append((i, kind, f"application/x-fake-{kind}", payload,
                     (64, 48, None) if kind == "image" else (None, None, 1000 + i)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decoder: a deterministic 8-dim byte-histogram 'feature'.

    Real deployments replace this with the actual codec (PIL.Image.open /
    soundfile.read / pyav frame sampling). Raising NotImplementedError here
    would also be acceptable; a deterministic fake keeps the pipeline
    testable end to end.
    """
    if payload is None:
        return None
    hist = [0.0] * 8
    for b in payload:
        hist[b % 8] += 1.0
    total = max(len(payload), 1)
    return [h / total for h in hist]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas: the canonical
    decode/transform shape for binary columns. Batches stream through
    pandas; only (media_id, kind, n_bytes, feature) leave the executor."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else None),
                "feature": pdf["payload"].map(_decode_stub),
            })
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-native profile of a media table (no decode): per-kind counts
    and payload byte sizes - metadata queries must not touch payloads."""
    return (media.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.length("payload").cast("long")).alias("total_bytes"),
                 F.max(F.length("payload")).alias("max_bytes")))
