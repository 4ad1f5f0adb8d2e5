"""JSONL (newline-delimited JSON) document source - the de-facto
interchange format for LLM training corpora (one document object per
line, nested metadata).

Extension beyond the reference's CSV-only surface (SURVEY.md A1/A2 are
CSV; the reference has no JSON ingestion). Design choices for scale:

- EXPLICIT schema, never inference: schema inference on JSON is a full
  extra pass over the data and samples nondeterministically at scale.
- PERMISSIVE mode with a captured ``_corrupt_record`` column: a corpus
  crawl always contains some malformed lines; failing the job
  (FAILFAST) or silently dropping them (DROPMALFORMED) both lose
  information. The reader returns (clean, quarantined) the same way the
  ETL clean pipeline splits critical rows - corrupt lines stay
  auditable.
- Nested metadata stays a struct column (no flattening scan): project
  fields on demand so column pruning reaches the scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class JsonlRead:
    """Result of :func:`read_jsonl`. Iterable as ``(clean, quarantined)``
    for tuple unpacking; call :meth:`unpersist` when done with both
    splits - the corrupt-capture filter forces the raw frame into the
    executor cache, and a long-lived session that reads many corpora
    would otherwise accumulate cached scans (r4 advice)."""

    clean: DataFrame
    quarantined: DataFrame
    raw: DataFrame

    def __iter__(self) -> Iterator[DataFrame]:
        return iter((self.clean, self.quarantined))

    def unpersist(self, blocking: bool = False) -> None:
        self.raw.unpersist(blocking)

# The canonical LLM-corpus document envelope: id, text, metadata.
DOC_JSONL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("quality", T.DoubleType(), True),
    ]), True),
    T.StructField(CORRUPT_COL, T.StringType(), True),
])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOC_JSONL_SCHEMA
               ) -> JsonlRead:
    """Read a JSONL corpus with an explicit schema; returns a
    :class:`JsonlRead` (unpacks as ``(clean, quarantined)``). A line
    lands in ``quarantined`` (with its raw text in ``_corrupt_record``)
    when the parser cannot produce a fully-typed row from it: malformed
    JSON, but ALSO well-formed JSON whose fields fail the explicit
    schema's types (PERMISSIVE mode captures both - a crawl shard where
    a producer switched ``doc_id`` to a string quarantines exactly like
    a truncated line). Spark requires the corrupt-capture column to be
    part of the schema and the frame to be cached/materialized before
    filtering on it (the parser only populates it during the scan);
    call ``.unpersist()`` on the result once both splits are consumed
    to release the executor cache."""
    raw = (spark.read.schema(schema)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", CORRUPT_COL)
           .json(path)).cache()
    clean = (raw.filter(F.col(CORRUPT_COL).isNull())
             .drop(CORRUPT_COL))
    quarantined = raw.filter(F.col(CORRUPT_COL).isNotNull()) \
        .select(CORRUPT_COL)
    return JsonlRead(clean, quarantined, raw)
