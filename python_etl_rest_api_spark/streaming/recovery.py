"""Restart recovery + exactly-once sink semantics.

Structured Streaming's delivery contract is exactly-once END TO END
only when the source replays from checkpointed offsets AND the sink is
idempotent under micro-batch replay: after a crash, the last in-flight
batch is REDELIVERED with the SAME batch_id, so a sink that blindly
appends produces duplicates exactly at failure points (the bug that
passes every clean-run test and corrupts data in production).

The pattern here is the standard one: partition the output by
``batch_id`` and make each batch's write an OVERWRITE of its own
partition - replaying batch N rewrites directory ``batch_id=N``
byte-for-byte instead of appending a second copy. Readers see
at-most-one copy of every batch at all times; the checkpoint guarantees
at-least-once delivery; together: exactly once.

At 100 TB/day the same pattern holds with a transactional target
instead of directories: land each batch via operators/load.merge_jdbc
keyed on (batch_id, pk), or a MERGE into a lakehouse table - the
idempotence always comes from keying the write on batch_id, never from
hoping the crash window is small. Verified under a real
stop-grow-restart sequence (and a forced same-batch replay) in
tests/test_stream_recovery.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def write_batch_idempotent(batch_df: DataFrame, batch_id: int,
                           path: str) -> None:
    """Land one micro-batch as an overwrite of its own batch_id
    partition - safe to call any number of times with the same
    (batch contents, batch_id): replays rewrite, never duplicate."""
    batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def exactly_once_parquet_sink(stream: DataFrame,
                              path: str) -> DataStreamWriter:
    """foreachBatch writer landing every micro-batch through
    :func:`write_batch_idempotent`. Caller supplies the checkpoint
    location and trigger, exactly like the other streaming sinks."""
    return stream.writeStream.foreachBatch(
        lambda batch_df, batch_id:
        write_batch_idempotent(batch_df, batch_id, path))
