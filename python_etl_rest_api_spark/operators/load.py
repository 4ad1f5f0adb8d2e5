"""Sink semantics: insert-ignore, upsert, atomic writes (SURVEY.md section 2.B).

The reference loads MySQL with INSERT IGNORE (dim) and INSERT ... ON
DUPLICATE KEY UPDATE (fact) inside one transaction
(reference etl/03_transform_and_load.py:120-158). Without a transactional
store, the Spark-native equivalents are:

- B2 insert-ignore  = first-seen-wins dedup within the batch (window
  row_number over the stable _row_id) + left-anti join against existing
  keys + append.
- B3 upsert         = last-writer-wins dedup within the batch + existing
  rows NOT matched by key, unioned with the updates (full-outer-free:
  anti-join + union), written via stage-then-swap.
- B4 atomicity      = write to a staging dir, atomic rename into place.

At scale both key joins shuffle on the PK; the batch side is typically
small relative to the table, so the anti-join broadcasts the batch keys.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.csv_source import ROW_ID


def _dedup_by_key(batch: DataFrame, key: str, order_col: str,
                  keep: str = "first") -> DataFrame:
    """Keep one row per key: 'first' (insert-ignore) or 'last' (upsert)
    by order_col. One shuffle on the key."""
    order = F.col(order_col).asc() if keep == "first" else F.col(order_col).desc()
    w = Window.partitionBy(key).orderBy(order)
    return (batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def insert_ignore(existing: DataFrame | None, batch: DataFrame, key: str,
                  order_col: str = ROW_ID) -> DataFrame:
    """B2: first row per PK in batch order wins; rows whose PK already
    exists are dropped (reference etl/03_transform_and_load.py:125-131).

    Note the reference's order-dependence (SURVEY.md B2): dedup upstream is
    on the (company_id, company_name) PAIR but the PK is company_id alone,
    so 5 candidate rows -> 3 surviving PKs, 'first' = file order.
    """
    cols = [c for c in batch.columns if c != order_col]
    deduped = _dedup_by_key(batch, key, order_col, keep="first").select(*cols)
    if existing is None:
        return deduped
    new_rows = deduped.join(F.broadcast(existing.select(key)), key, "left_anti")
    return existing.select(*cols).unionByName(new_rows)


def upsert(existing: DataFrame | None, batch: DataFrame, key: str,
           order_col: str = ROW_ID) -> DataFrame:
    """B3: MERGE semantics - last writer per PK within the batch wins;
    matched existing rows are replaced, unmatched inserted
    (reference etl/03_transform_and_load.py:134-156)."""
    cols = [c for c in batch.columns if c != order_col]
    updates = _dedup_by_key(batch, key, order_col, keep="last").select(*cols)
    if existing is None:
        return updates
    kept = existing.select(*cols).join(
        F.broadcast(updates.select(key)), key, "left_anti")
    return kept.unionByName(updates)


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """B4: stage-then-swap parquet write - readers never observe a partial
    table (the reference's commit/rollback analogue,
    etl/03_transform_and_load.py:122,158,164)."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="._stage_", dir=parent)
    try:
        target = os.path.join(stage, "data")
        df.write.mode("overwrite").parquet(target)
        old = path + ".old" if os.path.exists(path) else None
        if old:
            os.rename(path, old)
        os.rename(target, path)
        if old:
            shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def write_history_csv(df: DataFrame, path: str) -> None:
    """B1: the reference persists clean/critical tiers as CSV history
    (etl/03_transform_and_load.py:101-105). Kept for byte-compat runs;
    parquet (atomic_overwrite) is the scale path."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None
