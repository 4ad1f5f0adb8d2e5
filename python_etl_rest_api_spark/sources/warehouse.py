"""Warehouse layout operators: date/key-partitioned writes (partition
pruning) and bucketed tables (shuffle-free co-located joins).

The reference persists flat CSVs only (etl/03_transform_and_load.py:101-105)
and delegates physical layout to MySQL; at 100 TB layout IS the query plan:

- partitioning by a low-cardinality derived key (e.g. year) turns the
  reference's date filters (readme.md:156-162, SURVEY.md D5/D6) into
  directory pruning - the scan never opens non-matching partitions;
- bucketing both sides of a recurring equi-join on the join key removes
  the per-query shuffle entirely: rows are already co-located by bucket,
  so a sort-merge join runs with ZERO exchanges - the single biggest
  repeated-cost win for a fact-fact join run daily at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Write parquet hive-partitioned by ``partition_cols`` (directory per
    value; keep cardinality low - every distinct tuple is a directory)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, path: str, bucket_col: str,
                   n_buckets: int, mode: str = "overwrite") -> None:
    """Persist as an external bucketed table (hash(bucket_col) % n_buckets
    files per partition, sorted within buckets so merge joins skip the
    sort too). Both join sides must use the same n_buckets."""
    (df.write.mode(mode)
       .bucketBy(n_buckets, bucket_col)
       .sortBy(bucket_col)
       .option("path", path)
       .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
