"""operators/twopass.py: the distributed global rank / prefix sum must
be bit-identical to the single-partition window it replaces, on every
ordering direction, with ties, and on empty input."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators import twopass


@pytest.fixture(scope="module")
def frame(spark):
    # keys with duplicates in v (tie-break on k), several partitions
    rows = [(i, (i * 7919) % 97, ((i * 31) % 11) * 10) for i in range(500)]
    return spark.createDataFrame(rows, "k long, v long, w long") \
        .repartition(13)


def test_row_number_matches_global_window(spark, frame):
    order = [F.desc("v"), F.asc("k")]
    got, n_rows, _ = twopass.global_prefix(frame, order, num_partitions=7)
    exp = frame.select("k", F.row_number().over(
        Window.orderBy(*order)).alias("rn"))
    joined = got.select("k", twopass.ROW_COL).join(exp, "k")
    assert n_rows == 500
    assert joined.filter(
        F.col(twopass.ROW_COL) != F.col("rn")).count() == 0


def test_prefix_sum_matches_global_window(spark, frame):
    order = [F.asc("k")]
    got, n_rows, total = twopass.global_prefix(
        frame, order, sum_col="w", num_partitions=7)
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    exp = frame.select("k", F.sum("w").over(w).alias("cum"))
    joined = got.select("k", twopass.SUM_COL).join(exp, "k")
    assert joined.filter(
        F.col(twopass.SUM_COL) != F.col("cum")).count() == 0
    assert total == frame.agg(F.sum("w")).collect()[0][0]


def test_float_sum_col_rejected(spark, frame):
    with pytest.raises(ValueError, match="non-integral"):
        twopass.global_prefix(
            frame.withColumn("f", F.col("w") / 3), [F.asc("k")],
            sum_col="f")


def test_empty_input(spark, frame):
    empty = frame.filter(F.lit(False))
    got, n_rows, total = twopass.global_prefix(
        empty, [F.asc("k")], sum_col="w")
    assert got.count() == 0 and n_rows == 0 and total == 0


@pytest.mark.parametrize("n_rows,buckets", [(500, 5), (500, 10),
                                            (497, 10), (3, 10), (10, 10)])
def test_ntile_from_rank_matches_spark_ntile(spark, n_rows, buckets):
    df = spark.range(n_rows).select(F.col("id").alias("k"))
    exp = df.select("k", F.ntile(buckets).over(
        Window.orderBy("k")).alias("nt"))
    got, n, _ = twopass.global_prefix(df, [F.asc("k")], num_partitions=4)
    got = got.select("k", twopass.ntile_from_rank(
        twopass.ROW_COL, buckets, n).cast("int").alias("nt2"))
    assert n == n_rows
    assert got.join(exp, "k").filter(
        F.col("nt2") != F.col("nt")).count() == 0


def test_detector_flags_global_window(spark, frame):
    """single_partition_window_ops must flag the antipattern and stay
    silent on the two-pass plan."""
    bad = frame.select(F.row_number().over(
        Window.orderBy("k")).alias("rn"))
    assert twopass.single_partition_window_ops(bad)
    good, _, _ = twopass.global_prefix(frame, [F.asc("k")])
    assert not twopass.single_partition_window_ops(good)
