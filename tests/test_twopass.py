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


def test_property_random_frames_match_reference(spark):
    """Hypothesis-style adversarial coverage with ONE Spark job per
    case: random (value, weight) frames - heavy ties, negatives, zero
    weights, tiny and skewed sizes, varying partition counts - must
    match a pure-Python reference for both global row_number and the
    inclusive prefix sum."""
    import random

    rng = random.Random(20260814)
    for case in range(6):
        n = rng.choice([1, 2, 7, 64, 311])
        np_ = rng.choice([1, 3, 8, 50])
        rows = [(i, rng.randint(-3, 3), rng.randint(0, 10))
                for i in range(n)]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "k long, v long, w long") \
            .repartition(rng.choice([1, 5, 17]))
        got, n_rows, total = twopass.global_prefix(
            df, [F.desc("v"), F.asc("k")], sum_col="w",
            num_partitions=np_)
        ref = sorted(rows, key=lambda r: (-r[1], r[0]))
        exp_rank = {r[0]: i + 1 for i, r in enumerate(ref)}
        cum, exp_cum = 0, {}
        for r in ref:
            cum += r[2]
            exp_cum[r[0]] = cum
        assert n_rows == n and total == cum
        for r in got.select("k", twopass.ROW_COL,
                            twopass.SUM_COL).collect():
            assert r[twopass.ROW_COL] == exp_rank[r["k"]], (case, r)
            assert r[twopass.SUM_COL] == exp_cum[r["k"]], (case, r)


def test_detector_flags_global_window(spark, frame):
    """single_partition_window_ops must flag the antipattern and stay
    silent on the two-pass plan."""
    bad = frame.select(F.row_number().over(
        Window.orderBy("k")).alias("rn"))
    assert twopass.single_partition_window_ops(bad)
    good, _, _ = twopass.global_prefix(frame, [F.asc("k")])
    assert not twopass.single_partition_window_ops(good)
