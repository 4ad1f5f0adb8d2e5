"""Physical-layout scale posture: partition pruning on partitioned
parquet, and bucketed joins running with zero shuffle exchanges."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.plans import explain
from python_etl_rest_api_spark.sources import warehouse

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return (spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .withColumn("o_year", F.year("o_orderdate")))


def test_partition_pruning_skips_directories(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    warehouse.write_partitioned(orders, path, ["o_year"])

    full = spark.read.parquet(path)
    years = sorted(r.o_year for r in full.select("o_year").distinct().collect())
    assert len(years) > 1

    one = full.filter(F.col("o_year") == years[0])
    # the partition filter must appear at the scan, not as a post-filter
    plan = explain.physical_plan(one)
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines and any("o_year" in ln for ln in scan_lines)
    # and pruning must actually skip files: every file read is from the
    # matching directory
    files = {r.f for r in one.select(
        F.input_file_name().alias("f")).distinct().collect()}
    assert files and all(f"o_year={years[0]}" in f for f in files)
    # correctness: pruned read equals post-filter on the unpartitioned source
    assert one.count() == orders.filter(F.col("o_year") == years[0]).count()


def test_bucketed_join_has_zero_shuffles(spark, orders, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("buck"))
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    warehouse.write_bucketed(orders.drop("o_year"), "t_orders_b",
                             f"{base}/orders", "o_custkey", 8)
    warehouse.write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "t_customer_b",
        f"{base}/customer", "o_custkey", 8)
    try:
        # force a non-broadcast join so co-location is what's being tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (warehouse.read_table(spark, "t_orders_b")
             .join(warehouse.read_table(spark, "t_customer_b"), "o_custkey")
             .groupBy("c_name")
             .agg(F.count(F.lit(1)).alias("n")))
        j.collect()
        plan = explain.simple_plan(j)
        assert "SortMergeJoin" in plan
        # bucketed co-location: the join itself needs no exchange; the only
        # allowed shuffle is the groupBy on the non-bucket key
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning" not in join_part
        # and the unbucketed twin DOES shuffle both sides (the cost we saved)
        plain = (orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"))
        plain.collect()
        assert explain.shuffle_count(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")
