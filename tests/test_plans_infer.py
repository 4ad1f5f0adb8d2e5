"""Plan-shape + invariant tests for the catalog_infer entries: the
partition-pruned scan really prunes, the rank statistic never builds a
single-partition window, the chi-square cells satisfy their exact
rational identity, and the sketches/classifiers keep their contracts."""

from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog_infer import (
    basket_association_lift,
    embed_knn_classify,
    embed_outlier_prune,
    graph_kcore_decomposition,
    privacy_dp_counts,
    privacy_k_anonymity,
    layout_partition_pruning,
    sketch_kmv_distinct,
    source_parquet_mergeschema,
    stats_acf_daily,
    stats_chi2_independence,
    stats_mannwhitney_u,
    stream_dedup_ingest,
    text_collocations_pmi,
)
from python_etl_rest_api_spark.operators.twopass import (
    single_partition_window_ops,
)
from python_etl_rest_api_spark.plans.explain import (
    physical_plan,
    uses_broadcast_join,
)

SF = "/root/testdata/sf0.001"


def test_partition_pruning_reaches_scan(spark):
    df = layout_partition_pruning(spark, SF)
    plan = physical_plan(df)
    # the read must carry partition filters on the hive partition column
    assert "PartitionFilters: [" in plan
    i = plan.index("PartitionFilters: [")
    assert "event_date" in plan[i:i + 200]
    rows = df.collect()
    assert 1 <= len(rows) <= 3
    assert all(r["n_events"] > 0 for r in rows)


def test_mannwhitney_no_global_window_and_identity(spark):
    df = stats_mannwhitney_u(spark, SF)
    assert single_partition_window_ops(df) == []
    r = df.collect()[0]
    # U_A + U_B == n_a * n_b (doubled on both sides)
    assert r["u_a_x2"] + r["u_b_x2"] == 2 * r["n_a"] * r["n_b"]
    # rank sum bounds: n(n+1) <= 2R_A <= (n_a+n_b)(n_a+n_b+1)
    n = r["n_a"] + r["n_b"]
    assert r["n_a"] * (r["n_a"] + 1) <= r["r_a_x2"] <= n * (n + 1)


def test_chi2_cells_exact_identity(spark):
    df = stats_chi2_independence(spark, SF)
    assert uses_broadcast_join(df)
    rows = df.collect()
    n_total = rows[0]["n_total"]
    assert sum(r["o_cnt"] for r in rows) == n_total
    for r in rows:
        diff = r["o_cnt"] * n_total - r["row_total"] * r["col_total"]
        assert int(r["chi2_num"]) == diff * diff
        assert int(r["chi2_den"]) == (r["row_total"] * r["col_total"]
                                      * n_total)


def test_acf_bounds(spark):
    rows = stats_acf_daily(spark, SF).collect()
    assert {r["lag"] for r in rows} == {1, 2, 3}
    dens = {r["den_scaled"] for r in rows}
    assert len(dens) == 1  # denominator is lag-independent
    for r in rows:
        # Cauchy-Schwarz over the (subset) pair sums
        assert abs(r["num_scaled"]) <= r["den_scaled"]


def test_kmv_estimate_brackets_truth(spark):
    df = sketch_kmv_distinct(spark, SF)
    assert "TakeOrderedAndProject" in physical_plan(df)
    r = df.collect()[0]
    assert r["k_used"] >= 1 and r["kth_hash"] > 0
    if r["k_used"] == 64:  # sketch saturated: estimate is meaningful
        assert 0.4 * r["true_distinct"] <= r["est_distinct"] \
            <= 2.5 * r["true_distinct"]
    else:  # fewer distincts than k: bottom-k holds the whole universe
        assert r["k_used"] == r["true_distinct"]


def test_knn_one_prediction_per_query(spark):
    total = (embed_knn_classify(spark, SF)
             .agg(F.sum("n").alias("t")).collect()[0]["t"])
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_queries = emb.filter(F.col("vec_id") % 10 == 0).count()
    assert total == n_queries


def test_pmi_contract(spark):
    rows = text_collocations_pmi(spark, SF).collect()
    assert 0 < len(rows) <= 50
    scores = [r["pmi_ratio_micros"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["c_xy"] >= 5
        assert r["c_x"] >= r["c_xy"] and r["c_y"] >= r["c_xy"]


def test_lift_contract(spark):
    rows = basket_association_lift(spark, SF).collect()
    for r in rows:
        assert r["n_ab"] >= 3
        assert r["conf_a_to_b_micros"] <= 1000000  # confidence <= 1
        assert r["n_a"] >= r["n_ab"] and r["n_b"] >= r["n_ab"]


def test_mergeschema_loses_nothing(spark):
    rows = source_parquet_mergeschema(spark, SF).collect()
    names = {r["priority"] for r in rows}
    assert "<pre-evolution>" in names and len(names) > 1
    n = sum(r["n_orders"] for r in rows)
    assert n == spark.read.parquet(f"{SF}/orders.parquet") \
                   .filter(F.col("o_orderkey").isNotNull()).count()


def test_kcore_symmetric_degrees(spark):
    rows = graph_kcore_decomposition(spark, SF).collect()
    # symmetric edge restriction keeps the graph undirected: the
    # degree sum counts each surviving edge twice
    assert sum(r["deg"] for r in rows) % 2 == 0
    assert all(r["deg"] >= 1 for r in rows)


def test_k_anonymity_generalization_monotone(spark):
    by_level = {r["level"]: r
                for r in privacy_k_anonymity(spark, SF).collect()}
    l0, l1 = by_level[0], by_level[1]
    # nation -> region generalization merges classes, never splits:
    # fewer classes, and every level-1 at-risk row was at risk at 0
    assert l1["n_classes"] <= l0["n_classes"]
    assert l1["rows_at_risk"] <= l0["rows_at_risk"]
    assert l0["at_risk_classes"] <= l0["n_classes"]


def test_dp_counts_noise_bounded_and_clamped(spark):
    for r in privacy_dp_counts(spark, SF).collect():
        assert -10 <= r["noise"] <= 10
        assert r["released_count"] == max(r["true_count"] + r["noise"], 0)


def test_outlier_prune_takes_decile_per_label(spark):
    from python_etl_rest_api_spark.operators import similarity
    pruned = {}
    for r in embed_outlier_prune(spark, SF).collect():
        pruned[r["label"]] = pruned.get(r["label"], 0) + 1
    emb = similarity.valid_vectors(
        spark.read.parquet(f"{SF}/embeddings.parquet"), dim=64).filter(
        F.col("label").isNotNull() & F.col("vec_id").isNotNull()).filter(
        ~F.exists("embedding", lambda v: v.isNull()))
    per_label = {r["label"]: r["n"] for r in
                 emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    for label, n in per_label.items():
        assert pruned.get(label, 0) == (n + 9) // 10


def test_stream_dedup_bounded_by_raw(spark):
    dedup = {r["event_type"]: r["n_unique"]
             for r in stream_dedup_ingest(spark, SF).collect()}
    raw = {r["event_type"]: r["n"]
           for r in spark.read.parquet(f"{SF}/events.parquet")
           .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    for et, n in dedup.items():
        assert 0 < n <= raw[et]
