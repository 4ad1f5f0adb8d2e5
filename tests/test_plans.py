"""Plan-shape assertions: the 100 TB design invariants. A query that is
correct but has the wrong plan (no pushdown, shuffled dim join, pruning
lost) fails HERE, not in production."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog import (
    d4b_threshold_filter,
    d5_view_date_eq,
    h1_daily_totals,
    i1_join_inner,
)
from python_etl_rest_api_spark.plans.explain import (
    has_pushed_filter,
    read_schema_columns,
    shuffle_count,
    uses_broadcast_join,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushed_to_scan(spark):
    df = d4b_threshold_filter(spark, SF)
    assert has_pushed_filter(df, "o_totalprice")


def test_column_pruning_reaches_scan(spark):
    df = i1_join_inner(spark, SF)
    cols = set(read_schema_columns(df))
    # only the 3 projected + join key columns may be read
    assert cols <= {"o_orderkey", "o_custkey", "o_totalprice",
                    "c_custkey", "c_name"}
    assert "o_orderpriority" not in cols


def test_dim_join_broadcasts(spark):
    df = h1_daily_totals(spark, SF)
    assert uses_broadcast_join(df)
    # broadcast join + partial/final aggregation: exactly ONE shuffle
    # (on the group keys); the fact side is never exchanged for the join
    assert shuffle_count(df) == 1


def test_group_key_filter_pushes_below_aggregate(spark):
    df = d5_view_date_eq(spark, SF)
    # the date filter must reach the orders scan as a pushed filter
    assert has_pushed_filter(df, "o_orderdate")


def test_scan_agg_stays_in_codegen(spark):
    from python_etl_rest_api_spark.catalog_ext import q1_pricing_summary
    from python_etl_rest_api_spark.plans.explain import codegen_stage_count
    df = q1_pricing_summary(spark, SF)
    assert codegen_stage_count(df) >= 1


def test_extension_paths_never_go_cartesian(spark):
    """The scale-path extension operators must stay banded/bucketed
    equi-joins: a regression to CartesianProduct / BroadcastNestedLoopJoin
    is quadratic at 100 TB. (sim_cosine_near_dups and
    text_levenshtein_pairs are intentionally-bounded brute-force BASELINES
    with explicit max_id/blocking guards - they are excluded here.)"""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.plans.explain import simple_plan
    scale_paths = ["dedup_minhash_lsh", "dedup_simhash", "sim_topk_ann_srp",
                   "sim_topk_ann_ivf", "join_asof_attribution",
                   "join_time_band", "dedup_exact", "stream_sessionize",
                   "pipeline_docs_curate"]
    for name in scale_paths:
        plan = simple_plan(registry.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, f"{name} went cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} uses BNLJ"


def test_text_op_shuffle_budgets(spark):
    """Narrow text ops must stay shuffle-free (pure map stages at 100 TB);
    sequence packing is allowed exactly its ONE running-sum window
    exchange on the group key."""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.plans.explain import shuffle_count
    for name, budget in [("text_chunk_windows", 0), ("text_redact_pii", 0),
                         ("text_token_count", 0), ("text_quality_score", 0),
                         ("text_language_id", 0), ("text_fingerprint", 0),
                         ("text_pack_sequences", 1)]:
        n = shuffle_count(registry.QUERIES[name](spark, SF))
        assert n == budget, f"{name}: {n} shuffles, budget {budget}"


def test_clean_pipeline_parses_once(spark):
    """The tier filters must reference the critical flag AS A COLUMN, not
    re-inline its defining lenient-cast/3-format-parse chain (the
    non-deterministic pin in flag_critical). A regression here silently
    doubles the narrow CPU cost of the whole ETL pipeline - the dominant
    term at 100 TB. Checked on BOTH tiers of the scaled instance."""
    from python_etl_rest_api_spark.catalog_etl import (
        etl_clean_scaled,
        etl_critical_scaled,
    )
    from python_etl_rest_api_spark.plans.explain import physical_plan
    for fn in (etl_clean_scaled, etl_critical_scaled):
        plan = physical_plan(fn(spark, SF))
        blocks = [b for b in plan.split("\n\n")
                  if b.startswith("(") and "Filter" in b.splitlines()[0]]
        assert blocks, "expected at least one Filter node"
        for b in blocks:
            assert "gettimestamp" not in b, (
                "timestamp-parse chain re-inlined into a filter:\n" + b[:500])
            assert "md5" not in b, (
                "derivation chain re-inlined into a filter:\n" + b[:500])


def test_pipe_wave_plan_shapes(spark):
    """Round-4 corpus-hygiene wave invariants: the containment and
    repeated-span paths stay equi-join/bucketed (no quadratic node),
    and dq_rules_summary reads each fact table exactly once (the whole
    point of stacking N rules into one conditional aggregate)."""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.plans.explain import simple_plan
    for name in ["dedup_containment", "dedup_repeated_spans",
                 "events_resample_gapfill", "sample_weighted_systematic",
                 "events_mad_outliers", "orders_wow_change"]:
        plan = simple_plan(registry.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, f"{name} went cartesian"
        # resample's grid side legitimately crossJoins a broadcast
        # 1-row (lo, hi) bounds aggregate against |types| rows; any
        # OTHER nested-loop is a regression.
        if name != "events_resample_gapfill":
            assert "BroadcastNestedLoopJoin" not in plan, f"{name} BNLJ"

    dq = registry.QUERIES["dq_rules_summary"](spark, SF)
    plan = simple_plan(dq)
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned >1x"
    assert plan.count("orders.parquet") == 1, "orders scanned >1x"


def test_materialized_split_restores_pushdown(spark, tmp_path):
    """flag_critical's non-determinism pin blocks ALL pushdown through
    the in-plan split (the measured parse-once trade). The materialized
    split must give that back: its re-read tiers start at a plain
    parquet scan, so a post-split date filter (and any other column
    filter) reaches the scan as a pushed filter, with the tier flag
    handled by partition pruning."""
    from python_etl_rest_api_spark.catalog_etl import (
        _ETL_FORMATS,
        _scaled_raw_df,
    )
    from python_etl_rest_api_spark.operators.clean import (
        split_critical,
        split_critical_materialized,
        standardize,
    )
    staged = standardize(_scaled_raw_df(spark, SF), _ETL_FORMATS)
    clean, critical = split_critical_materialized(
        staged, str(tmp_path / "silver"))
    dated = clean.filter(F.col("created_at") >= "1995-06-01")
    assert has_pushed_filter(dated, "created_at")
    by_company = critical.filter(F.col("company_id") == "c1")
    assert has_pushed_filter(by_company, "company_id")
    # same rows as the in-plan split (order-insensitive)
    in_clean, in_crit = split_critical(staged)
    assert clean.count() == in_clean.count()
    assert critical.count() == in_crit.count()
    # and the documented contrast: the pinned in-plan tier does NOT push
    assert not has_pushed_filter(
        in_clean.filter(F.col("created_at") >= "1995-06-01"), "created_at")


def test_global_ranks_have_no_single_partition_window(spark):
    """The four entries the r4 verdict called out as scale-killers now
    rank via the two-pass scheme (operators/twopass.py): no Window in
    their plans may sit on an Exchange SinglePartition. Exception: the
    Lorenz entry's final cumulative share runs over its own 10-row
    decile aggregate - bounded by construction - so only its
    row_number (the customer-grain rank) is asserted parallel."""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.operators.twopass import (
        single_partition_window_ops,
    )
    for name in ["sample_weighted_systematic", "ntile_customer_deciles",
                 "orders_rfm_segments", "skew_key_profile",
                 "stats_ks_drift"]:
        hits = single_partition_window_ops(registry.QUERIES[name](spark, SF))
        assert not hits, f"{name}: single-partition window(s): {hits}"
    df = registry.QUERIES["orders_revenue_concentration"](spark, SF)
    for h in single_partition_window_ops(df):
        assert "row_number" not in h, f"customer rank went serial: {h}"


def test_bucketed_join_is_shuffle_free(spark):
    """The storage-layout join strategy: bucketed writes pre-pay the
    exchange, so the join AND the per-key aggregate must run with zero
    shuffles, via SortMergeJoin fed by the bucketed scans."""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.plans.explain import simple_plan
    df = registry.QUERIES["layout_bucketed_join"](spark, SF)
    assert shuffle_count(df) == 0
    plan = simple_plan(df)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_bpe_encode_is_a_pure_map(spark):
    """Applying a learned merge table must stay a zero-shuffle narrow
    map over the corpus (the training loop runs jobs; the encode must
    not) reading only the referenced columns."""
    from python_etl_rest_api_spark import registry
    df = registry.QUERIES["text_bpe_encode"](spark, SF)
    assert shuffle_count(df) == 0
    assert not uses_broadcast_join(df)
    assert set(read_schema_columns(df)) <= {"doc_id", "text"}


def test_gopher_gate_is_a_pure_map(spark):
    """The quality gate must stay a zero-exchange narrow projection —
    at 100 TB it runs embedded in the corpus scan."""
    from python_etl_rest_api_spark.catalog_quality import text_gopher_rules
    df = text_gopher_rules(spark, SF)
    assert shuffle_count(df) == 0
    assert not uses_broadcast_join(df)
    # only the two referenced columns may be read from the corpus
    assert set(read_schema_columns(df)) <= {"doc_id", "text"}


def test_unigram_lm_broadcasts_vocab(spark):
    """The token->logprob join must broadcast the vocabulary, never
    shuffle the token stream for the join; the only hash exchanges are
    the vocab count and the per-doc aggregate."""
    from python_etl_rest_api_spark.catalog_quality import (
        text_unigram_logprob)
    df = text_unigram_logprob(spark, SF)
    assert uses_broadcast_join(df)
    assert shuffle_count(df) <= 3


def test_gram_matrix_shuffles_cells_not_rows(spark):
    """Partial-Gram aggregation: the only exchange carries (i, j,
    partial) cells — O(partitions x d^2), independent of row count —
    and the scan reads just the vector column."""
    from python_etl_rest_api_spark.catalog_quality import embed_gram_matrix
    df = embed_gram_matrix(spark, SF)
    assert shuffle_count(df) == 1
    assert read_schema_columns(df) == ["embedding"]


def test_dsir_scoring_broadcasts_ratio_table(spark):
    """DSIR importance scoring: the per-token bucket join must
    broadcast the 256-row log-ratio table - the corpus never shuffles
    for the join; the only hash exchanges are the two bucket-count
    aggregates and the per-doc aggregate."""
    from python_etl_rest_api_spark import registry
    df = registry.QUERIES["dsir_importance_weights"](spark, SF)
    assert uses_broadcast_join(df)
    assert set(read_schema_columns(df)) <= {"doc_id", "source", "text"}


def test_semdedup_pairs_shuffle_on_cluster_only(spark):
    """SemDeDup's structural claim: no cartesian product anywhere (the
    within-cluster self-join is an equi-join on cid), and the centroid
    assignment is a zero-shuffle broadcast matmul (no join for it)."""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.plans.explain import simple_plan
    df = registry.QUERIES["dedup_semantic_clusters"](spark, SF)
    plan = simple_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_spreads_hot_key(spark):
    """The salted join must actually spread the pathological key: the
    hot key's rows must land in every salt bucket, and the join must
    be an equi-join on (key, salt) - never a broadcast of the fact."""
    from pyspark.sql import functions as FF
    from python_etl_rest_api_spark.operators.skew import salted_join
    o = spark.read.parquet(f"{SF}/orders.parquet")
    fact = o.select(
        FF.when(FF.col("o_orderkey") % 100 != 0, FF.lit(1))
        .otherwise(FF.col("o_custkey")).cast("long").alias("c_custkey"),
        "o_totalprice")
    dim = spark.read.parquet(f"{SF}/customer.parquet") \
        .select("c_custkey", "c_mktsegment")
    salt_counts = (salted_join(fact, dim, "c_custkey", buckets=8)
                   .groupBy().agg(FF.count(FF.lit(1))).collect())
    # row fidelity is asserted value-level by the oracle; here assert
    # the salt actually fans the hot key across buckets pre-join
    salted = fact.withColumn(
        "_salt", FF.pmod(FF.xxhash64(*[FF.col(c) for c in fact.columns]),
                         FF.lit(8)))
    n_buckets = (salted.filter(FF.col("c_custkey") == 1)
                 .select("_salt").distinct().count())
    assert n_buckets == 8, f"hot key only reached {n_buckets}/8 buckets"


def test_compaction_plan_windows_stay_parallel(spark):
    """The compaction planner is metadata-only and must keep its
    running-sum window partitioned by day - no Exchange
    SinglePartition under any Window."""
    from python_etl_rest_api_spark import registry
    from python_etl_rest_api_spark.operators.twopass import (
        single_partition_window_ops,
    )
    df = registry.QUERIES["layout_compaction_plan"](spark, SF)
    assert not single_partition_window_ops(df)
    assert set(read_schema_columns(df)) <= {"ts", "event_type", "props"}


def test_interval_overlap_is_equi_join(spark):
    """The interval-overlap join must execute as an equi-join on
    (customer, week-bucket) - never a cartesian/BNLJ range probe."""
    from python_etl_rest_api_spark import catalog_iter as ci
    from python_etl_rest_api_spark.plans.explain import simple_plan
    plan = simple_plan(ci.join_interval_overlap(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_probe_is_equi_join(spark, tmp_path):
    """Band-index probe: candidates come from an equi-join on
    (band_id, band_key); no all-pairs product anywhere."""
    from pyspark.sql import functions as F2
    from python_etl_rest_api_spark.operators import dedup
    from python_etl_rest_api_spark.plans.explain import simple_plan
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.filter(F2.col("doc_id") % 5 != 0)
    batch = docs.filter(F2.col("doc_id") % 5 == 0)
    path = str(tmp_path / "bandidx_plan")
    dedup.build_band_index(corpus, path)
    plan = simple_plan(
        dedup.probe_band_index(spark, path, batch, corpus))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_iteration_broadcasts_ranks(spark):
    """Each PageRank round must broadcast the node-sized rank table,
    never shuffle the edge list for the join; the only exchanges are
    the per-round dst aggregations."""
    from python_etl_rest_api_spark.operators import graph
    from python_etl_rest_api_spark.plans.explain import simple_plan
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = graph.copurchase_edges(li).localCheckpoint()
    plan = simple_plan(graph.pagerank_int(edges, iters=3))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_schema_drift_union_prunes_both_scans(spark):
    """Each generation's scan must read only its own columns."""
    from python_etl_rest_api_spark import catalog_iter as ci
    from python_etl_rest_api_spark.plans.explain import read_schema_columns
    cols = set(read_schema_columns(ci.schema_drift_union(spark, SF)))
    assert "o_orderstatus" in cols and "o_totalprice" in cols
    # neither branch may drag the full table: only the 5 output columns
    assert cols <= {"o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderstatus", "o_orderdate"}


def test_url_canonicalize_is_pure_map(spark):
    """URL canonicalization must be a zero-shuffle JVM map stage."""
    from python_etl_rest_api_spark import catalog_iter as ci
    from python_etl_rest_api_spark.plans.explain import (
        shuffle_count, simple_plan)
    df = ci.docs_url_canonicalize(spark, SF)
    assert shuffle_count(df) == 0
    assert "BatchEvalPython" not in simple_plan(df)


def test_widen_scan_counts_row_groups_not_reported_splits(spark, tmp_path):
    """Parquet splits cannot cross row-group boundaries: a 2-file /
    1-row-group-each table runs 2 real tasks no matter how many
    byte-range splits the planner reports (the 100x corpus measured
    32 reported / 2 non-empty, which silenced the old
    getNumPartitions()-based gate exactly where widening was needed —
    dedup_minhash_lsh 18.5 -> 85 s). The gate must see TRUE units."""
    from python_etl_rest_api_spark.session import (
        _scan_shape,
        widen_scan,
    )

    path = str(tmp_path / "coarse")
    spark.range(200_000).selectExpr(
        "id", "repeat('x', 64) AS pad").repartition(2) \
        .write.parquet(path)
    df = spark.read.parquet(path)
    cores = spark.sparkContext.defaultParallelism
    units, nbytes = _scan_shape(df, cores)
    assert units == 2              # row groups, not reported splits
    assert nbytes and nbytes > 0
    widened = widen_scan(df)
    assert widened.rdd.getNumPartitions() == cores


def test_widen_scan_size_veto_leaves_big_scans_alone(spark, tmp_path, monkeypatch):
    """Widening re-materializes the whole scan; above _WIDEN_MAX_BYTES
    the idle cores are cheaper than the extra pass (q21's 880 MB
    join-feeding lineitem scan measured 13.3 -> 20.5 s widened)."""
    from python_etl_rest_api_spark import session as S

    path = str(tmp_path / "big")
    spark.range(50_000).selectExpr("id").repartition(2).write.parquet(path)
    df = spark.read.parquet(path)
    monkeypatch.setattr(S, "_WIDEN_MAX_BYTES", 1)   # everything is "big"
    assert S.widen_scan(df) is df                   # untouched
    monkeypatch.setattr(S, "_WIDEN_MAX_BYTES", 1 << 40)
    assert S.widen_scan(df) is not df               # small again -> widened


def test_widen_scan_non_file_frames_fall_back_to_partition_count(spark):
    """Frames with no file source (createDataFrame/range) must use the
    reported partition count, not crash on footer inspection."""
    from python_etl_rest_api_spark.session import _scan_shape, widen_scan

    cores = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000, numPartitions=2)
    units, nbytes = _scan_shape(narrow, cores)
    assert units == 2 and nbytes is None
    assert widen_scan(narrow).rdd.getNumPartitions() == cores
    wide = spark.range(1000, numPartitions=cores)
    assert widen_scan(wide) is wide

def test_widen_scan_counts_compressed_files_at_inflated_size(
        spark, tmp_path, monkeypatch):
    """r8 advice: the size veto sums ON-DISK bytes, so a non-splittable
    gzip inflating to multi-GB passed the 256 MB gate and widen_scan
    re-materialized the whole decompressed scan. Compressed non-parquet
    inputs now count at _COMPRESSED_RATIO x their disk size."""
    import gzip
    import os

    from python_etl_rest_api_spark import session as S

    path = tmp_path / "docs.csv.gz"
    with gzip.open(path, "wt") as f:
        f.write("id,val\n")
        for i in range(5000):
            f.write(f"{i},{'x' * 40}\n")
    df = spark.read.option("header", True).csv(str(path))
    units, nbytes = S._scan_shape(df, spark.sparkContext.defaultParallelism)
    assert units == 1                       # non-splittable: one task
    disk = os.path.getsize(path)
    assert nbytes == disk * S._COMPRESSED_RATIO
    # veto: inflated estimate above the cap -> no widen even though the
    # scan is 1 split on 32 cores
    monkeypatch.setattr(S, "_WIDEN_MAX_BYTES", disk * S._COMPRESSED_RATIO - 1)
    assert S.widen_scan(df) is df
    # genuinely small compressed file -> still widened
    monkeypatch.setattr(S, "_WIDEN_MAX_BYTES", disk * S._COMPRESSED_RATIO + 1)
    assert S.widen_scan(df) is not df


def test_minhash_verify_intersects_once(spark):
    """r12: the LSH verify evaluates array_intersect ONCE per candidate
    pair. filter(jaccard >= t) over the projected column would let
    PushPredicateThroughNonJoin substitute the alias into the predicate
    and re-evaluate the intersection in the Filter over ALL ~3M
    candidates (measured 4.4 vs 3.7 s at 100x); the nondeterministic
    _mid barrier in minhash_near_dups pins the single-eval shape. This
    asserts the optimizer never pushes the intersect into a Filter —
    if a Spark upgrade starts collapsing the barrier projection, this
    fails before the bench does."""
    from python_etl_rest_api_spark.catalog_ext import dedup_minhash_lsh

    df = dedup_minhash_lsh(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = [ln for ln in plan.splitlines()
           if "Filter" in ln and "array_intersect" in ln]
    assert not bad, f"intersect re-evaluated inside Filter: {bad}"
