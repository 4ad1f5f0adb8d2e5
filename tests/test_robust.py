"""Invariant + plan-shape tests for the catalog_robust entries: the
diversity audit's bounds, the KMV set-algebra estimates vs their exact
witnesses, Theil-Sen's pair accounting with no single-partition window,
and the bootstrap replica means bracketing the true mean."""

from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog_robust import (
    privacy_l_diversity,
    sketch_kmv_jaccard,
    stats_bootstrap_means,
    stats_theilsen_trend,
)
from python_etl_rest_api_spark.operators.twopass import (
    single_partition_window_ops,
)

SF = "/root/testdata/sf0.001"


def test_l_diversity_bounds(spark):
    r = privacy_l_diversity(spark, SF).collect()[0]
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert 1 <= r["min_l"] <= 4  # four balance bands exist
    assert 0 <= r["below_l_classes"] <= r["n_classes"]
    assert 0 <= r["rows_exposed"] <= n_cust


def test_kmv_jaccard_estimates_track_truth(spark):
    r = sketch_kmv_jaccard(spark, SF).collect()[0]
    assert 1 <= r["k_used"] <= 128
    assert r["true_inter"] <= r["true_union"]
    if r["k_used"] == 128:  # saturated: estimates are meaningful
        assert 0.4 * r["true_union"] <= r["est_union"] \
            <= 2.5 * r["true_union"]
        # Jaccard estimate within an absolute band of the exact value
        assert abs(r["est_jaccard_micros"] - r["true_jaccard_micros"]) \
            <= 250_000
    else:  # sketch holds the whole universe: union estimate degenerate
        assert r["k_used"] == r["true_union"]


def test_theilsen_pair_accounting_and_no_global_window(spark):
    df = stats_theilsen_trend(spark, SF)
    assert single_partition_window_ops(df) == []
    r = df.collect()[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    assert r["arg_d1"] < r["arg_d2"]


def test_bootstrap_replicas_bracket_true_mean(spark):
    rows = stats_bootstrap_means(spark, SF).collect()
    assert len(rows) == 32
    orders = (spark.read.parquet(f"{SF}/orders.parquet")
              .filter(F.col("o_totalprice").isNotNull()
                      & F.col("o_orderkey").isNotNull())
              .select(F.floor(F.col("o_totalprice") * 100)
                      .cast("long").alias("cents")))
    agg = orders.agg(F.sum("cents").alias("s"),
                     F.count(F.lit(1)).alias("n")).collect()[0]
    true_micro = agg["s"] * 1_000_000 // agg["n"]
    means = sorted(r["mean_micro_cents"] for r in rows)
    # Poisson(1) resampling keeps every replica mean near the truth
    # (a few percent at sf0.001's ~1.5k orders) and the replicas
    # genuinely differ
    for m in means:
        assert abs(m - true_micro) <= 0.2 * true_micro
    assert len(set(means)) > 1
    assert all(r["n_eff"] > 0 for r in rows)


def test_ahash_row_sigs_match_direct_computation(spark):
    from python_etl_rest_api_spark.operators.multimodal import (
        ahash_row_signatures, synthesize_bmp_media)
    sig = {(r["media_id"], r["y"]): r["rsig"]
           for r in ahash_row_signatures(
               synthesize_bmp_media(spark, n=6)).collect()}
    for i in range(6):
        w, h = 8 + i % 5, 6 + i % 3
        lum = {(x, y): ((i*7 + x*3 + y*5) % 256
                        + (i*7 + x*3 + y*5 + 11) % 256
                        + (i*7 + x*3 + y*5 + 22) % 256)
               for x in range(w) for y in range(h)}
        total = sum(lum.values())
        for y in range(h):
            expect = sum((1 << x) for x in range(w)
                         if lum[(x, y)] * (w * h) > total)
            assert sig[(i, y)] == expect, (i, y)


def test_ahash_lsh_pairs_are_true_near_dups(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        dedup_image_ahash_lsh)
    rows = dedup_image_ahash_lsh(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0 <= r["hamming_bits"] <= 16
        # same-dims requirement of the band join
        assert (8 + r["id_a"] % 5, 6 + r["id_a"] % 3) == \
               (r["width"], r["height"])
        assert (8 + r["id_b"] % 5, 6 + r["id_b"] % 3) == \
               (r["width"], r["height"])


def test_bm25_topk_ranked_and_bounded(spark):
    from python_etl_rest_api_spark.catalog_robust import search_bm25_topk
    rows = search_bm25_topk(spark, SF).collect()
    assert 1 <= len(rows) <= 10
    scores = [(r["score_micros"], r["doc_id"]) for r in rows]
    # descending by score, ascending doc_id tiebreak == sorted order
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    for r in rows:
        assert r["score_micros"] > 0
        assert 1 <= r["n_terms_matched"] <= 3


def test_late_arrivals_accounting(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        stream_late_arrivals)
    for r in stream_late_arrivals(spark, SF).collect():
        assert 0 <= r["n_late"] <= r["n_events"]
        assert r["max_lateness_s"] >= 0
        if r["n_late"] > 0:
            assert r["max_lateness_s"] > 3600


def test_ams_f2_estimate_brackets_truth(spark):
    from python_etl_rest_api_spark.catalog_robust import sketch_ams_f2
    r = sketch_ams_f2(spark, SF).collect()[0]
    assert r["k"] == 16
    # k=16 AMS: loose bracket, but the estimator must be in the
    # right order of magnitude of the exact self-join size
    assert 0.2 * r["true_f2"] <= r["est_f2"] <= 5 * r["true_f2"]


def test_zonemap_prune_is_complete(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        layout_zonemap_prune)
    rows = layout_zonemap_prune(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r["n_rows"] for r in rows) == n_cust
    assert any(r["scanned"] == 0 for r in rows)  # pruning happens
    for r in rows:
        if r["scanned"] == 0:  # a skipped zone may hold NO matches
            assert r["n_matches"] == 0


def test_permutation_test_counts(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        stats_permutation_test)
    r = stats_permutation_test(spark, SF).collect()[0]
    assert 1 <= r["n_perms"] <= 32
    assert 0 <= r["n_ge"] <= r["n_perms"]
    assert r["stat_obs_micros"] >= 0
    assert r["n_click"] > 0 and r["n_purchase"] > 0


def test_bfs_levels_partition_nodes(spark):
    from python_etl_rest_api_spark.catalog_robust import graph_bfs_levels
    rows = {r["dist"]: r["n_nodes"] for r in
            graph_bfs_levels(spark, SF).collect()}
    assert set(rows) == {-1, 0, 1, 2, 3}
    assert rows[0] == 5  # five seeds (graph has >5 nodes at any sf)
    assert all(v >= 0 for v in rows.values())


def test_join_size_estimator_brackets_truth(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        stats_join_size_est)
    r = stats_join_size_est(spark, SF).collect()[0]
    assert r["est_size"] == r["est_hot"] + r["est_cold"]
    assert r["true_size"] > 0
    # hot keys exact + containment residual: right order of magnitude
    assert 0.1 * r["true_size"] <= r["est_size"] <= 10 * r["true_size"]


def test_partition_overwrite_touches_only_target(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        sink_partition_overwrite)
    got = {r["event_type"]: (r["n_rows"], r["id_sum"]) for r in
           sink_partition_overwrite(spark, SF).collect()}
    src = (spark.read.parquet(f"{SF}/events.parquet")
           .filter(F.col("event_type").isNotNull()
                   & F.col("event_id").isNotNull()))
    for r in (src.withColumn(
                "keep", (F.col("event_type") != "click")
                | (F.col("event_id") % 2 == 0))
              .filter("keep").groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("event_id").alias("s")).collect()):
        assert got[r["event_type"]] == (r["n"], r["s"])


def test_matryoshka_overlap_bounded(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        embed_matryoshka_recall)
    rows = embed_matryoshka_recall(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["overlap10"] <= r["k"] == 10


def test_erasure_conservation(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        privacy_erasure_audit)
    rows = privacy_erasure_audit(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sum(r["n_before"] for r in rows) == ev.count()
    for r in rows:
        assert r["n_before"] == r["n_erased"] + r["n_after"]
    # a deletion-list user leaves NO retained rows anywhere
    retained_del = (ev.filter(F.col("user_id").isNotNull()
                              & (F.col("user_id") % 37 == 0)).count())
    assert sum(r["n_erased"] for r in rows) == retained_del


def test_capture_recapture_identity(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        stats_capture_recapture)
    r = stats_capture_recapture(spark, SF).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    assert max(r["n1"], r["n2"]) <= r["true_pop"] <= r["n1"] + r["n2"]
    assert r["est_pop"] >= 0
    # both samples near-census here, so the estimate is tight
    assert abs(r["est_pop"] - r["true_pop"]) <= 0.5 * r["true_pop"]


def test_gini_bounds_and_known_concentration(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        profile_column_gini)
    rows = {r["col_name"]: r for r in
            profile_column_gini(spark, SF).collect()}
    assert set(rows) == {"event_type", "lang", "source"}
    for r in rows.values():
        # gini in [0, (1 - 1/n_distinct)] scaled to micros
        assert 0 <= r["gini_micros"] <= 1_000_000
        ub = (r["n_distinct"] - 1) * 1_000_000 // r["n_distinct"] \
            if r["n_distinct"] else 0
        assert r["gini_micros"] <= ub + 1


def test_functional_deps_key_holds_nonkey_breaks(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        profile_functional_deps)
    rows = {r["dep"]: r["holds"] for r in
            profile_functional_deps(spark, SF).collect()}
    assert rows["c_custkey->c_mktsegment"] == 1   # PK determines all
    assert rows["o_orderkey->o_orderstatus"] == 1
    assert rows["c_nationkey->c_mktsegment"] == 0  # 25 nations, 5 segs


def test_referential_health_edges(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        dq_referential_health)
    rows = {r["fk"]: r for r in dq_referential_health(spark, SF)
            .collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert 0 <= r["n_orphans"] <= r["n_child"]
        assert r["healthy"] == (1 if r["n_orphans"] == 0 else 0)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert rows["lineitem.l_orderkey->orders"]["n_child"] == \
        li.filter(F.col("l_orderkey").isNotNull()).count()


def test_interarrival_buckets_bound_gaps(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        events_interarrival_hist)
    for r in events_interarrival_hist(spark, SF).collect():
        b = r["bucket"]
        lo, hi = (1 << (b - 1)) - 1, (1 << b) - 2
        # bucket b holds gaps with bit_length(gap+1) == b
        assert lo <= r["min_gap_s"] <= r["max_gap_s"] <= hi
        assert r["n"] >= 1


def test_survival_table_accounting(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        stats_survival_table)
    rows = sorted(stats_survival_table(spark, SF).collect(),
                  key=lambda r: r["week"])
    n_cust = (spark.read.parquet(f"{SF}/orders.parquet")
              .filter(F.col("o_custkey").isNotNull()
                      & F.col("o_orderdate").isNotNull()
                      & F.col("o_orderkey").isNotNull())
              .select("o_custkey").distinct().count())
    # every customer appears exactly once as event or censoring
    assert sum(r["n_events"] + r["n_censored"] for r in rows) == n_cust
    # at-risk is the suffix sum and decreases monotonically
    assert rows[0]["n_at_risk"] == n_cust
    for a, b in zip(rows, rows[1:]):
        assert b["n_at_risk"] == \
            a["n_at_risk"] - a["n_events"] - a["n_censored"]
    assert all(0 <= r["week"] <= 20 for r in rows)


def test_markov_stationary_mass_conserved_within_truncation(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        events_markov_stationary)
    rows = events_markov_stationary(spark, SF).collect()
    n_states = len(rows)
    assert 1 <= n_states <= 5
    total = sum(r["pi_micros"] for r in rows)
    start = n_states * 1_000_000
    # truncating division sheds < n_states^2 micros per round, 5 rounds
    assert start - 5 * n_states * n_states <= total <= start
    assert all(r["pi_micros"] > 0 for r in rows)


def test_good_turing_count_of_counts(spark):
    from python_etl_rest_api_spark.catalog_robust import text_good_turing
    r = text_good_turing(spark, SF).collect()[0]
    assert r["n1"] + 2 * r["n2"] <= r["n_tokens"]
    assert r["n1"] + r["n2"] <= r["vocab"] <= r["n_tokens"]
    assert r["unseen_mass_micros"] == r["n1"] * 1_000_000 // r["n_tokens"]


def test_encoding_quality_counts_bounded(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        text_encoding_quality)
    rows = text_encoding_quality(spark, SF).collect()
    assert rows
    for r in rows:
        for c in ("n_control", "n_replacement", "n_mojibake_marks"):
            assert 0 <= r[c] <= r["n_docs"]


def test_encoding_quality_detects_planted_mojibake(spark):
    # unit-level: the predicates fire on known-bad strings
    df = spark.createDataFrame(
        [("s", "ok text"), ("s", "bad \x01 ctrl"), ("s", "repl �"),
         ("s", "moji Ã© byte")], "source string, text string")
    # the entry's predicates, re-applied to the planted rows
    from pyspark.sql import functions as FF
    ctrl = FF.when(df["text"].rlike("[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]"),
                   1).otherwise(0)
    repl = FF.when(df["text"].contains("�"), 1).otherwise(0)
    moji = FF.when(df["text"].rlike("[\\x{00C2}\\x{00C3}]"), 1) \
             .otherwise(0)
    r = df.agg(FF.sum(ctrl).alias("c"), FF.sum(repl).alias("r"),
               FF.sum(moji).alias("m")).collect()[0]
    assert (r["c"], r["r"], r["m"]) == (1, 1, 1)


def test_sequence_gaps_partition_orders(spark):
    from python_etl_rest_api_spark.catalog_robust import dq_sequence_gaps
    r = dq_sequence_gaps(spark, SF).collect()[0]
    assert r["n_contiguous"] <= r["n_orders"]
    assert r["n_with_dupes"] <= r["n_orders"]
    assert r["n_with_gaps"] <= r["n_orders"]
    # clean orders are exactly those with neither dupes nor gaps
    assert r["n_contiguous"] >= r["n_orders"] \
        - r["n_with_dupes"] - r["n_with_gaps"]


def test_pareto_frontier_matches_naive(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        select_pareto_frontier)
    got = {(r["p_partkey"], r["price_cents"], r["size"])
           for r in select_pareto_frontier(spark, SF).collect()}
    pts = [(r["p_partkey"], r["price_cents"], r["size"])
           for r in (spark.read.parquet(f"{SF}/part.parquet")
                     .filter(F.col("p_partkey").isNotNull()
                             & F.col("p_retailprice").isNotNull()
                             & F.col("p_size").isNotNull())
                     .select("p_partkey",
                             F.floor(F.col("p_retailprice") * 100)
                             .cast("long").alias("price_cents"),
                             F.col("p_size").cast("long").alias("size"))
                     .collect())]
    naive = {p for p in pts
             if not any(q[1] <= p[1] and q[2] <= p[2]
                        and (q[1] < p[1] or q[2] < p[2]) for q in pts)}
    assert got == naive and got


def test_cohort_ltv_conserves_first_year_revenue(spark):
    from python_etl_rest_api_spark.catalog_robust import orders_cohort_ltv
    rows = orders_cohort_ltv(spark, SF).collect()
    assert all(0 <= r["age_months"] <= 11 for r in rows)
    # age-0 cell per cohort holds at least one order (the acquisition)
    age0 = {r["cohort_month"] for r in rows if r["age_months"] == 0}
    cohorts = {r["cohort_month"] for r in rows}
    assert age0 == cohorts
    assert all(r["revenue_cents"] > 0 for r in rows)


def test_zipf_head_is_ranked(spark):
    from python_etl_rest_api_spark.catalog_robust import text_zipf_topk
    rows = sorted(text_zipf_topk(spark, SF).collect(),
                  key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r["rank_x_freq"] == r["rank"] * r["freq"] for r in rows)


def test_centroid_drift_zero_on_identical_halves(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        embed_centroid_drift)
    rows = embed_centroid_drift(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_even"] > 0 and r["n_odd"] > 0
        # value = hi*1e24 + mid*1e12 + lo (BIGINT limbs, base 1e12)
        assert r["drift_sq_hi"] >= 0
        assert 0 <= r["drift_sq_mid"] < 10**12
        assert 0 <= r["drift_sq_lo"] < 10**12


def test_limb_split_covers_full_decimal38_range(spark):
    """The base-1e12 3-limb split must reassemble exactly across the
    WHOLE decimal(38,0) range — including values whose 2-limb base-1e9
    hi would overflow BIGINT (Spark div -> NULL vs DuckDB cast ->
    error, the divergence the 3-limb shape exists to remove)."""
    import duckdb

    from pyspark.sql import functions as F

    from python_etl_rest_api_spark.catalog_infer import _limb_cols

    vals = [0, 1, 999999999999, 10**12, 9223372036854775807,
            9 * 10**27 + 123456789,            # 2-limb base-1e9 overflow
            10**37 + 987654321012345678901234567]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string") \
        .select(F.col("s").cast("decimal(38,0)").alias("d"))
    got = {r["d_hi"] * 10**24 + r["d_mid"] * 10**12 + r["d_lo"]
           for r in df.select(*_limb_cols("d", "d")).collect()}
    assert got == set(vals)

    con = duckdb.connect()
    for v in vals:
        hi, mid, lo = con.execute(
            f"SELECT CAST(CAST('{v}' AS HUGEINT) // "
            "1000000000000000000000000 AS BIGINT), "
            f"CAST((CAST('{v}' AS HUGEINT) % "
            "1000000000000000000000000) // 1000000000000 AS BIGINT), "
            f"CAST(CAST('{v}' AS HUGEINT) % 1000000000000 AS BIGINT)"
        ).fetchone()
        assert hi * 10**24 + mid * 10**12 + lo == v


def test_csv_corrupt_records_quarantine(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        source_csv_corrupt_records)
    r = source_csv_corrupt_records(spark, SF).collect()[0]
    assert r["n_rows"] == 100
    assert r["n_corrupt"] == sum(1 for i in range(100) if i % 7 in (3, 5))
    assert r["n_good"] == r["n_rows"] - r["n_corrupt"]
    assert r["good_amount_cents"] == sum(
        i * 3 + 50 for i in range(100) if i % 7 not in (3, 5))


def test_audio_decimate_matches_direct(spark):
    from python_etl_rest_api_spark.catalog_robust import (
        multimodal_audio_decimate)
    rows = {r["media_id"]: r for r in
            multimodal_audio_decimate(spark, SF).collect()}
    assert len(rows) == 48
    for i in (0, 7, 47):
        nf = 64 + i
        s = [(((i * 31 + j * 7) % 256) - 128) * 256 for j in range(nf)]
        d = [(s[2 * t] + s[2 * t + 1]) // 2 for t in range(nf // 2)]
        r = rows[i]
        assert r["sample_rate"] == 4000 and r["n_frames"] == nf // 2
        assert r["peak_amplitude"] == max(abs(x) for x in d)
        assert r["total_abs_amplitude"] == sum(abs(x) for x in d)
