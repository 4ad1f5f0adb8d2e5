"""Plan-shape + invariant tests for the catalog_mining entries: OHLC
bars keep their order invariants on a PARTITIONED window, the path
miner and featurizer bound their rank frames, the Gini/ABC prefix
scans never build a single-partition window over row-scaled input, and
the JSONL round trip value-matches the parquet truth end to end."""

from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog_mining import (
    events_ohlc_hourly,
    events_top_paths,
    orders_abc_classes,
    privacy_pseudonymize_join,
    source_json_roundtrip,
    stats_benford_first_digit,
    stats_gini_lorenz,
    text_hashing_features,
)
from python_etl_rest_api_spark.catalog import _events
from python_etl_rest_api_spark.operators.twopass import (
    single_partition_window_ops,
)

SF = "/root/testdata/sf0.001"


def test_ohlc_invariants_and_partitioned_window(spark):
    df = events_ohlc_hourly(spark, SF)
    # the bar windows are keyed on (event_type, hr): nothing may run
    # on a single partition
    assert single_partition_window_ops(df) == []
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["low_micros"] <= r["open_micros"] <= r["high_micros"]
        assert r["low_micros"] <= r["close_micros"] <= r["high_micros"]
        assert r["n_events"] >= 1
        if r["n_events"] == 1:
            assert r["open_micros"] == r["close_micros"] \
                == r["high_micros"] == r["low_micros"]


def test_top_paths_bounded_head(spark):
    df = events_top_paths(spark, SF)
    rows = sorted(df.collect(), key=lambda r: r["rk"])
    assert 1 <= len(rows) <= 20
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert r["path"].count(" > ") == 2


def test_benford_permille_budget(spark):
    df = stats_benford_first_digit(spark, SF)
    rows = df.collect()
    assert 1 <= len(rows) <= 9
    total_obs = sum(r["obs_permille"] for r in rows)
    # floor division loses at most 1 permille per digit
    assert 1000 - len(rows) <= total_obs <= 1000
    for r in rows:
        assert r["dev_permille"] == r["obs_permille"] - r["exp_permille"]
        assert r["digit"] in set("123456789")


def test_gini_bounds_and_no_global_window(spark):
    df = stats_gini_lorenz(spark, SF)
    assert single_partition_window_ops(df) == []
    r = df.collect()[0]
    assert 0 <= r["gini_micros"] < 1_000_000
    # the top decile owns at least its proportional share
    assert 100 <= r["top_decile_permille"] <= 1000
    assert r["n_customers"] > 0 and r["total_cents"] > 0


def test_abc_classes_partition_totals(spark):
    df = orders_abc_classes(spark, SF)
    assert single_partition_window_ops(df) == []
    rows = {r["abc_class"]: r for r in df.collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    share = sum(r["share_permille"] for r in rows.values())
    assert 1000 - len(rows) <= share <= 1000
    # A is the 80% head: it must hold the largest revenue share
    if len(rows) > 1:
        assert rows["A"]["share_permille"] == max(
            r["share_permille"] for r in rows.values())


def test_pseudonymize_token_contract(spark):
    df = privacy_pseudonymize_join(spark, SF)
    rows = sorted(df.collect(), key=lambda r: r["rk"])
    assert 1 <= len(rows) <= 10
    ns = [r["n_orders"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["token_prefix"]) == 12
        assert set(r["token_prefix"]) <= set("0123456789abcdef")
        assert r["spend_cents"] > 0


def test_hashing_features_bucket_space(spark):
    df = text_hashing_features(spark, SF)
    rows = df.collect()
    assert rows
    per_source: dict[str, list[int]] = {}
    for r in rows:
        assert 0 <= r["bucket"] < 64
        per_source.setdefault(r["source"], []).append(r["rk"])
    for rks in per_source.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 3


def test_json_roundtrip_matches_parquet_truth(spark):
    df = source_json_roundtrip(spark, SF)
    got = {r["event_type"]: r for r in df.collect()}
    e = _events(spark, SF)
    vmic = F.when(
        F.col("value").isNotNull() & ~F.isnan(F.col("value"))
        & (F.col("value") >= 0) & (F.col("value") < 1e12),
        F.floor(F.col("value") * 1000000.0).cast("long"))
    want = {r["event_type"]: r for r in (
        e.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"),
             F.sum(vmic).cast("long").alias("sum_value_micros"),
             F.max("event_id").cast("long").alias("max_event_id"))
        .collect())}
    assert set(got) == set(want)
    for k, g in got.items():
        w = want[k]
        for c in ("n_events", "first_ts", "last_ts",
                  "sum_value_micros", "max_event_id"):
            assert g[c] == w[c], (k, c, g[c], w[c])


def test_wht_parseval_and_definition(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        multimodal_wht_bands,
    )
    df = multimodal_wht_bands(spark, SF)
    rows = df.collect()
    per_media: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["band"] < 4
        per_media[r["media_id"]] = per_media.get(r["media_id"], 0) \
            + r["energy"]
    assert len(per_media) == 48
    # Parseval: sum of coeff^2 == N * sum of sample^2 for the clip head
    for i, tot in per_media.items():
        want = 64 * sum((((i * 31 + j * 7) % 256 - 128) * 256) ** 2
                        for j in range(64))
        assert tot == want, (i, tot, want)


def test_hourly_bitmap_mask_contract(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        events_hourly_bitmap,
    )
    rows = events_hourly_bitmap(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["mask"] < (1 << 24)
        assert bin(r["mask"]).count("1") == r["active_hours"]
        assert r["n_events"] >= r["n_user_days"] * r["active_hours"]


def test_freshness_watermark_nonnegative(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        dq_freshness_watermark,
    )
    rows = dq_freshness_watermark(spark, SF).collect()
    assert rows
    assert any(r["lag_minutes"] == 0 for r in rows)  # the freshest type
    for r in rows:
        assert r["lag_minutes"] >= 0
        assert r["is_stale"] in (0, 1)
        assert (r["lag_minutes"] > 60) == (r["is_stale"] == 1) \
            or r["lag_minutes"] == 60


def test_ols_recovers_known_plane(spark):
    """Feed the operator's exact pipeline a synthetic y = 3 + 2*x1 - x2
    (in cents scale) and check the integer Cramer solution recovers the
    plane exactly in micros."""
    import duckdb
    from python_etl_rest_api_spark.registry import ORACLES
    con = duckdb.connect()
    con.sql("""
        CREATE VIEW lineitem AS
        SELECT CAST(x1 AS DOUBLE) AS l_quantity,
               CAST(x2 AS DOUBLE) / 100 AS l_discount,
               CAST(300 + 200*x1 - 100*x2 AS DOUBLE) / 100
                 AS l_extendedprice
        FROM (SELECT (i % 7) + 1 AS x1, (i * 3) % 10 AS x2
              FROM range(0, 200) t(i))""")
    r = con.sql(ORACLES["stats_ols_two_regressors"]).fetchone()
    n, b0, b1, b2 = r
    assert n == 200
    assert b0 == 300_000_000  # 300 cents in micros
    assert b1 == 200_000_000
    assert b2 == -100_000_000


def test_cosine_histogram_counts(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        embed_cosine_histogram,
    )
    from python_etl_rest_api_spark.catalog import _t
    rows = embed_cosine_histogram(spark, SF).collect()
    assert rows
    emb = _t(spark, SF, "embeddings")
    n = emb.filter(F.col("embedding").isNotNull()
                   & (F.size("embedding") > 0)).count()
    nq = emb.filter(F.col("vec_id") < 8).count()
    assert sum(r["n_pairs"] for r in rows) == nq * (n - 1)
    assert all(0 <= r["bucket"] < 20 for r in rows)


def test_modularity_identity_bounds(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        graph_community_modularity,
    )
    r = graph_community_modularity(spark, SF).collect()[0]
    assert r["n_edges"] > 0
    assert 0 <= r["internal_edges"] <= r["n_edges"]
    assert -1_000_000 <= r["q_micros"] <= 1_000_000
    assert r["n_brands"] > 1


def test_class_balance_exact_floor(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        sample_class_balance,
    )
    rows = sample_class_balance(spark, SF).collect()
    assert rows
    n_min = min(r["n_total"] for r in rows)
    for r in rows:
        assert r["n_kept"] == n_min
        assert r["n_total"] >= n_min
        assert r["kept_id_sum"] > 0


def test_rake_scores_ordered(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        text_rake_keywords,
    )
    rows = sorted(text_rake_keywords(spark, SF).collect(),
                  key=lambda r: r["rk"])
    assert 1 <= len(rows) <= 20
    scores = [r["score_micros"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # degree counts each occurrence's phrase length >= the word's
        # own occurrences, so score >= 1.0 in micros
        assert r["degree"] >= r["freq"]
        assert r["score_micros"] >= 1_000_000
        assert r["term"] not in ("the", "a", "")


def test_runs_test_identities(spark):
    from python_etl_rest_api_spark.catalog_mining import stats_runs_test
    r = stats_runs_test(spark, SF).collect()[0]
    assert r["n_up"] + r["n_down"] == r["n_steps"]
    assert 1 <= r["n_runs"] <= r["n_steps"]
    assert r["expected_runs_micros"] >= 1_000_000


def test_target_encode_between_prior_and_naive(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        feature_target_encode,
    )
    rows = feature_target_encode(spark, SF).collect()
    assert rows
    gs = sum(r["sum_cents"] for r in rows)
    gn = sum(r["n"] for r in rows)
    for r in rows:
        naive = r["sum_cents"] * 1_000_000 // r["n"]
        prior = gs * 1_000_000 // gn
        lo, hi = min(naive, prior), max(naive, prior)
        # smoothing pulls the encoding strictly between the two
        assert lo - 1_000_000 <= r["enc_microcents"] <= hi + 1_000_000


def test_vad_segment_contract(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        multimodal_audio_vad,
    )
    rows = multimodal_audio_vad(spark, SF).collect()
    assert len(rows) == 48
    # the gate must split the corpus: some clips active, none fully
    # silent-with-segments; segment algebra holds everywhere
    assert any(r["n_segments"] > 0 for r in rows)
    assert any(r["active_frames"] < r["n_frames"] for r in rows)
    for r in rows:
        assert 0 <= r["active_frames"] <= r["n_frames"]
        assert r["longest_segment"] <= r["active_frames"]
        assert (r["n_segments"] == 0) == (r["active_frames"] == 0)
        if r["n_segments"]:
            assert r["longest_segment"] >= (
                r["active_frames"] + r["n_segments"] - 1
            ) // r["n_segments"]
        assert r["active_permille"] \
            == r["active_frames"] * 1000 // r["n_frames"]


def test_ab_srm_balanced(spark):
    from python_etl_rest_api_spark.catalog_mining import stats_ab_srm
    r = stats_ab_srm(spark, SF).collect()[0]
    n = r["n_a"] + r["n_b"]
    assert n > 0
    assert r["imbalance_permille"] == abs(r["n_a"] - r["n_b"]) * 1000 // n
    assert r["chi2_micros"] == (r["n_a"] - r["n_b"]) ** 2 * 1_000_000 // n
    # both arms populated; imbalance within ~6 sigma of a fair split
    # (sigma_permille ~= 1000 / sqrt(n))
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["imbalance_permille"] <= 6000 / (n ** 0.5) + 1


def test_gif_lzw_width_boundaries_and_kwkwk():
    """Pure-codec torture: inputs that force the 9->10->11 bit width
    bumps and the KwKwK corner; plus container-level round trips."""
    import random
    from python_etl_rest_api_spark.operators.multimodal import (
        _decode_gif, _lzw_decode_gif, _lzw_encode_gif, encode_gif_gray,
    )
    rng = random.Random(11)
    for trial in range(60):
        n = rng.randint(0, 900)
        data = bytes(rng.randrange(3) for _ in range(n))
        assert _lzw_decode_gif(_lzw_encode_gif(data), 8) == data
    # KwKwK: aaa... emits the just-assigned code immediately
    assert _lzw_decode_gif(_lzw_encode_gif(b"aaaaaaa"), 8) == b"aaaaaaa"
    p = encode_gif_gray(5, 4, lambda x, y: (x * 50 + y * 40) % 256)
    w, h, npx, sl, pk = _decode_gif(p)
    want = [(x * 50 + y * 40) % 256 for y in range(4) for x in range(5)]
    assert (w, h, npx, sl, pk) == (5, 4, 20, sum(want), max(want))


def test_gif_decode_entry(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        multimodal_gif_decode,
    )
    rows = multimodal_gif_decode(spark, SF).collect()
    assert len(rows) == 48
    for r in rows:
        assert r["n_pixels"] == r["width"] * r["height"]
        assert 0 <= r["peak_lum"] <= 255
        assert 0 <= r["sum_lum"] <= 255 * r["n_pixels"]


def test_uplift_consistent_with_srm_arms(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        events_uplift_by_arm, stats_ab_srm,
    )
    u = events_uplift_by_arm(spark, SF).collect()[0]
    assert u["n_a"] > 0 and u["n_b"] > 0
    assert u["uplift_micros"] == u["mean_b_micros"] - u["mean_a_micros"]
    # arm user-universe is shared with the SRM audit (same hash+salt):
    # event counts per arm must cover at least the assigned users
    s = stats_ab_srm(spark, SF).collect()[0]
    assert u["n_a"] >= s["n_a"] and u["n_b"] >= s["n_b"]


def test_uniqueness_audit_clean_testdata(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        dq_uniqueness_audit,
    )
    rows = {r["key_col"]: r for r in dq_uniqueness_audit(spark, SF)
            .collect()}
    assert len(rows) == 6
    for k, r in rows.items():
        assert r["n_rows"] == r["n_distinct"] + r["n_dupes"]
        assert r["n_nulls"] == 0, k
        if k != "lineitem.(l_orderkey,l_linenumber)":
            assert r["n_dupes"] == 0, k  # true PKs are clean
    # the synthetic lineitem does NOT enforce its composite key — the
    # audit must surface that dirt, not hide it
    assert rows["lineitem.(l_orderkey,l_linenumber)"]["n_dupes"] > 0


def test_scd2_asof_consistent_with_history(spark):
    """The as-of read must return, per customer, exactly the history
    row whose validity interval is the latest to start on or before
    the cutoff."""
    from python_etl_rest_api_spark.catalog_mining import (
        scd2_as_of_lookup,
    )
    from python_etl_rest_api_spark.catalog_warehouse import (
        scd2_status_history,
    )
    import datetime
    cutoff = datetime.date(1996, 6, 15)
    asof = {r["custkey"]: r for r in scd2_as_of_lookup(spark, SF)
            .collect()}
    hist: dict[int, list] = {}
    for r in scd2_status_history(spark, SF).collect():
        hist.setdefault(r["custkey"], []).append(r)
    assert asof
    for ck, rows in hist.items():
        eligible = [r for r in rows if r["valid_from"] <= cutoff]
        if not eligible:
            assert ck not in asof
            continue
        want = max(eligible,
                   key=lambda r: (r["valid_from"], r["version"]))
        got = asof[ck]
        assert (got["as_of_version"], got["status"], got["valid_from"]) \
            == (want["version"], want["status"], want["valid_from"]), ck


def test_langid_confusion_structure(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        text_langid_confusion,
    )
    rows = text_langid_confusion(spark, SF).collect()
    assert rows
    per_lang: dict[str, int] = {}
    for r in rows:
        assert (r["is_correct"] == 1) == (r["lang"] == r["predicted_lang"])
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) \
            + r["share_permille"]
    # per-lang shares are a floor-permille partition of each row
    for lang, s in per_lang.items():
        assert s <= 1000
    # zh has no stopword list: the classifier can never output 'zh'
    assert all(r["predicted_lang"] != "zh" for r in rows)
    assert "zh" in per_lang  # ...but labeled zh docs exist and land somewhere


def test_nprobe_recall_monotone(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        _ann_recall_vs_nprobe,
    )
    rows = _ann_recall_vs_nprobe(spark, SF).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in rows:
        assert r["recall_permille"] == r["n_hits"] * 100
        assert 0 <= r["n_hits"] <= 10
        by_q.setdefault(r["qid"], {})[r["nprobe"]] = r["n_hits"]
    assert by_q
    for qid, curve in by_q.items():
        assert set(curve) == {1, 2, 4}
        # probing more cells can only add candidates
        assert curve[1] <= curve[2] <= curve[4], (qid, curve)


def test_label_margin_bounds(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        embed_label_margin,
    )
    r = embed_label_margin(spark, SF).collect()[0]
    assert r["n_intra"] > 0 and r["n_inter"] > 0
    # pair algebra: together they cover all C(n,2) pairs of the sample
    n = r["n_intra"] + r["n_inter"]
    import math
    k = int((1 + math.isqrt(1 + 8 * n)) // 2)
    assert k * (k - 1) // 2 == n
    for c in ("intra_mean_micros", "inter_mean_micros"):
        assert -1_000_000 <= r[c] <= 1_000_000
    assert r["margin_micros"] \
        == r["intra_mean_micros"] - r["inter_mean_micros"]


def test_schema_contract_all_ok_and_detects_breaks(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        _CONTRACT, _dq_schema_contract,
    )
    rows = _dq_schema_contract(spark, SF).collect()
    assert len(rows) == len(_CONTRACT)
    assert all(r["status"] == "ok" for r in rows)
    # break the contract in-memory: the classifier must notice all
    # three failure modes
    import python_etl_rest_api_spark.catalog_mining as m
    orig = m._CONTRACT
    try:
        m._CONTRACT = [t for t in orig if t[1] != "o_custkey"] + [
            ("orders", "o_totalprice", "string"),   # wrong family
            ("orders", "o_ghost_col", "integer"),   # not in the lake
        ]
        m._CONTRACT = [t for t in m._CONTRACT
                       if not (t[1] == "o_totalprice"
                               and t[2] == "float")]
        got = {(r["tbl"], r["col"]): r["status"]
               for r in _dq_schema_contract(spark, SF).collect()}
        assert got[("orders", "o_custkey")] == "unexpected_column"
        assert got[("orders", "o_totalprice")] == "type_mismatch"
        assert got[("orders", "o_ghost_col")] == "missing_column"
    finally:
        m._CONTRACT = orig


def test_hhi_bounds(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        orders_hhi_by_nation,
    )
    rows = orders_hhi_by_nation(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_suppliers"] >= 1 and r["total_cents"] > 0
        # HHI in (1e6/n - eps, 1e6]: floor can undershoot the even
        # bound by at most 1 micro
        assert r["hhi_micros"] <= 1_000_000
        assert r["hhi_micros"] >= 1_000_000 // r["n_suppliers"] - 1
        if r["n_suppliers"] == 1:
            assert r["hhi_micros"] in (999_999, 1_000_000)


def test_lsh_scurve_monotone_rates(spark):
    from python_etl_rest_api_spark.catalog_mining import dedup_lsh_scurve
    rows = sorted(dedup_lsh_scurve(spark, SF).collect(),
                  key=lambda r: r["jaccard_bin"])
    assert rows
    for r in rows:
        assert 0 <= r["jaccard_bin"] <= 9
        assert 0 <= r["n_collided"] <= r["n_pairs"]
        assert r["collide_permille"] \
            == r["n_collided"] * 1000 // r["n_pairs"]
    # the S-curve's ends: low-Jaccard pairs rarely collide, the top
    # bin (if populated) collides at a strictly higher rate
    lo = [r for r in rows if r["jaccard_bin"] <= 2]
    hi = [r for r in rows if r["jaccard_bin"] >= 8]
    if lo and hi:
        lo_rate = sum(r["n_collided"] for r in lo) * 1000 \
            // max(1, sum(r["n_pairs"] for r in lo))
        hi_rate = sum(r["n_collided"] for r in hi) * 1000 \
            // max(1, sum(r["n_pairs"] for r in hi))
        assert hi_rate > lo_rate


def test_churn_buckets_partition_users(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        events_churn_buckets,
    )
    rows = events_churn_buckets(spark, SF).collect()
    assert rows
    names = {r["bucket"] for r in rows}
    assert names <= {"active_7d", "cooling_14d", "at_risk_21d",
                     "churned"}
    assert "active_7d" in names  # the watermark user is active
    share = sum(r["share_permille"] for r in rows)
    assert 1000 - len(rows) <= share <= 1000
    for r in rows:
        assert r["n_events"] >= r["n_users"] >= 1


def test_single_source_risk_rollup(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        supply_single_source_risk,
    )
    rows = {r["sourcing"]: r for r in
            supply_single_source_risk(spark, SF).collect()}
    assert set(rows) <= {"single_source", "dual_source", "multi_source"}
    share = sum(r["revenue_share_permille"] for r in rows.values())
    assert 1000 - len(rows) <= share <= 1000
    for r in rows.values():
        assert r["n_parts"] >= 1 and r["revenue_cents"] > 0


def test_split_leakage_is_zero_by_construction(spark):
    from python_etl_rest_api_spark.catalog_mining import dq_split_leakage
    r = dq_split_leakage(spark, SF).collect()[0]
    # content-keyed splits CANNOT leak: same text -> same split
    assert r["leaked_texts"] == 0
    assert r["contaminated_eval_docs"] == 0
    assert r["n_train_docs"] + r["n_eval_docs"] >= r["n_distinct_texts"]
    assert r["n_train_docs"] > r["n_eval_docs"]  # ~80/20 split


def test_kfold_balance_and_coverage(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        sample_kfold_assign,
    )
    rows = sample_kfold_assign(spark, SF).collect()
    assert {r["fold"] for r in rows} == set(range(5))
    total = sum(r["n_docs"] for r in rows)
    share = sum(r["share_permille"] for r in rows)
    assert 1000 - 5 <= share <= 1000
    for r in rows:
        assert r["imbalance_permille"] \
            == abs(r["n_docs"] * 5 - total) * 1000 // total


def test_seasonal_index_year_budget(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        orders_seasonal_index,
    )
    rows = orders_seasonal_index(spark, SF).collect()
    assert rows
    per_year: dict[int, list] = {}
    for r in rows:
        assert 1 <= r["mo"] <= 12 and r["rev_cents"] > 0
        per_year.setdefault(r["yr"], []).append(r)
    for yr, ms in per_year.items():
        n = len(ms)
        # indexes average to ~1000 permille within a year (floor slack)
        s = sum(r["seasonal_index_permille"] for r in ms)
        assert 1000 * n - n <= s <= 1000 * n


def test_norm_histogram_covers_corpus(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        embed_norm_histogram,
    )
    from python_etl_rest_api_spark.catalog import _t
    rows = embed_norm_histogram(spark, SF).collect()
    assert rows
    n = _t(spark, SF, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    ).count()
    assert sum(r["n_vectors"] for r in rows) == n
    assert all(0 <= r["norm_bucket"] <= 19 for r in rows)


def test_dup_family_spectrum_accounting(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        text_dup_family_spectrum,
    )
    rows = {r["family_class"]: r for r in
            text_dup_family_spectrum(spark, SF).collect()}
    assert "unique" in rows
    for k, r in rows.items():
        assert r["n_docs"] >= r["n_families"] >= 1
        assert r["n_removable"] == r["n_docs"] - r["n_families"]
        if k == "unique":
            assert r["n_removable"] == 0
    share = sum(r["doc_share_permille"] for r in rows.values())
    assert 1000 - len(rows) <= share <= 1000


def test_priority_mix_drift_budget(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        orders_priority_mix_drift,
    )
    rows = orders_priority_mix_drift(spark, SF).collect()
    assert rows
    per_month: dict[int, int] = {}
    for r in rows:
        assert r["drift_permille"] \
            == r["obs_permille"] - r["exp_permille"]
        per_month[r["ym"]] = per_month.get(r["ym"], 0) \
            + r["obs_permille"]
    for ym, s in per_month.items():
        assert 1000 - 5 <= s <= 1000, ym


def test_source_quality_matrix_consistent_with_gate(spark):
    import python_etl_rest_api_spark.catalog_mining  # noqa: F401
    from python_etl_rest_api_spark.catalog import QUERIES as Q
    rows = Q["docs_source_quality_matrix"](spark, SF).collect()
    assert rows
    total_pass = sum(r["n_pass"] for r in rows)
    # cross-check against the per-doc gate it composes
    gate = Q["text_gopher_rules"](spark, SF)
    want = gate.filter(F.col("passes")).count()
    # sources are non-null on every doc in the testdata, so the rollup
    # must account for every passing doc
    assert total_pass == want
    for r in rows:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert r["pass_permille"] == r["n_pass"] * 1000 // r["n_docs"]


def test_token_budget_sums_exactly(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        _MIX_BUDGET, mix_token_budget_allocation,
    )
    rows = mix_token_budget_allocation(spark, SF).collect()
    assert rows
    # Hamilton's defining property: the allocation is EXACTLY the budget
    assert sum(r["alloc_tokens"] for r in rows) == _MIX_BUDGET
    total = sum(r["est_tokens"] for r in rows)
    for r in rows:
        lo = _MIX_BUDGET * r["est_tokens"] // total
        assert r["alloc_tokens"] in (lo, lo + 1)


def test_session_coverage_bounds(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        events_session_coverage,
    )
    r = events_session_coverage(spark, SF).collect()[0]
    assert r["n_users"] > 0
    assert r["n_merged_intervals"] >= r["n_users"]
    # merged coverage is at least one 30-min window per user and no
    # more than raw event count * 30 min
    e = _events(spark, SF).filter(F.col("user_id").isNotNull())
    n_events = e.count()
    assert r["covered_minutes"] >= r["n_users"] * 30 - r["n_users"]
    assert r["covered_minutes"] <= n_events * 30
    assert r["max_user_minutes"] * r["n_users"] >= r["covered_minutes"] \
        // max(1, r["n_users"]) * r["n_users"] // max(1, r["n_users"])


def test_degree_distribution_budget(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        graph_degree_distribution,
    )
    rows = graph_degree_distribution(spark, SF).collect()
    assert rows
    total_degree = sum(r["sum_degree"] for r in rows)
    assert total_degree % 2 == 0  # handshake lemma: 2 * |E|
    for r in rows:
        b = r["degree_bucket"]
        lo, hi = (1, 1) if b == 1 else (2 ** (b - 1), 2 ** b - 1)
        assert lo <= r["min_degree"] <= r["max_degree"] <= hi, r


def test_vocab_coverage_monotone(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        text_vocab_coverage_curve,
    )
    rows = sorted(text_vocab_coverage_curve(spark, SF).collect(),
                  key=lambda r: r["top_k"])
    assert [r["top_k"] for r in rows] == [10, 100, 1000]
    cov = [r["covered_tokens"] for r in rows]
    assert cov == sorted(cov)  # more types can only cover more mass
    total = rows[0]["total_tokens"]
    assert all(r["total_tokens"] == total for r in rows)
    for r in rows:
        assert 0 < r["covered_tokens"] <= total
        assert r["coverage_permille"] \
            == r["covered_tokens"] * 1000 // total


def test_peak_concurrency_sweep_invariants(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        events_peak_concurrency,
    )
    df = events_peak_concurrency(spark, SF)
    assert single_partition_window_ops(df) == []
    r = df.collect()[0]
    e = _events(spark, SF).filter(F.col("user_id").isNotNull())
    assert r["n_intervals"] == e.count()
    assert 1 <= r["peak_concurrent"] <= r["n_intervals"]
    # every open interval eventually closes: the sweep returns to zero
    assert r["min_live"] >= 0


def test_asof_tolerance_partitions_purchases(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        join_asof_tolerance,
    )
    rows = {r["outcome"]: r for r in
            join_asof_tolerance(spark, SF).collect()}
    assert set(rows) <= {"attributed", "expired", "no_touch"}
    total = sum(r["n_purchases"] for r in rows.values())
    n_purch = (_events(spark, SF)
               .filter(F.col("event_type") == "purchase").count())
    assert total == n_purch
    if "attributed" in rows:
        assert rows["attributed"]["sum_lag_minutes"] >= 0
    for k in ("expired", "no_touch"):
        if k in rows:
            assert rows[k]["sum_lag_minutes"] == 0


def test_burstiness_floor(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        text_term_burstiness,
    )
    rows = sorted(text_term_burstiness(spark, SF).collect(),
                  key=lambda r: r["rk"])
    assert 1 <= len(rows) <= 20
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    for r in rows:
        assert r["cf"] >= r["df"] >= 1
        assert r["burstiness_micros"] >= 1_000_000  # cf/df >= 1
        assert r["burstiness_micros"] == r["cf"] * 1_000_000 // r["df"]


def test_header_detail_reconcile_accounts_all_orders(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        dq_header_detail_reconcile,
    )
    from python_etl_rest_api_spark.catalog import _t
    rows = {r["status"]: r for r in
            dq_header_detail_reconcile(spark, SF).collect()}
    total = sum(r["n_orders"] for r in rows.values())
    assert total == _t(spark, SF, "orders").count()
    for k, r in rows.items():
        if k in ("exact", "no_lines"):
            assert r["sum_abs_diff_cents"] == 0
        assert r["max_abs_diff_cents"] <= r["sum_abs_diff_cents"] \
            or r["n_orders"] == 1 or r["sum_abs_diff_cents"] == 0


def test_basket_histogram_accounts_lineitem(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        orders_basket_size_histogram,
    )
    from python_etl_rest_api_spark.catalog import _t
    rows = orders_basket_size_histogram(spark, SF).collect()
    assert rows
    assert sum(r["total_lines"] for r in rows) \
        == _t(spark, SF, "lineitem").count()
    for r in rows:
        assert r["total_lines"] == r["basket_size"] * r["n_orders"]


def test_generalization_ladder_monotone(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        privacy_generalization_ladder,
    )
    rows = {r["level"]: r for r in
            privacy_generalization_ladder(spark, SF).collect()}
    assert set(rows) == {0, 1, 2}
    # coarsening can only merge classes: fewer classes, higher min k,
    # fewer exposed rows
    assert rows[0]["n_classes"] >= rows[1]["n_classes"] \
        >= rows[2]["n_classes"]
    assert rows[0]["min_k"] <= rows[1]["min_k"] <= rows[2]["min_k"]
    assert rows[0]["rows_below_k5"] >= rows[1]["rows_below_k5"] \
        >= rows[2]["rows_below_k5"]


def test_first_touch_brackets_last_touch(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        events_first_touch, join_asof_tolerance,
    )
    ft = {r["outcome"]: r for r in
          events_first_touch(spark, SF).collect()}
    total = sum(r["n_purchases"] for r in ft.values())
    lt = {r["outcome"]: r for r in
          join_asof_tolerance(spark, SF).collect()}
    assert total == sum(r["n_purchases"] for r in lt.values())
    # a purchase with no prior touch is organic under BOTH models
    assert ft.get("organic", {"n_purchases": 0})["n_purchases"] \
        == lt.get("no_touch", {"n_purchases": 0})["n_purchases"]
    if "first_touch" in ft:
        assert ft["first_touch"]["max_lag_days"] >= 0


def test_mann_kendall_identities(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        stats_mann_kendall,
    )
    r = stats_mann_kendall(spark, SF).collect()[0]
    n = r["n_days"]
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["n_concordant"] + r["n_discordant"] + r["n_ties"] \
        == r["n_pairs"]
    assert r["s_statistic"] == r["n_concordant"] - r["n_discordant"]
    assert abs(r["s_statistic"]) <= r["n_pairs"]


def test_boilerplate_prefix_families(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        docs_boilerplate_prefixes,
    )
    rows = sorted(docs_boilerplate_prefixes(spark, SF).collect(),
                  key=lambda r: r["rk"])
    for r in rows:
        assert r["n_docs"] >= 2
        assert len(r["prefix"].split(" ")) == 8
    ns = [r["n_docs"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_audio_clipping_closed_form(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        multimodal_audio_clipping,
    )
    rows = {r["media_id"]: r for r in
            multimodal_audio_clipping(spark, SF).collect()}
    assert len(rows) == 48
    for i, r in rows.items():
        n = 64 + i
        assert r["n_samples"] == n
        want = sum(1 for j in range(n)
                   if ((i * 31 + j * 7) % 256 - 128) * 256 <= -32768
                   or ((i * 31 + j * 7) % 256 - 128) * 256 >= 32512)
        assert r["n_clipped"] == want, i
        assert r["clipped_permille"] == want * 1000 // n


def test_reorder_gap_median_is_stored_value(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        orders_reorder_gap_median,
    )
    df = orders_reorder_gap_median(spark, SF)
    assert single_partition_window_ops(df) == []
    r = df.collect()[0]
    assert r["n_gaps"] > 0
    assert r["median_gap_days"] >= 0
    # the lower median must be an actual gap value (stored, never
    # interpolated): recompute from first principles
    from pyspark.sql import Window
    from python_etl_rest_api_spark.catalog import _t
    o = _t(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    gaps = sorted(
        o.select(F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date")).alias("g"))
        .filter(F.col("g").isNotNull()).toPandas()["g"])
    assert r["n_gaps"] == len(gaps)
    assert r["median_gap_days"] == gaps[(len(gaps) + 1) // 2 - 1]


def test_cms_width_curve_monotone(spark):
    from python_etl_rest_api_spark.catalog_mining import (
        _sketch_cms_width_curve,
    )
    rows = sorted(_sketch_cms_width_curve(spark, SF).collect(),
                  key=lambda r: r["width"])
    assert [r["width"] for r in rows] == [64, 256, 1024]
    exact = rows[0]["total_exact"]
    for r in rows:
        assert r["total_exact"] == exact        # same heavy hitters
        assert r["total_estimate"] >= exact     # CM never undershoots
        assert r["total_overestimate"] \
            == r["total_estimate"] - exact
    errs = [r["total_overestimate"] for r in rows]
    assert errs == sorted(errs, reverse=True)   # wider -> fewer hits


def test_session_coverage_deterministic_under_ts_ties(spark, tmp_path):
    """Regression for the grp-window tie hazard (ADVICE r6): two events
    of one user at the SAME timestamp must merge into one interval no
    matter the physical row order, because the running-sum grp window
    orders by the same (ts, event_id) total order is_new is computed
    over. Ordering grp by (s_us, e_us) instead leaves ties
    order-dependent (covered time then inflates nondeterministically)."""
    import datetime as dt

    from python_etl_rest_api_spark.catalog_mining import (
        events_session_coverage,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: tie at t0 (ids 1,2) + a separate window 1h later
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0, 1, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=1), 1, "view", 1.0, "{}"),
        # user 2: triple tie — all three must collapse to one interval
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0, 2, "view", 1.0, "{}"),
        (6, t0, 2, "view", 1.0, "{}"),
    ]
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    # expected: user 1 -> 2 intervals of 1800s, user 2 -> 1 interval
    expected = dict(n_users=2, n_merged_intervals=3,
                    covered_minutes=(3 * 1800) // 60,
                    max_user_minutes=(2 * 1800) // 60)
    for i, order in enumerate((rows, rows[::-1])):
        sf = str(tmp_path / f"sf_tie_{i}")
        (spark.createDataFrame(order, schema)
         .coalesce(1).write.mode("overwrite")
         .parquet(f"{sf}/events.parquet"))
        r = events_session_coverage(spark, sf).collect()[0].asDict()
        assert r == expected, f"order {i}: {r}"
