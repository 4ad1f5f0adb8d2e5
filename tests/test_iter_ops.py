"""Round-7 operators: integer PageRank, quantized k-means, incremental
band-index dedup, EWMA smoother, interval-overlap join, schema-drift
union, Welch t-test, video motion energy."""

import numpy as np
from pyspark.sql import functions as F

from python_etl_rest_api_spark import catalog_iter as ci
from python_etl_rest_api_spark.operators import cluster, dedup, graph

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ graph

def test_pagerank_triangle_fixpoint(spark):
    """A symmetric triangle is regular (deg 2 everywhere), so the uniform
    rank is an exact fixpoint of the integer recurrence: 150000 +
    850*1000000 div 1000 = 1000000."""
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)], "src long, dst long")
    out = {r.node: r["rank"] for r in graph.pagerank_int(e, iters=3).collect()}
    assert out == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}


def test_pagerank_star_hand_computed(spark):
    """Star a-b, a-c (symmetrized): two rounds of the integer recurrence
    computed by hand."""
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1)], "src long, dst long")
    out = {r.node: r["rank"] for r in graph.pagerank_int(e, iters=2).collect()}
    # r1: a = 150000 + 850*(1e6+1e6)//1000 = 1850000 ; leaves = 575000
    # r2: a = 150000 + 850*(575000+575000)//1000 = 1127500
    #     leaf = 150000 + 850*(1850000 div 2)//1000 = 936250
    assert out == {1: 1_127_500, 2: 936_250, 3: 936_250}


def test_pagerank_ranks_bounded_and_hub_wins(spark):
    """On the co-purchase graph: every rank >= the teleport floor, and
    the max-degree node outranks the min-degree node."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = graph.copurchase_edges(li).localCheckpoint()
    ranks = graph.pagerank_int(edges, iters=3)
    assert ranks.filter(F.col("rank") < 150_000).count() == 0
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    j = ranks.join(deg, ranks.node == deg.src)
    top = j.orderBy(F.col("rank").desc()).first()
    bot = j.orderBy(F.col("rank").asc()).first()
    assert top.d >= bot.d


# ---------------------------------------------------------------- cluster

def test_kmeans_two_obvious_clusters(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.01, 0.0]), (3, [1.0, 1.0]),
         (4, [1.01, 1.0])],
        "vec_id long, embedding array<double>")
    out = cluster.kmeans_int(cluster.quantize_int(df), k=2, iters=3)
    by = {r.id: r.cluster for r in out.collect()}
    assert by[1] == by[2] and by[3] == by[4] and by[1] != by[3]


def test_kmeans_identical_points_zero_dist(spark):
    df = spark.createDataFrame(
        [(i, [0.5, -0.5]) for i in range(5)],
        "vec_id long, embedding array<double>")
    out = cluster.kmeans_int(cluster.quantize_int(df), k=2, iters=2)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r.dist == 0 for r in rows)
    # all points tie at dist 0 -> deterministic tie-break to cluster 1
    assert all(r.cluster == 1 for r in rows)


def test_kmeans_quantization_portable_rounding(spark):
    """floor(x*1e6 + 0.5): the half-up grid snap the oracle mirrors."""
    df = spark.createDataFrame(
        [(1, [0.0000005, -0.0000005])],
        "vec_id long, embedding array<double>")
    q = cluster.quantize_int(df).first().qvec
    assert q == [1, 0]  # +0.5 ulp rounds up; -0.5 rounds toward zero


# ------------------------------------------------------------------ dedup

def test_incremental_probe_finds_cross_dup(spark, tmp_path):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, text), (2, "totally different words entirely here now ok"),
         (5, text), (10, "unrelated content that matches nothing at all")],
        "doc_id long, text string")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "bandidx")
    dedup.build_band_index(corpus, path)
    out = dedup.probe_band_index(spark, path, batch, corpus).collect()
    assert [(r.new_id, r.corpus_id, r.jaccard) for r in out] == [(5, 1, 1.0)]


def test_incremental_probe_matches_full_lsh(spark, tmp_path):
    """Cross pairs (one corpus doc, one batch doc) surfaced by the
    incremental probe must equal the corpus+batch near-dup pairs of the
    monolithic LSH restricted to cross pairs - index+probe is a pure
    re-partitioning of the same computation."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = dedup.minhash_near_dups(docs).collect()
    cross = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
             for r in full
             if (r.id_a % 5 == 0) != (r.id_b % 5 == 0)}
    path = str(tmp_path / "bandidx2")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    dedup.build_band_index(corpus, path)
    got = {(min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id))
           for r in dedup.probe_band_index(spark, path, batch,
                                           corpus).collect()}
    assert got == cross


def test_probe_rejects_mismatched_or_unstamped_index(spark, tmp_path):
    """A persisted band index carries its signature scheme; probing
    with different banding params (or probing a pre-stamping index)
    must fail loudly instead of silently finding zero candidates."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    path = str(tmp_path / "bandidx3")
    dedup.build_band_index(docs, path, num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="scheme"):
        dedup.probe_band_index(spark, path, docs, docs,
                               num_hashes=8, bands=2).collect()
    # legacy index without a _scheme stamp
    legacy = str(tmp_path / "bandidx_legacy")
    dedup.minhash_bands(docs).write.mode("overwrite").parquet(legacy)
    with pytest.raises(ValueError, match="no _scheme"):
        dedup.probe_band_index(spark, legacy, docs, docs).collect()


# ------------------------------------------------------------------- ewma

def test_ewma_recurrence_hand_checked(spark):
    out = {(r.event_type, str(r.day)): r
           for r in ci.events_ewma_daily(spark, SF).collect()}
    # recompute one type's series in plain python
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .filter(F.col("event_type") == "click")
          .groupBy(F.to_date("ts").alias("day"))
          .agg(F.sum(F.floor(1000000.0 * F.col("value"))
                     .cast("long")).alias("sm"))
          .orderBy("day").collect())
    s = None
    for r in ev:
        x = r.sm / 1000000.0
        s = x if s is None else 0.25 * x + 0.75 * s
        got = out[("click", str(r.day))]
        assert got.day_sum_micros == r.sm
        assert got.ewma == s  # bit-identical, same fold order


# ----------------------------------------------------------- interval join

def test_interval_overlap_equals_naive_join(spark):
    """The grid-bucketed plan must reproduce the declarative overlap
    join exactly (same pairs, same overlap lengths)."""
    out = ci.join_interval_overlap(spark, "/root/testdata/sf0.01")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")

    def iv(p):
        return (o.filter(F.col("o_orderpriority") == p)
                .select(F.col("o_custkey").alias("c"),
                        F.col("o_orderkey").alias("k"),
                        F.to_date("o_orderdate").alias("s"))
                .withColumn("e", F.date_add("s", 7)))

    u, lo = iv("1-URGENT").alias("u"), iv("5-LOW").alias("l")
    naive = (u.join(lo, (F.col("u.c") == F.col("l.c"))
                    & (F.col("u.s") <= F.col("l.e"))
                    & (F.col("l.s") <= F.col("u.e")))
             .select(F.col("u.k").alias("uk"), F.col("l.k").alias("lk"),
                     (F.datediff(F.least("u.e", "l.e"),
                                 F.greatest("u.s", "l.s")) + 1)
                     .alias("ov")))
    got = {(r.urgent_key, r.low_key, r.overlap_days) for r in out.collect()}
    want = {(r.uk, r.lk, r.ov) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_interval_overlap_days_in_range(spark):
    rows = ci.join_interval_overlap(spark, "/root/testdata/sf0.01").collect()
    assert all(1 <= r.overlap_days <= 8 for r in rows)


# ------------------------------------------------------------ schema drift

def test_schema_drift_union_nulls_by_generation(spark):
    out = ci.schema_drift_union(spark, SF)
    assert out.columns == ["o_orderkey", "o_custkey", "o_totalprice",
                           "o_orderstatus", "o_orderdate"]
    even = out.filter(F.col("o_orderkey") % 2 == 0)
    odd = out.filter(F.col("o_orderkey") % 2 == 1)
    assert even.filter(F.col("o_orderstatus").isNotNull()).count() == 0
    assert even.filter(F.col("o_totalprice").isNull()).count() == 0
    assert odd.filter(F.col("o_totalprice").isNotNull()).count() == 0
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert out.count() == n


# ------------------------------------------------------------------ welch

def test_welch_against_numpy(spark):
    row = ci.stats_welch_ttest(spark, SF).first()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = np.array([int(np.floor(1e6 * v)) for (v,) in
                  ev.filter(F.col("event_type") == "click")
                  .select("value").collect() if v is not None]) / 1e6
    b = np.array([int(np.floor(1e6 * v)) for (v,) in
                  ev.filter(F.col("event_type") == "view")
                  .select("value").collect() if v is not None]) / 1e6
    va, vb = a.var(ddof=1), b.var(ddof=1)
    t = (a.mean() - b.mean()) / np.sqrt(va / len(a) + vb / len(b))
    dof = ((va / len(a) + vb / len(b)) ** 2
           / ((va / len(a)) ** 2 / (len(a) - 1)
              + (vb / len(b)) ** 2 / (len(b) - 1)))
    assert row.n_click == len(a) and row.n_view == len(b)
    assert abs(row.t_stat - t) < 1e-9
    assert abs(row.welch_dof - dof) < 1e-6


# ------------------------------------------------------------------ motion

def test_motion_energy_closed_form(spark):
    from python_etl_rest_api_spark.operators.multimodal import (
        motion_energy, synthesize_avi_media)
    out = motion_energy(synthesize_avi_media(spark, n=6)).collect()
    # row count: one per adjacent pair per media
    nf = {i: 6 + i % 5 for i in range(6)}
    assert len(out) == sum(n - 1 for n in nf.values())
    by = {(r.media_id, r.frame_idx): r for r in out}
    for i in range(6):
        w, h = 8 + 4 * (i % 3), 6 + i % 3
        for f in range(1, nf[i]):
            sad = changed = 0
            for x in range(w):
                for y in range(h):
                    d = abs((i * 7 + f * 31 + x * 3 + y * 5) % 256
                            - (i * 7 + (f - 1) * 31 + x * 3 + y * 5) % 256)
                    sad += d
                    changed += d > 0
            r = by[(i, f)]
            assert (r.sad, r.changed_px, r.width, r.height) \
                == (sad, changed, w, h)


# --------------------------------------------------------------- triangles

def test_triangle_census_hand_graph(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: 1 triangle, wedges =
    sum(d*(d-1))/2 = (2+2+6+0)/2 = 5, transitivity 0.6."""
    p = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long")
    r = graph.triangle_stats(p).first()
    assert (r.n_edges, r.n_triangles, r.n_wedges) == (4, 1, 5)
    assert abs(r.transitivity - 0.6) < 1e-12


def test_triangle_census_no_triangles(spark):
    p = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    r = graph.triangle_stats(p).first()
    assert (r.n_triangles, r.n_wedges, r.transitivity) == (0, 0, 0.0)


# -------------------------------------------------------------------- holt

def test_holt_recurrence_hand_checked(spark):
    out = {r.event_type: r for r in ci.events_holt_forecast(spark, SF).collect()}
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .filter(F.col("event_type") == "view")
          .groupBy(F.to_date("ts").alias("day"))
          .agg(F.sum(F.floor(1000000.0 * F.col("value"))
                     .cast("long")).alias("sm"))
          .orderBy("day").collect())
    xs = [r.sm / 1000000.0 for r in ev]
    l, b = xs[0], 0.0
    for x in xs[1:]:
        lnew = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * ((0.3 * x + 0.7 * (l + b)) - l) + 0.8 * b
        l = lnew
    r = out["view"]
    assert r.n_days == len(xs)
    assert r.level == l and r.trend == b          # bit-identical fold
    assert r.forecast_next == l + b
    assert r.forecast_7d == l + 7.0 * b


# --------------------------------------------------------------- mix plan

def test_mix_epoch_plan_arithmetic(spark):
    rows = ci.mix_epoch_plan(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        num = int(r.source[3:])
        assert r.weight_milli == (num % 4 + 1) * 100
        assert r.epochs == -(-r.need_tokens // r.avail_tokens)
        assert abs(r.oversample - r.need_tokens / r.avail_tokens) < 1e-12
    total_need = sum(r.need_tokens for r in rows)
    total_avail = sum(r.avail_tokens for r in rows)
    # needs sum to ~2x the inventory (integer floor per source)
    assert 0 <= 2 * total_avail - total_need < 1000 * len(rows)


# ---------------------------------------------------------------- url canon

def test_canonicalize_url_rules(spark):
    from python_etl_rest_api_spark.operators.text import canonicalize_url
    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b?utm_source=x&z=1&a=2#frag",
         "http://www.ex.com/A/b?a=2&z=1"),
        ("https://Ex.com:443/p", "https://ex.com/p"),
        ("https://ex.com:8080/p?utm_a=1&utm_b=2", "https://ex.com:8080/p"),
        ("http://ex.com:443/p", "http://ex.com:443/p"),  # non-default kept
        ("http://ex.com/", "http://ex.com/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


# ---------------------------------------------------------------------- orc

def test_orc_roundtrip_matches_parquet(spark):
    out = {(r.o_orderstatus, r.o_orderpriority): r
           for r in ci.source_orc_roundtrip(spark, SF).collect()}
    ref = (spark.read.parquet(f"{SF}/orders.parquet")
           .groupBy("o_orderstatus", "o_orderpriority")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double").alias("s"),
                F.min("o_orderdate").alias("lo"),
                F.max("o_orderdate").alias("hi")))
    for r in ref.collect():
        g = out[(r.o_orderstatus, r.o_orderpriority)]
        assert (g.n_orders, g.sum_total, g.first_date, g.last_date) \
            == (r.n, r.s, r.lo, r.hi)


# --------------------------------------------------------------------- hll

def test_hll_registers_and_estimate(spark):
    rows = {r.source: r for r in
            ci.sketch_hll_cardinality(spark, SF).collect()}
    assert len(rows) == 20
    for r in rows.values():
        # raw estimator with m=64 on ~25 distinct docs is biased but
        # must land within a sane band of truth
        assert 0.3 * r.n_true < r.hll_estimate < 3.5 * r.n_true
        assert 0 <= r.zero_regs <= 64


def test_hll_python_mirror(spark):
    """Recompute one source's registers in pure python from md5 - the
    sketch must match bit-for-bit."""
    import hashlib
    docs = [r.text for r in spark.read.parquet(f"{SF}/documents.parquet")
            .filter(F.col("source") == "src3").select("text").collect()
            if r.text is not None]
    regs = [0] * 64
    for t in docs:
        hx = hashlib.md5(("hll:" + t).encode()).hexdigest()
        b = int(hx[:2], 16) % 64
        w = int(hx[2:12], 16)
        rho = 41 if w == 0 else (40 - w.bit_length() + 1)
        regs[b] = max(regs[b], rho)
    row = [r for r in ci.sketch_hll_cardinality(spark, SF).collect()
           if r.source == "src3"][0]
    assert row.reg_sum == sum(regs)
    assert row.reg_dot == sum(r * i for i, r in enumerate(regs))
    assert row.zero_regs == regs.count(0)


# ------------------------------------------------------------------- cusum

def test_cusum_recurrence_hand_checked(spark):
    out = {(r.event_type, str(r.day)): r
           for r in ci.events_cusum_drift(spark, SF).collect()}
    d = (spark.read.parquet(f"{SF}/events.parquet")
         .filter(F.col("event_type") == "purchase")
         .groupBy(F.to_date("ts").alias("day"))
         .agg(F.sum(F.floor(1000000.0 * F.col("value")).cast("long"))
              .alias("sm"))
         .orderBy("day").collect())
    xs = [r.sm for r in d]
    target = sum(xs) // len(xs)
    slack = target // 20
    s = 0
    for r in d:
        s = max(0, s + r.sm - target - slack)
        got = out[("purchase", str(r.day))]
        assert got.cusum_micros == s
        assert got.alarm == (s > 5 * slack)


# ----------------------------------------------------------------- streaks

def test_activity_streaks_against_python(spark):
    from collections import defaultdict
    rows = {r.streak_days: (r.n_users, r.total_streaks)
            for r in ci.events_activity_streaks(spark, SF).collect()}
    ud = defaultdict(set)
    for r in (spark.read.parquet(f"{SF}/events.parquet")
              .select("user_id", F.to_date("ts").alias("day")).collect()):
        if r.user_id is not None and r.day is not None:
            ud[r.user_id].add(r.day)
    dist = defaultdict(lambda: [0, 0])
    for u, days in ud.items():
        ds = sorted(days)
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                runs.append(cur); cur = 1
        runs.append(cur)
        dist[max(runs)][0] += 1
        dist[max(runs)][1] += len(runs)
    assert rows == {k: tuple(v) for k, v in dist.items()}
