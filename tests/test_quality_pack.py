"""Quality-filter pack (catalog_quality.py): semantic invariants the
oracle value-hash can't express — rule-flag consistency, LM probability
normalization, distribution-function range laws, Gram-matrix symmetry
against a driver-side numpy ground truth."""

import math

import numpy as np
from pyspark.sql import functions as F

from python_etl_rest_api_spark.catalog_quality import (
    embed_gram_matrix,
    text_gopher_rules,
    text_unigram_logprob,
    w8_percent_rank_cume,
)

SF = "/root/testdata/sf0.001"


def test_gopher_rules_flags_consistent(spark):
    rows = text_gopher_rules(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_words >= 1
        # recomputed conjunction matches the published pass flag
        expect = (20 <= r.n_words <= 100000
                  and 2.0 <= r.mean_word_len <= 10.0
                  and r.unique_ratio >= 0.1
                  and r.stop_distinct >= 2
                  and r.nonalpha_words / r.n_words <= 0.1)
        assert r.passes == expect, r
        assert r.passes == (r.r_word_count and r.r_mean_word_len
                            and r.r_unique_ratio and r.r_stopwords
                            and r.r_symbol_ratio)
        assert 0.0 < r.unique_ratio <= 1.0
        assert 0 <= r.stop_distinct <= 8
    # the synthetic corpus is clean lowercase prose: most docs pass
    assert sum(r.passes for r in rows) > len(rows) / 2


def test_unigram_logprob_is_a_lm(spark):
    rows = text_unigram_logprob(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    # every score is a mean of log-probabilities: strictly negative
    # (no token covers the whole corpus) and bounded below by ln(1/N)
    n_total = sum(len(d.text.split(" ")) for d in docs)
    for r in rows:
        assert r.avg_logprob < 0.0
        assert r.avg_logprob >= math.log(1.0 / n_total) - 1e-9
    # driver-side ground truth for one document
    from collections import Counter
    cnt = Counter(t for d in docs for t in d.text.split(" "))
    d0 = docs[0]
    toks = d0.text.split(" ")
    want = sum(math.log(cnt[t] / n_total) for t in toks) / len(toks)
    got = next(r for r in rows if r.doc_id == d0.doc_id)
    assert abs(got.avg_logprob - want) < 1e-6
    assert got.n_tokens == len(toks)


def test_percent_rank_cume_dist_laws(spark):
    df = w8_percent_rank_cume(spark, SF)
    rows = df.collect()
    assert rows
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in by_cust.items():
        n = len(rs)
        rs.sort(key=lambda r: r.o_totalprice)
        # pr in [0,1] with the min order at 0; cd in (0,1] ending at 1
        assert rs[0].pr == 0.0
        assert max(r.pr for r in rs) <= 1.0
        assert max(r.cd for r in rs) == 1.0
        assert min(r.cd for r in rs) >= 1.0 / n - 1e-12
        # cume_dist is monotone along the sort
        cds = [r.cd for r in rs]
        assert cds == sorted(cds)


def test_gram_matrix_matches_numpy(spark):
    rows = embed_gram_matrix(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    X = np.asarray([np.asarray(r.embedding, dtype=np.float64)
                    for r in emb])
    G = X.T @ X
    assert len(rows) == 64 * 65 // 2  # upper triangle incl. diagonal
    for r in rows:
        assert r.j >= r.i
        assert abs(r.g - G[r.i, r.j]) < 1e-5, (r.i, r.j)
    # diagonal of a Gram matrix is non-negative
    assert all(r.g >= 0 for r in rows if r.i == r.j)


def test_winsorized_clamps_bounded(spark):
    from python_etl_rest_api_spark.catalog_quality import (
        events_value_winsorized)
    rows = events_value_winsorized(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p05 <= r.p95
        # nearest-rank cutoffs clamp at most ~5% per tail (+1 for the
        # rank-boundary row)
        assert r.n_low <= r.n * 0.05 + 1
        assert r.n_high <= r.n * 0.05 + 1
        # winsor_sum_micros is the exact integer publication of the
        # mean: floored micros summed as int64 (see catalog_quality).
        mean = r.winsor_sum_micros / r.n / 1e6
        assert r.p05 - 1e-6 <= mean <= r.p95 + 1e-6


def test_revenue_concentration_is_a_lorenz_curve(spark):
    from python_etl_rest_api_spark.catalog_quality import (
        orders_revenue_concentration)
    rows = sorted(orders_revenue_concentration(spark, SF).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    # deciles partition the customer population near-evenly
    ns = [r.n_customers for r in rows]
    assert max(ns) - min(ns) <= 1
    # customers are ranked by DESCENDING revenue: decile revenue mass
    # is non-increasing and the cumulative share ends at 1
    revs = [r.decile_revenue for r in rows]
    assert all(a >= b - 1e-6 for a, b in zip(revs, revs[1:]))
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    # concentration: the top decile carries more than a uniform share
    assert shares[0] > 0.1


def test_top_pc_is_the_spectral_axis(spark):
    from python_etl_rest_api_spark.catalog_quality import embed_top_pc
    rows = sorted(embed_top_pc(spark, SF).collect(),
                  key=lambda r: r.pos)
    v = np.asarray([r.comp for r in rows])
    assert len(v) == 64
    # unit norm (up to the published rounding)
    assert abs(float((v * v).sum()) - 1.0) < 1e-4
    # sign pin: the largest-|.| component is positive
    assert v[int(np.argmax(np.abs(v)))] > 0
    # ground truth: literally the same five power steps in numpy (the
    # corpus is random unit vectors, so the Gram spectrum is nearly
    # flat and five steps need NOT converge to the eigh top vector -
    # the contract is the fixed iteration, not convergence)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    X = np.asarray([np.asarray(r.embedding, dtype=np.float64)
                    for r in emb])
    G = X.T @ X
    u = np.full(64, 0.125)
    rayleigh = [float(u @ G @ u) / float(u @ u)]
    for _ in range(5):
        mu = G @ u
        u = mu / np.sqrt(float((mu * mu).sum()))
        rayleigh.append(float(u @ G @ u))
    if u[int(np.argmax(np.abs(u)))] < 0:
        u = -u
    assert float(abs(u @ v)) > 0.999999
    # power iteration on a PSD matrix ascends the Rayleigh quotient
    assert all(b >= a - 1e-9 for a, b in zip(rayleigh, rayleigh[1:]))


def test_bigram_logprob_is_a_conditional_lm(spark):
    """Smoothed bigram LM laws + a driver-side Counter ground truth for
    one document, and the fluency property the unigram score lacks: a
    document of real adjacent transitions outscores the same TOKENS in
    scrambled order."""
    import math
    from collections import Counter

    from python_etl_rest_api_spark.catalog_quality import (
        text_bigram_logprob,
    )

    rows = {r.doc_id: r for r in text_bigram_logprob(spark, SF).collect()}
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    # every multi-token doc appears; scores strictly negative
    for r in rows.values():
        assert r.avg_logprob < 0.0
    # ground truth for one document
    bi = Counter()
    ctx = Counter()
    vocab = set()
    for d in docs:
        t = d.text.split(" ")
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            bi[(a, b)] += 1
            ctx[a] += 1
    v = len(vocab)
    d0 = docs[0]
    t0 = d0.text.split(" ")
    pairs = list(zip(t0, t0[1:]))
    want = sum(math.log((bi[p] + 1.0) / (ctx[p[0]] + v))
               for p in pairs) / len(pairs)
    got = rows[d0.doc_id]
    assert got.n_bigrams == len(pairs)
    assert abs(got.avg_logprob - want) < 1e-6
    # fluency: on a CONTROLLED corpus with real transition structure
    # (many repeats of "a b c d"), a document of seen transitions must
    # outscore the same tokens reversed (all-unseen transitions). The
    # main synthetic corpus is order-random, so the property is only
    # testable on constructed input.
    ctrl = spark.createDataFrame(
        [(i, "a b c d") for i in range(20)]
        + [(100, "a b c d"), (101, "d c b a")],
        "doc_id long, text string")
    from pyspark.sql import functions as F
    toks = ctrl.select("doc_id", F.split("text", " ").alias("t"))
    bigr = toks.select(
        "doc_id",
        F.explode(F.expr(
            "case when size(t) >= 2 then transform(sequence(1, size(t)-1),"
            " i -> struct(element_at(t, i) as w1,"
            " element_at(t, i+1) as w2)) else array() end")).alias("b")) \
        .select("doc_id", "b.w1", "b.w2")
    cb = bigr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cc = cb.groupBy("w1").agg(F.sum("c").alias("cc"))
    vocab_n = (ctrl.select(F.explode(F.split("text", " ")).alias("tok"))
               .agg(F.countDistinct("tok").alias("v")))
    lp = (cb.join(cc, "w1").crossJoin(F.broadcast(vocab_n))
          .select("w1", "w2",
                  F.log((F.col("c") + F.lit(1.0))
                        / (F.col("cc") + F.col("v"))).alias("logp")))
    out = {r.doc_id: r.avg for r in
           bigr.join(F.broadcast(lp), ["w1", "w2"])
           .groupBy("doc_id").agg(F.avg("logp").alias("avg")).collect()}
    assert out[100] > out[101]
