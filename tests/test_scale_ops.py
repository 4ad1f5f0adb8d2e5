"""Round-4 scale-pattern operators (catalog_scale): bloom prefilter
soundness, stratified sampling stratum rates, trailing range-frame
windows, unigram rarity."""

from pyspark.sql import functions as F

from python_etl_rest_api_spark import catalog_scale as cs

SF = "/root/testdata/sf0.001"


def test_bloom_prefilter_no_false_negatives(spark):
    """The defining bloom property: a key that IS in the build set can
    never be filtered out - n_exact must equal the true semi-join count;
    false positives are allowed (and reported)."""
    row = cs.join_bloom_prefilter(spark, SF).collect()[0]
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    true_n = (orders.join(
        cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"), "left_semi").count())
    assert row.n_exact == true_n
    assert row.n_bloom_pass == row.n_exact + row.n_false_pos
    assert row.n_bloom_pass <= row.n_orders


def test_bloom_prefilter_actually_prunes(spark):
    """The filter must do SOMETHING: with 1024 bits and k=2 the pass set
    must be well under the full probe side (else m is mis-sized)."""
    row = cs.join_bloom_prefilter(spark, SF).collect()[0]
    assert row.n_bloom_pass < row.n_orders


def test_stratified_sample_rates(spark):
    """Every surviving row's bucket respects its stratum threshold, and
    the en stratum is sampled harder than the rest (96 < 160)."""
    out = cs.sample_stratified_docs(spark, SF)
    bad = out.filter(
        (F.col("lang") == "en") & (F.col("bucket") >= 96)
        | (F.col("lang") != "en") & (F.col("bucket") >= 224)).count()
    assert bad == 0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = {r.lang: r.n for r in
            out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en keep-ratio must be below the others' (heavy downsample stratum)
    if "en" in kept and any(l != "en" for l in kept):
        en_ratio = kept["en"] / total["en"]
        other = max(kept[l] / total[l] for l in kept if l != "en")
        assert en_ratio < other


def test_rolling_1h_window_semantics(spark):
    """Events 0s, 30m, 90m apart for one user: the third event's 1-hour
    trailing count sees only itself + the 30m-earlier one; RANGE peers
    (simultaneous events) count each other."""
    rows = [(1, 100, "2024-01-01 00:00:00", 1.0),
            (2, 100, "2024-01-01 00:30:00", 5.0),
            (3, 100, "2024-01-01 01:30:00", 2.0),
            (4, 100, "2024-01-01 01:30:00", 3.0),  # simultaneous peer
            (5, 200, "2024-01-01 00:10:00", 9.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    orig = cs._events
    cs._events = lambda s, d: df
    try:
        out = {r.event_id: r for r in
               cs.events_rolling_1h(spark, "unused").collect()}
    finally:
        cs._events = orig
    assert out[1].n_1h == 1 and out[1].max_value_1h == 1.0
    assert out[2].n_1h == 2 and out[2].max_value_1h == 5.0
    # 00:30 is exactly 3600s before 01:30 -> outside the 3599999999us frame
    assert out[3].n_1h == 2 and out[3].max_value_1h == 3.0
    assert out[4].n_1h == 2  # peers include each other under RANGE
    assert out[5].n_1h == 1


def test_unigram_rarity_orders_docs(spark):
    """A doc of corpus-common tokens scores higher commonness than a doc
    of hapaxes; integer columns are exact."""
    docs = spark.createDataFrame(
        [(1, "the the the"), (2, "zyx qwv jkl"), (3, "the zyx the")],
        "doc_id long, text string")
    orig = cs._t
    cs._t = lambda s, d, n: docs
    try:
        out = {r.doc_id: r for r in
               cs.text_unigram_rarity(spark, "unused").collect()}
    finally:
        cs._t = orig
    # corpus: the x5, zyx x2, qwv x1, jkl x1 -> total 9
    assert out[1].n_tokens == 3 and out[1].sum_tok_freq == 15
    assert out[2].sum_tok_freq == 4
    assert out[1].commonness > out[3].commonness > out[2].commonness


def test_rollup_merge_equals_direct(spark):
    """The algebraic-aggregate property the rollup rests on: monthly
    totals merged from the daily pre-aggregate == direct monthly over
    raw rows, bit-for-bit (decimal sums)."""
    merged = {r.month: (r.month_total, r.month_n)
              for r in cs.rollup_incremental_merge(spark, SF).collect()}
    direct = {r.month: (r.t, r.n) for r in
              spark.read.parquet(f"{SF}/orders.parquet")
              .groupBy(F.date_trunc("month", "o_orderdate").cast("date")
                       .alias("month"))
              .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("double").alias("t"),
                   F.count("*").alias("n")).collect()}
    assert merged == direct


def test_zorder_buckets_bound_both_dims(spark):
    """Grouping by the top 4 interleaved bits fixes the high 2 bits of
    BOTH dimensions, so every z-bucket spans <= 4 consecutive values in
    each dim - the property that lets a filter on either column prune
    ~3/4 of the files (a lexicographic sort only bounds its leading
    column)."""
    rows = cs.layout_zorder_stats(spark, SF).collect()
    assert 1 <= len(rows) <= 16
    for r in rows:
        assert r.max_nation_b - r.min_nation_b <= 3
        assert r.max_bal_b - r.min_bal_b <= 3


def test_table_checksum_partition_invariant_and_sensitive(spark):
    """Same rows in any partitioning -> identical signature; one changed
    row -> different signature."""
    orig = cs.table_checksum(spark, SF).collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    shuffled = orders.repartition(13, "o_custkey")
    orig_t = cs._t
    cs._t = lambda s, d, n: shuffled
    try:
        re = cs.table_checksum(spark, "unused").collect()[0]
    finally:
        cs._t = orig_t
    assert (re.n_rows, re.xor_sig, re.sum_sig) == \
        (orig.n_rows, orig.xor_sig, orig.sum_sig)

    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == orders.select(F.min("o_orderkey"))
               .collect()[0][0], F.lit("ZZ"))
        .otherwise(F.col("o_orderstatus")))
    cs._t = lambda s, d, n: mutated
    try:
        mu = cs.table_checksum(spark, "unused").collect()[0]
    finally:
        cs._t = orig_t
    assert mu.n_rows == orig.n_rows and mu.xor_sig != orig.xor_sig


def test_linear_trend_exact_on_synthetic(spark):
    """y = 2x + 1 recovered exactly (decimal sums, one double division)."""
    rows = [(i, "2024-01-01 %02d:00:00" % h, float(2 * h + 1), "t")
            for i, h in enumerate([0, 3, 7, 11, 19, 23])]
    df = (spark.createDataFrame(rows, "event_id long, ts string, "
                                      "value double, event_type string")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    orig = cs._events
    cs._events = lambda s, d: df
    try:
        out = cs.events_linear_trend(spark, "unused").collect()
    finally:
        cs._events = orig
    assert len(out) == 1 and out[0].n == 6
    assert out[0].slope == 2.0


def test_decontam_flags_shared_5gram(spark):
    """A train doc sharing a 5-gram with the benchmark set (doc_id%50==0)
    is flagged; disjoint docs are not; bench docs are excluded."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),      # benchmark
         (1, "x alpha beta gamma delta epsilon y"),       # contains bench 5-gram
         (2, "one two three four five six seven"),        # clean
         (3, "al be ga")],                                # too short
        "doc_id long, text string")
    orig = cs._t
    cs._t = lambda s, d, n: docs
    try:
        out = {r.doc_id: r for r in
               cs.decontam_ngram_overlap(spark, "unused").collect()}
    finally:
        cs._t = orig
    assert set(out) == {1, 2, 3}
    assert out[1].contaminated and out[1].n_shared == 1
    assert not out[2].contaminated and out[2].n_shared == 0
    assert not out[3].contaminated


def test_repetition_score_separates_loops_from_prose(spark):
    docs = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham spam ham spam ham"),
         (2, "the quick brown fox jumps over a lazy dog"),
         (3, "a b")],                                     # < 3 tokens
        "doc_id long, text string")
    orig = cs._t
    cs._t = lambda s, d, n: docs
    try:
        out = {r.doc_id: r for r in
               cs.text_repetition_score(spark, "unused").collect()}
    finally:
        cs._t = orig
    # doc1: 8 trigrams, only 2 distinct -> 0.75 repetition
    assert out[1].n_trigrams == 8 and out[1].n_distinct == 2
    assert abs(out[1].repetition - 0.75) < 1e-12
    assert out[2].repetition == 0.0
    assert out[3].n_trigrams == 0 and out[3].repetition == 0.0


def test_count_min_overestimates_never_under(spark):
    """CM law: every estimate >= the exact count (min over rows of
    additive cells can only over-count collisions), checked against a
    driver-side Counter; and the top-1 heavy hitter is the true one."""
    from collections import Counter

    from python_etl_rest_api_spark.catalog_scale import sketch_count_min

    rows = sketch_count_min(spark, SF).collect()
    assert len(rows) == 10
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    cnt = Counter(t for d in docs for t in d.text.split(" "))
    for r in rows:
        assert cnt[r.tok] == r.exact_count
        assert r.cm_estimate >= r.exact_count
        assert r.overestimate == r.cm_estimate - r.exact_count >= 0
    top_tok, top_c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    got_top = sorted(rows, key=lambda r: (-r.exact_count, r.tok))[0]
    assert (got_top.tok, got_top.exact_count) == (top_tok, top_c)
