"""Round-4 scale-pattern catalog entries: the distributed idioms a
100 TB training-data pipeline leans on beyond the reference surface -
stratified content-hash sampling, trailing event-time range frames, a
broadcast bloom-filter join prefilter, and a corpus-frequency document
quality score.

The reference (a 313-line pandas/FastAPI test) has none of these; they
follow the repo's cross-engine exactness recipe: md5 for portable
hashing, integer sums divided once in double, no libm transcendentals
(SURVEY.md section 7.3, same reasoning as text_tfidf_top_terms's
log-free idf).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import _events, _t, query
from .operators import text


# ---------------------------------------------------------------------
# Stratified sampling (content-keyed, per-stratum rates)
# ---------------------------------------------------------------------

# Per-language keep thresholds out of 256 hash buckets: downsample the
# over-represented language hard, keep the tail. The MAP is the operator;
# the rates are a config literal.
STRATA_KEEP = {"en": 96, "de": 160, "es": 160, "fr": 160}
DEFAULT_KEEP = 224


@query("sample_stratified_docs", """
    WITH b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(text), 1, 2))::BIGINT AS INTEGER)
               AS bucket
      FROM documents)
    SELECT doc_id, lang, bucket
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 96 WHEN 'de' THEN 160
                             WHEN 'es' THEN 160 WHEN 'fr' THEN 160
                             ELSE 224 END
""")
def sample_stratified_docs(spark, sf_dir):
    """Stratified downsampling with per-stratum rates (rebalancing a
    language-skewed corpus is the first stage of most curation recipes).
    Keyed on the CONTENT hash, not rand(): byte-identical docs sample
    identically across runs/engines/partitionings, and the decision
    composes with data_split_assign's leakage guarantee (same bucket
    space). A narrow map stage - zero shuffle at any scale; the rate
    table is a CASE literal, not a join."""
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 2), 16, 10) \
        .cast("int")
    keep = None
    for lang, thresh in STRATA_KEEP.items():
        keep = (F.when(F.col("lang") == lang, thresh) if keep is None
                else keep.when(F.col("lang") == lang, thresh))
    keep = keep.otherwise(F.lit(DEFAULT_KEEP))
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", "lang", bucket.alias("bucket"))
            .filter(F.col("bucket") < keep))


# ---------------------------------------------------------------------
# Trailing event-time window (RANGE frame over epoch micros)
# ---------------------------------------------------------------------

@query("events_rolling_1h", """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           MAX(value) OVER w AS max_value_1h
    FROM (SELECT event_id, user_id, value,
                 epoch_us(ts) AS us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
""")
def events_rolling_1h(spark, sf_dir):
    """Per-user trailing 1-hour activity (count + max) via a RANGE frame
    over integer epoch microseconds - the event-time rolling aggregate
    behind rate limiting, burst detection, and feature windows. RANGE
    (not ROWS) so simultaneous events are peers in both engines; integer
    micros so the frame bound is exact cross-engine; count/max are
    order-free aggregates (a double SUM here would hash-diverge on fold
    order). ONE shuffle on user_id; each partition sorts locally -
    at 100 TB this is the same cost shape as any per-entity window."""
    w = (Window.partitionBy("user_id").orderBy("us")
         .rangeBetween(-3_599_999_999, Window.currentRow))
    return (_events(spark, sf_dir)
            .select("event_id", "user_id", "value",
                    F.unix_micros("ts").alias("us"))
            .select("event_id", "user_id",
                    F.count(F.lit(1)).over(w).alias("n_1h"),
                    F.max("value").over(w).alias("max_value_1h")))


# ---------------------------------------------------------------------
# Bloom-filter join prefilter (broadcast a bitset, not the keys)
# ---------------------------------------------------------------------

BLOOM_BITS = 1024  # 32x32-bit words (in BIGINT slots); k=2 md5 probes
# 32-bit words, not 64: DuckDB checks signed overflow on <<, so bit 63
# of a BIGINT word would raise; capping shifts at 31 is portable.
_WORDS = BLOOM_BITS // 32


def _bloom_positions(key_col):
    """Two independent probe positions in [0, BLOOM_BITS) from one md5:
    hex digits 1-6 and 7-12 (portable to the SQL oracle verbatim)."""
    h = F.md5(key_col.cast("string"))
    p1 = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % BLOOM_BITS
    p2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("long") % BLOOM_BITS
    return p1, p2


@query("join_bloom_prefilter", """
    WITH keys AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    kpos AS (
      SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6))::BIGINT
               % 1024 AS p FROM keys
      UNION ALL
      SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6))::BIGINT
               % 1024 AS p FROM keys),
    bloom AS (
      SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER))
               AS mask
      FROM kpos GROUP BY 1),
    opos AS (
      SELECT o_orderkey, o_custkey, u.p
      FROM orders, LATERAL (VALUES
        (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 6))::BIGINT
           % 1024),
        (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 7, 6))::BIGINT
           % 1024)) AS u(p)),
    probe AS (
      SELECT o.o_orderkey, o.o_custkey,
             MIN(CASE WHEN b.mask IS NOT NULL
                       AND (b.mask >> CAST(o.p % 32 AS INTEGER)) & 1 = 1
                      THEN 1 ELSE 0 END) AS hit
      FROM opos o LEFT JOIN bloom b ON o.p // 32 = b.word
      GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(hit) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN hit = 1 AND o_custkey IN
                       (SELECT c_custkey FROM keys)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN hit = 1 AND o_custkey NOT IN
                       (SELECT c_custkey FROM keys)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM probe
""")
def join_bloom_prefilter(spark, sf_dir):
    """Bloom-filter semi-join prefilter: compress the build side's keys
    into a {BLOOM_BITS}-bit bitset (32 words), broadcast THAT, and
    discard probe rows whose k=2 positions aren't all set - before the
    exact join ever shuffles. The 100 TB play: when the build side is
    too large to broadcast as a hash set but its BITSET isn't, the
    prefilter cuts the probe-side shuffle to candidates only; Spark's
    own runtime row-level filtering does this implicitly, this entry is
    the explicit, engine-checked form with the false-positive rate
    measured in the output (n_bloom_pass - n_exact = n_false_pos, the
    quantity that sizes m and k).

    Plan: build = explode 2 positions/key -> 16-row bit_or aggregate;
    probe = explode 2 positions/row -> BROADCAST left join on word ->
    min(bit set) per row; the exact check is a broadcast semi/anti join.
    Everything is md5/integer arithmetic - the oracle reproduces the
    bitset verbatim."""
    cust = _t(spark, sf_dir, "customer")
    keys = (cust.filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    p1, p2 = _bloom_positions(F.col("c_custkey"))
    kpos = (keys.select(F.explode(F.array(p1, p2)).alias("p")))
    # F.shiftleft/shiftright take only literal shift amounts in the
    # Python API; the per-row shift needs the SQL form
    bloom = (kpos.groupBy((F.col("p") / 32).cast("long").alias("word"))
             .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                         "CAST(p % 32 AS INT)))").alias("mask")))

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    q1, q2 = _bloom_positions(F.col("o_custkey"))
    opos = orders.select("o_orderkey", "o_custkey",
                         F.explode(F.array(q1, q2)).alias("p"))
    probe = (opos.join(F.broadcast(bloom),
                       (F.col("p") / 32).cast("long") == F.col("word"),
                       "left")
             .select("o_orderkey", "o_custkey",
                     F.expr("CASE WHEN mask IS NOT NULL AND "
                            "(shiftright(mask, CAST(p % 32 AS INT)) & 1) = 1 "
                            "THEN 1 ELSE 0 END").alias("hit"))
             .groupBy("o_orderkey", "o_custkey")
             .agg(F.min("hit").alias("hit")))

    # one row per order survives the groupBy, so the totals fold into a
    # single aggregate - no separate count() action on the driver
    checked = (probe.join(F.broadcast(keys),
                          F.col("o_custkey") == F.col("c_custkey"), "left")
               .select("hit", (F.col("hit") == 1).cast("int").alias("h"),
                       ((F.col("hit") == 1)
                        & F.col("c_custkey").isNotNull())
                       .cast("int").alias("is_exact")))
    return (checked.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("h").cast("long").alias("n_bloom_pass"),
        F.sum("is_exact").cast("long").alias("n_exact"),
        F.sum(F.col("h") - F.col("is_exact")).cast("long")
        .alias("n_false_pos")))


# ---------------------------------------------------------------------
# Corpus-frequency document quality score (log-free unigram rarity)
# ---------------------------------------------------------------------

@query("text_unigram_rarity", """
    WITH ex AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS n FROM ex GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n_total FROM ex)
    SELECT ex.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt.n) AS BIGINT) AS sum_tok_freq,
           CAST(SUM(cnt.n) AS DOUBLE)
             / (COUNT(*) * (SELECT n_total FROM tot)) AS commonness
    FROM ex JOIN cnt USING (tok)
    GROUP BY ex.doc_id
""")
def text_unigram_rarity(spark, sf_dir):
    """Unigram corpus-frequency quality score: for each document, the
    mean corpus frequency of its tokens (normalized by total corpus
    tokens) - low = rare/specialist vocabulary, high = boilerplate. The
    log-free stand-in for unigram-LM perplexity, same monotone ordering
    per document length (repo recipe: INTEGER sums - exact, fold-order
    free - divided ONCE in double; avg(ln p) would hash-diverge between
    libm implementations).

    Plan shape at 100 TB: explode -> token-count aggregate (one shuffle,
    map-side combined) -> equi-join token counts back (token dictionary
    << corpus, AQE picks broadcast when it fits) -> per-doc integer
    aggregate. No UDF, no collect."""
    d = _t(spark, sf_dir, "documents")
    ex = d.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
    cnt = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = ex.agg(F.count(F.lit(1)).alias("n_total"))
    return (ex.join(cnt, "tok").crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("n").alias("sum_tok_freq"),
                 (F.sum("n").cast("double")
                  / (F.count(F.lit(1)) * F.first("n_total")))
                 .alias("commonness"))
            .select("doc_id", "n_tokens", "sum_tok_freq", "commonness"))


# ---------------------------------------------------------------------
# Incremental rollup merge (algebraic partial aggregates re-aggregated)
# ---------------------------------------------------------------------

@query("rollup_incremental_merge", """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total,
             COUNT(*) AS day_n
      FROM orders GROUP BY 1)
    SELECT CAST(date_trunc('month', d) AS DATE) AS month,
           CAST(SUM(day_total) AS DOUBLE) AS month_total,
           CAST(SUM(day_n) AS BIGINT) AS month_n,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1
""")
def rollup_incremental_merge(spark, sf_dir):
    """Hypertable-style incremental rollup: monthly totals computed by
    MERGING the daily pre-aggregate, never rescanning raw rows - the
    pattern that turns a 100 TB fact scan into a GB-scale re-aggregation
    because SUM/COUNT are algebraic (partials merge associatively).
    Decimal sums so daily->monthly merge is bit-equal to a direct
    monthly aggregate whatever the merge order; the same two-level plan
    is what a materialized daily view + scheduled monthly refresh runs.
    Two shuffles total (day key, then month key over the tiny daily
    table)."""
    daily = (_t(spark, sf_dir, "orders")
             .groupBy(F.to_date("o_orderdate").alias("d"))
             .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("day_total"),
                  F.count(F.lit(1)).alias("day_n")))
    return (daily.groupBy(F.date_trunc("month", "d").cast("date")
                          .alias("month"))
            .agg(F.sum("day_total").cast("double").alias("month_total"),
                 F.sum("day_n").alias("month_n"),
                 F.count(F.lit(1)).alias("n_days")))


# ---------------------------------------------------------------------
# Small-file compaction planner (bin-packing file inventory to targets)
# ---------------------------------------------------------------------

@query("layout_compaction_plan", """
    WITH inv AS (
      SELECT CAST(ts AS DATE) AS event_day, event_type,
             CAST(SUM(strlen(props)) + 16 * COUNT(*) AS BIGINT)
               AS size_bytes
      FROM events GROUP BY 1, 2),
    pl AS (
      SELECT event_day, event_type, size_bytes,
             COALESCE(SUM(size_bytes) OVER (
                 PARTITION BY event_day
                 ORDER BY size_bytes DESC, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
      FROM inv)
    SELECT event_day, event_type, size_bytes,
           CAST(cum_before // 4096 AS BIGINT) AS bin_id
    FROM pl
""")
def layout_compaction_plan(spark, sf_dir):
    """The write-side twin of the zone-map/z-order entries: plan the
    COMPACTION of a small-file inventory into target-sized output files.
    The inventory here is one "file" per (day, event_type) with an
    exact integer size estimate (payload bytes + fixed row overhead);
    the planner orders files largest-first within each day partition
    and assigns bin_id = floor(exclusive_running_size / target), the
    streaming first-fit that guarantees every bin except the last per
    day is >= target once packed in order. The real-world loop writes
    each bin as one merged file.

    Scale posture: compaction planning is METADATA-ONLY - the input is
    O(files) rows (from a manifest/catalog listing, never the data),
    the window runs per day partition (parallel, no single-partition
    exchange), and the expensive part - actually rewriting bytes - is
    delegated to per-bin writers that each read only their own files.
    At 100 TB with millions of small files this stays a sub-second
    planning query. All arithmetic is integer (sums, floor-div), so
    the oracle matches bit-for-bit."""
    e = _t(spark, sf_dir, "events")
    inv = (e.groupBy(F.col("ts").cast("date").alias("event_day"),
                     "event_type")
           .agg((F.sum(F.octet_length("props"))
                 + 16 * F.count(F.lit(1))).cast("long").alias("size_bytes")))
    w = (Window.partitionBy("event_day")
         .orderBy(F.col("size_bytes").desc(), "event_type")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (inv.withColumn(
        "cum_before", F.coalesce(F.sum("size_bytes").over(w), F.lit(0)))
        .select("event_day", "event_type", "size_bytes",
                F.floor(F.col("cum_before") / 4096).alias("bin_id")))


# ---------------------------------------------------------------------
# Z-order layout key + data-skipping effectiveness stats
# ---------------------------------------------------------------------

@query("layout_zorder_stats", """
    WITH z AS (
      SELECT c_custkey,
             CAST(c_nationkey % 16 AS BIGINT) AS nb,
             CAST(LEAST(GREATEST(CAST(floor(c_acctbal / 750) AS BIGINT), 0),
                        15) AS BIGINT) AS ab
      FROM customer),
    zi AS (
      SELECT c_custkey, nb, ab,
             (nb & 1) | ((ab & 1) << 1)
           | (((nb >> 1) & 1) << 2) | (((ab >> 1) & 1) << 3)
           | (((nb >> 2) & 1) << 4) | (((ab >> 2) & 1) << 5)
           | (((nb >> 3) & 1) << 6) | (((ab >> 3) & 1) << 7) AS zval
      FROM z)
    SELECT CAST(zval // 16 AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(nb) AS BIGINT) AS min_nation_b,
           CAST(MAX(nb) AS BIGINT) AS max_nation_b,
           CAST(MIN(ab) AS BIGINT) AS min_bal_b,
           CAST(MAX(ab) AS BIGINT) AS max_bal_b
    FROM zi GROUP BY 1
""")
def layout_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering key over two dimensions + the per-file
    min/max stats that make it pay: interleave the bits of the 4-bit
    nation and account-balance buckets, group rows into 16 z-ranges
    ("files"), and report each range's min/max per dimension - the
    zone-map a lakehouse writer would persist so a filter on EITHER
    dimension prunes most files (a lexicographic sort only prunes its
    leading column). Pure integer bit arithmetic, portable to the oracle
    verbatim; one shuffle on the derived bucket. At 100 TB this is the
    write-side layout step before handing files to a stats-pruning
    reader."""
    c = _t(spark, sf_dir, "customer")
    nb = (F.col("c_nationkey") % 16).cast("long")
    ab = F.least(F.greatest(F.floor(F.col("c_acctbal") / 750).cast("long"),
                            F.lit(0)), F.lit(15))
    z = c.select("c_custkey", nb.alias("nb"), ab.alias("ab"))
    zval = F.expr(
        "(nb & 1) | ((ab & 1) << 1) | (((nb >> 1) & 1) << 2)"
        " | (((ab >> 1) & 1) << 3) | (((nb >> 2) & 1) << 4)"
        " | (((ab >> 2) & 1) << 5) | (((nb >> 3) & 1) << 6)"
        " | (((ab >> 3) & 1) << 7)")
    return (z.select("nb", "ab", zval.alias("zval"))
            .groupBy((F.col("zval") / 16).cast("long").alias("zbucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("nb").alias("min_nation_b"),
                 F.max("nb").alias("max_nation_b"),
                 F.min("ab").alias("min_bal_b"),
                 F.max("ab").alias("max_bal_b")))


# ---------------------------------------------------------------------
# Order-insensitive table fingerprint (replication/anti-entropy check)
# ---------------------------------------------------------------------

@query("table_checksum", """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus),
               1, 15))::BIGINT) AS BIGINT) AS xor_sig,
           CAST(SUM(('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus),
               1, 8))::BIGINT) AS BIGINT) AS sum_sig
    FROM orders
""")
def table_checksum(spark, sf_dir):
    """Order-insensitive content fingerprint: per-row md5 digests folded
    with XOR (detects any changed/extra/missing row) plus an additive
    32-bit-value sum (catches the duplicate-pair case XOR is blind to).
    The anti-entropy primitive for verifying a 100 TB replica without
    moving data: both sides compute locally, compare two BIGINTs. A pure
    map + one partial-aggregated fold - commutative/associative by
    construction, so any partitioning gives the identical signature
    (that is the point); 15 hex digits keep the XOR inside a positive
    BIGINT on both engines."""
    key = F.concat_ws("|", F.col("o_orderkey").cast("string"),
                      F.col("o_custkey").cast("string"),
                      F.col("o_orderstatus"))
    h = F.md5(key)
    return (_t(spark, sf_dir, "orders")
            .select(F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
                    .alias("x64"),
                    F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
                    .alias("x32"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.bit_xor("x64").alias("xor_sig"),
                 F.sum("x32").alias("sum_sig")))


# ---------------------------------------------------------------------
# Grouped linear trend via algebraic aggregates (no UDF regression)
# ---------------------------------------------------------------------

@query("events_linear_trend", """
    WITH p AS (
      SELECT event_type,
             CAST(date_part('hour', ts) AS BIGINT) AS x,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM events),
    s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(y) AS sy, SUM(x * y) AS sxy
      FROM p GROUP BY 1)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                AS DOUBLE) AS slope
    FROM s
""")
def events_linear_trend(spark, sf_dir):
    """Per-group OLS slope (value vs hour-of-day) computed entirely from
    algebraic aggregates - sum(x), sum(x^2), sum(y), sum(xy) - i.e.
    grouped regression WITHOUT applyInPandas: one map-side-combined
    shuffle however many rows feed each group, where the UDF version
    would materialize whole groups in Python workers. The y sums run in
    DECIMAL (exact, fold-order free - double sums would hash-diverge
    across partitionings) and the closed form divides once in double.
    The template generalizes to variance/covariance/correlation and
    any moment-based grouped statistic."""
    e = _events(spark, sf_dir)
    x = F.hour("ts").cast("long")
    y = F.col("value").try_cast("decimal(18,6)")   # corrupt magnitudes -> NULL
    s = (e.select(F.col("event_type"), x.alias("x"), y.alias("y"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum("y").alias("sy"),
              F.sum(F.col("x").cast("decimal(18,6)") * F.col("y"))
              .alias("sxy")))
    nd = F.col("n").cast("double")
    return s.select(
        "event_type", "n",
        ((nd * F.col("sxy").cast("double")
          - F.col("sx").cast("double") * F.col("sy").cast("double"))
         / (nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")))
        .cast("double").alias("slope"))


# ---------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------

@query("decontam_ngram_overlap", """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 5 THEN
               list_distinct(list_transform(range(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                      || t[i+3] || ' ' || t[i+4]))
             ELSE [] END AS shingles
      FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 50 = 0),
    hits AS (
      SELECT e.doc_id, COUNT(*) AS n_shared
      FROM ex e JOIN bench b ON e.s = b.s
      WHERE e.doc_id % 50 <> 0
      GROUP BY 1)
    SELECT t.doc_id,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           COALESCE(h.n_shared, 0) > 0 AS contaminated
    FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
    WHERE t.doc_id % 50 <> 0
""")
def decontam_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    5-gram shingle with the held-out eval set (here: doc_id % 50 == 0
    stands in for the benchmark corpus) - the contamination check every
    serious LLM data pipeline runs before training, because eval text
    leaking into train silently inflates scores. Plan: shingle both
    sides (narrow posexplode maps), DISTINCT the benchmark shingles
    (eval sets are tiny -> the join side broadcasts), inner-join + count
    per train doc, left-join the flag back. At 100 TB the train side
    streams map-only through a broadcast hash join - no shuffle of the
    corpus; only the per-doc count aggregates. Exact-match shingles
    (not hashed), so the oracle reproduces verbatim."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", text.tokens("text").alias("t"))
    n = F.size("t")
    sh = toks.select(
        "doc_id",
        F.when(n >= 5, F.array_distinct(F.transform(
            F.sequence(F.lit(0), n - 5),
            lambda i: F.concat_ws(
                " ", F.element_at("t", i + 1), F.element_at("t", i + 2),
                F.element_at("t", i + 3), F.element_at("t", i + 4),
                F.element_at("t", i + 5)))))
        .otherwise(F.array().cast("array<string>")).alias("shingles"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    bench = (ex.filter(F.col("doc_id") % 50 == 0)
             .select("s").distinct())
    hits = (ex.filter(F.col("doc_id") % 50 != 0)
            .join(F.broadcast(bench), "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))
    return (toks.filter(F.col("doc_id") % 50 != 0)
            .select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
                    (F.coalesce("n_shared", F.lit(0)) > 0)
                    .alias("contaminated")))


# ---------------------------------------------------------------------
# Intra-document repetition score (degenerate-text detector)
# ---------------------------------------------------------------------

@query("text_repetition_score", """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tri AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3 THEN
               list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END AS g
      FROM toks)
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
           CASE WHEN len(g) > 0 THEN
             1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
           ELSE 0.0 END AS repetition
    FROM tri
""")
def text_repetition_score(spark, sf_dir):
    """Degenerate-repetition detector: 1 - distinct/total trigram ratio
    per document. Looping or template-stamped text (the classic web-crawl
    failure mode that also destabilizes training) scores near 1; natural
    prose near 0. All array expressions inside one narrow codegen
    projection - zero shuffle, zero UDF; the integer counts divide once
    in double (fold-order free, hash-stable)."""
    d = _t(spark, sf_dir, "documents")
    t = text.tokens("text")
    n = F.size(t)
    tri = F.when(n >= 3, F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(" ", F.element_at(t, i + 1),
                              F.element_at(t, i + 2),
                              F.element_at(t, i + 3)))) \
        .otherwise(F.array().cast("array<string>"))
    out = d.select("doc_id", tri.alias("g"))
    ng = F.size("g")
    nd = F.size(F.array_distinct("g"))
    return out.select(
        "doc_id", ng.cast("long").alias("n_trigrams"),
        nd.cast("long").alias("n_distinct"),
        F.when(ng > 0, F.lit(1.0) - nd.cast("double") / ng)
        .otherwise(F.lit(0.0)).alias("repetition"))


# ---------------------------------------------------------------------
# Count-min sketch (mergeable heavy-hitter counts, deterministic hashes)
# ---------------------------------------------------------------------

_CM_DEPTH = 4
_CM_WIDTH = 256


@query("sketch_count_min", """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    exact AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    rows_ AS (SELECT unnest(range(0, 4)) AS j),
    cells AS (
      SELECT j, ('0x' || substr(md5(j || ':' || tok), 1, 8))::BIGINT % 256
               AS bucket,
             COUNT(*) AS cell
      FROM tok, rows_ GROUP BY 1, 2
    ),
    q AS (
      SELECT tok, c FROM exact ORDER BY c DESC, tok LIMIT 10
    ),
    est AS (
      SELECT q.tok, q.c, MIN(cells.cell) AS cm
      FROM q
      JOIN rows_ ON TRUE
      JOIN cells ON cells.j = rows_.j
        AND cells.bucket =
            ('0x' || substr(md5(rows_.j || ':' || q.tok), 1, 8))::BIGINT
            % 256
      GROUP BY q.tok, q.c
    )
    SELECT tok, CAST(c AS BIGINT) AS exact_count,
           CAST(cm AS BIGINT) AS cm_estimate,
           CAST(cm - c AS BIGINT) AS overestimate
    FROM est
""")
def sketch_count_min(spark, sf_dir):
    """Count-min sketch over the corpus token stream, verified against
    exact counts for the top-10 heavy hitters: the MERGEABLE
    frequency-sketch primitive (a 4 x 256 integer grid; shard sketches
    add cell-wise, so 1000 executors' sketches combine in one tiny
    reduce - the property exact per-token counts lack at 100 TB when
    the key space is unbounded). Point estimate = min over the 4 rows
    of the token's md5-derived cell; CM guarantees estimate >= exact
    with bounded overestimate (published per token as `overestimate` -
    the judgeable error, never hidden). Deterministic md5 bucket
    hashing makes the WHOLE sketch - every cell, every estimate -
    value-hashable by the SQL oracle, the same discipline as the
    minhash/simhash family. The sketch build is one groupBy over
    (row, bucket) with map-side combine: 1024 cells out, regardless of
    input size."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))

    def bucket(j_col, tok_col):
        return (F.conv(F.substring(
            F.md5(F.concat(j_col.cast("string"), F.lit(":"), tok_col)),
            1, 8), 16, 10).cast("long") % _CM_WIDTH)

    rows_ = F.sequence(F.lit(0), F.lit(_CM_DEPTH - 1))
    cells = (tok.select(F.explode(rows_).alias("j"), "tok")
             .groupBy("j", bucket(F.col("j"), F.col("tok")).alias("bucket"))
             .agg(F.count(F.lit(1)).alias("cell")))
    q = exact.orderBy(F.col("c").desc(), F.col("tok")).limit(10)
    probes = q.select("tok", "c", F.explode(rows_).alias("j")) \
        .withColumn("bucket", bucket(F.col("j"), F.col("tok")))
    est = (probes.join(cells, ["j", "bucket"])
           .groupBy("tok", "c").agg(F.min("cell").alias("cm")))
    return est.select(
        "tok", F.col("c").cast("long").alias("exact_count"),
        F.col("cm").cast("long").alias("cm_estimate"),
        (F.col("cm") - F.col("c")).cast("long").alias("overestimate"))
