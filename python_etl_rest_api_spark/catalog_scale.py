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
