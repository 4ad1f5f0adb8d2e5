"""Window / join / set-op catalog entries: top-k per group, lag deltas,
as-of join, time-band join, full-outer coverage, EXCEPT/INTERSECT,
deterministic hash sampling, corpus top-terms, array unnest, and
window-relative filtering.

The reference has none of these (its only join is the equi-join in
sql/02_view.sql:9-10 and it has no window functions at all - SURVEY.md
section 2.K); they are the analytics surface a warehouse user expects next,
each expressed so Catalyst keeps one shuffle per logical step.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import _events, _t, query
from .functions.cleaning import money
from .operators import temporal

# ---------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------

@query("w2_topk_per_group", """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
    FROM orders
    QUALIFY rk <= 3
""")
def w2_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer: rank window, ONE shuffle on the group
    key. The distributed top-k idiom - never a global sort + limit."""
    w = Window.partitionBy("o_custkey") \
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (_t(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3))


@query("w3_lag_gap_days", """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
    FROM orders
""")
def w3_lag_gap_days(spark, sf_dir):
    """Days since the customer's previous order (lag window; NULL for the
    first order). Integer day arithmetic - exact cross-engine."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.to_date("o_orderdate")
    return (_t(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey",
                    F.datediff(d, F.lag(d).over(w)).alias("gap_days")))


@query("w4_above_customer_avg", """
    WITH w AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders)
    SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
    FROM w WHERE o_totalprice > 1.5 * cust_avg
""")
def w4_above_customer_avg(spark, sf_dir):
    """Orders 1.5x above their customer's average - the correlated-scalar-
    subquery pattern as a single window pass (no join-back, one shuffle).
    Average built as exact decimal sum / count so the double is
    bit-identical cross-engine."""
    w = Window.partitionBy("o_custkey")
    avg = (F.sum(money("o_totalprice")).over(w).cast("double")
           / F.count(F.lit(1)).over(w))
    return (_t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice",
                    avg.alias("cust_avg"))
            .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg")))


# ---------------------------------------------------------------------
# Temporal joins (operators/temporal.py)
# ---------------------------------------------------------------------

@query("join_asof_attribution", """
    SELECT l.event_id, l.user_id, l.ts,
           r.event_id AS r_event_id, r.event_type AS r_event_type
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
""")
def join_asof_attribution(spark, sf_dir):
    """As-of join: each purchase attributed to the user's most recent prior
    non-purchase event (last-touch attribution). Union + ordered window -
    one shuffle on user_id, no range explosion."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    touches = ev.filter(F.col("event_type") != "purchase") \
        .select("event_id", "user_id", "ts", "event_type")
    return temporal.asof_join(purchases, touches, key="user_id", ts="ts",
                              right_cols=["event_id", "event_type"])


@query("join_time_band", """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST(b.us - a.us AS DOUBLE) / 1000000.0 AS gap_seconds
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(b.us - a.us) <= 1800000000
""")
def join_time_band(spark, sf_dir):
    """Interval/band join: same-user event pairs within 30 minutes, via
    time-bucket blocking (equi-join on (user, bin)) instead of a per-user
    cross product."""
    return temporal.time_band_pairs(_events(spark, sf_dir), key="user_id",
                                    ts="ts", id_col="event_id",
                                    band_seconds=1800)


# ---------------------------------------------------------------------
# Outer join / set ops / sampling
# ---------------------------------------------------------------------

@query("join_outer_coverage", """
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
           COALESCE(o.n_orders, 0) AS n_orders,
           CAST(COALESCE(o.spend, 0) AS DOUBLE) AS total_spend
    FROM customer c
    FULL OUTER JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
""")
def join_outer_coverage(spark, sf_dir):
    """Full outer join dim x fact-aggregate: customers with zero orders keep
    a row (n_orders=0), orphan order keys keep a row with null name. The
    aggregate runs BEFORE the join so the outer join moves group rows, not
    fact rows."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per = (_t(spark, sf_dir, "orders")
           .groupBy("o_custkey")
           .agg(F.count(F.lit(1)).alias("n_orders"),
                F.sum(money("o_totalprice")).alias("spend")))
    j = cust.join(per, cust.c_custkey == per.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0)).cast("double").alias("total_spend"))


@query("set_except_lapsed", """
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def set_except_lapsed(spark, sf_dir):
    """EXCEPT (set difference): 1995 buyers who did not buy in 1996."""
    o = _t(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    buyers_95 = o.filter(y == 1995).select("o_custkey").distinct()
    buyers_96 = o.filter(y == 1996).select("o_custkey").distinct()
    return buyers_95.subtract(buyers_96)


@query("set_intersect_repeat", """
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""")
def set_intersect_repeat(spark, sf_dir):
    """INTERSECT: customers who bought in both 1995 and 1996."""
    o = _t(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    buyers_95 = o.filter(y == 1995).select("o_custkey").distinct()
    buyers_96 = o.filter(y == 1996).select("o_custkey").distinct()
    return buyers_95.intersect(buyers_96)


@query("sample_hash_bucket", """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
""")
def sample_hash_bucket(spark, sf_dir):
    """Deterministic ~1/16 sample via content hash - reproducible across
    runs, engines, and partitionings (unlike TABLESAMPLE/rand()), so
    samples of different tables stay join-consistent on the key."""
    o = _t(spark, sf_dir, "orders")
    return (o.filter(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                                 1, 1) == "0")
            .select("o_orderkey", "o_totalprice"))


# ---------------------------------------------------------------------
# Text / array analytics
# ---------------------------------------------------------------------

@query("text_top_terms", """
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    cnt AS (
      SELECT term, COUNT(*) AS n FROM tok WHERE term <> '' GROUP BY term)
    SELECT term, n,
           CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rk
    FROM cnt
    QUALIFY rk <= 20
""")
def text_top_terms(spark, sf_dir):
    """Corpus top-20 terms: tokenize -> partial+final count -> top-k. The
    final rank window sees only the pre-aggregated term counts (vocabulary-
    sized, not corpus-sized); at 100 TB the count is the only big shuffle."""
    docs = _t(spark, sf_dir, "documents")
    counts = (docs.select(F.explode(F.split("text", " ")).alias("term"))
              .filter(F.col("term") != "")
              .groupBy("term").agg(F.count(F.lit(1)).alias("n")))
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-20 +
    # driver merge) - no single-partition exchange of the whole vocabulary.
    # The rank window then runs over 20 rows only.
    top = counts.orderBy(F.col("n").desc(), "term").limit(20)
    w = Window.orderBy(F.col("n").desc(), "term")
    return top.select("term", "n", F.row_number().over(w).alias("rk"))


@query("unnest_embedding_pos", """
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS val
    FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings WHERE vec_id < 5)
""")
def unnest_embedding_pos(spark, sf_dir):
    """Array unnest with ordinality (posexplode): vector -> (id, pos, val)
    long form, the bridge between array-native and relational processing."""
    return (_t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 5)
            .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
            .select("vec_id", "pos", F.col("val").cast("double").alias("val")))


@query("agg_approx_distinct", """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           1 AS approx_ok
    FROM events GROUP BY event_type
""")
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct users per event type - the
    mergeable-sketch path for 100 TB cardinality estimation (exact
    count-distinct shuffles every key; HLL shuffles fixed-size sketches).

    The sketch estimate itself cannot be value-hashed cross-engine
    (different HLL implementations), so the entry emits the exact count
    PLUS an accuracy verdict: approx_ok = 1 iff the HLL estimate (rsd
    0.02) lands within 5% of the exact count. The oracle asserts
    approx_ok = 1 for every group - a real accuracy bound on the sketch,
    hash-checked by the driver, alongside the exact counts."""
    # all-null user_id groups have exact_users = 0: the accuracy ratio
    # is undefined (ANSI divide-by-zero), and the right verdict is
    # "ok iff the sketch also saw nothing" (null-sweep hardening).
    ok = F.when(
        F.col("exact_users") > 0,
        F.abs(F.col("approx_users").cast("double") - F.col("exact_users"))
        / F.col("exact_users") <= F.lit(0.05),
    ).otherwise(F.col("approx_users") == 0)
    return (_events(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.count_distinct(F.col("user_id")).alias("exact_users"))
            .select("event_type", "n_events", "exact_users",
                    F.when(ok, 1).otherwise(0).alias("approx_ok")))


@query("events_funnel_conversion", """
    WITH s0 AS (
      SELECT user_id, min(epoch_us(ts)) AS t0
      FROM events WHERE event_type = 'view' GROUP BY 1),
    s1 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t1
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t0 GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1 GROUP BY 1)
    SELECT s0.user_id,
           s0.t0 AS view_us, s1.t1 AS click_us, s2.t2 AS purchase_us,
           CAST(1 + (s1.t1 IS NOT NULL)::INTEGER
                  + (s2.t2 IS NOT NULL)::INTEGER AS INTEGER) AS reached_stage
    FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
            LEFT JOIN s2 ON s1.user_id = s2.user_id
""")
def events_funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel view -> click -> purchase: per user, the
    first occurrence of each stage strictly after the previous stage's
    first occurrence; reached_stage = conversion depth. Event times as
    integer microseconds (exact cross-engine). Every agg/join keyed on
    user_id - the shuffle partitioning is established once and reused
    (no full-stream window, no cross product)."""
    from .operators.analytics import event_funnel
    return event_funnel(_events(spark, sf_dir))


@query("events_retention_cohorts", """
    WITH fw AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY 1),
    act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events)
    SELECT fw.cohort_week,
           CAST((epoch_us(a.week) - epoch_us(fw.cohort_week))
                / 604800000000 AS BIGINT) AS week_offset,
           COUNT(*) AS n_active_users
    FROM act a JOIN fw ON a.user_id = fw.user_id
    GROUP BY 1, 2
""")
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users bucketed by first-seen week, counted active
    per week offset from their cohort. date_trunc('week') is Monday-start
    in both engines; offsets are integer-microsecond differences divided
    by a constant week (exact). Plan: min-agg on user_id, distinct on
    (user_id, week) - both one shuffle - then a user_id equi-join and the
    final (cohort, offset) aggregate; no window over the full stream."""
    e = _events(spark, sf_dir)
    fw = (e.groupBy("user_id")
          .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    act = e.select("user_id",
                   F.date_trunc("week", F.col("ts")).alias("week")).distinct()
    off = ((F.unix_micros(F.col("week"))
            - F.unix_micros(F.col("cohort_week"))) / F.lit(604800000000))
    return (act.join(fw, "user_id")
            .groupBy("cohort_week", off.cast("long").alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_active_users")))


@query("events_hourly_anomalies", """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_hours,
             CAST(SUM(n_events) AS DOUBLE) AS sx,
             CAST(SUM(n_events * n_events) AS DOUBLE) AS sxx
      FROM hourly GROUP BY 1)
    SELECT h.event_type, h.hour, h.n_events,
           s.sx / s.n_hours AS mean_rate,
           CAST(abs(h.n_events - s.sx / s.n_hours) >
                2 * sqrt((s.sxx - s.sx * s.sx / s.n_hours)
                         / (s.n_hours - 1)) AS INTEGER) AS is_anomaly
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
""")
def events_hourly_anomalies(spark, sf_dir):
    """Hourly event-rate anomaly flags: |count - mean| > 2 sigma per
    event type. Counts are integers, so the power sums are exact in
    double and mean/var/sqrt are bit-identical cross-engine with the
    same expression order (the stats_exact_moments recipe without the
    decimal detour). Plan: hourly agg (one shuffle) -> tiny per-type
    stats agg -> broadcast join back; at 100 TB the stats side is
    |event_types| rows."""
    e = _events(spark, sf_dir)
    hourly = (e.groupBy("event_type",
                        F.date_trunc("hour", F.col("ts")).alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    stats = (hourly.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_hours"),
                  F.sum("n_events").cast("double").alias("sx"),
                  F.sum(F.col("n_events") * F.col("n_events"))
                  .cast("double").alias("sxx")))
    n, sx, sxx = F.col("n_hours"), F.col("sx"), F.col("sxx")
    mean = sx / n
    sigma = F.sqrt((sxx - sx * sx / n) / (n - 1))
    return (hourly.join(F.broadcast(stats), "event_type")
            .select("event_type", "hour", "n_events",
                    mean.alias("mean_rate"),
                    (F.abs(F.col("n_events") - mean) > 2 * sigma)
                    .cast("int").alias("is_anomaly")))


@query("events_transition_matrix", """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM ordered WHERE next_type IS NOT NULL GROUP BY 1, 2),
    totals AS (
      SELECT event_type, SUM(n) AS n_total FROM pairs GROUP BY 1)
    SELECT p.event_type, p.next_type, p.n,
           CAST(p.n AS DOUBLE) / t.n_total AS prob
    FROM pairs p JOIN totals t ON p.event_type = t.event_type
""")
def events_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over each user's event
    stream: P(next_type | type) = exact integer pair count / row total
    (single double division - bit-identical cross-engine). Plan: ONE
    window shuffle on user_id for the lead, then a tiny
    (|types|^2)-row aggregate and a broadcast-sized totals join; the
    full stream is never shuffled twice. Deterministic ordering ties
    broken by event_id."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select("user_id", "event_type",
                       F.lead("event_type").over(w).alias("next_type"))
    pairs = (ordered.filter(F.col("next_type").isNotNull())
             .groupBy("event_type", "next_type")
             .agg(F.count(F.lit(1)).alias("n")))
    totals = pairs.groupBy("event_type").agg(F.sum("n").alias("n_total"))
    return (pairs.join(F.broadcast(totals), "event_type")
            .select("event_type", "next_type", "n",
                    (F.col("n").cast("double") / F.col("n_total"))
                    .alias("prob")))
