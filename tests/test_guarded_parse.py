"""The two r9 perf rewrites each rest on a semantic-preservation claim;
these tests attack both claims with adversarial inputs rather than
trusting the argument.

1. lenient_timestamp gates each try_to_timestamp on the format's
   literal characters being present. Claim: the guard is a NECESSARY
   condition for that format to parse, so the guarded coalesce is
   value-identical to the unguarded one for EVERY input — including
   multi-digit-year strings ('210001010' CAN parse as yyyyMMdd: year
   21000), wrong-length strings, unicode digits, embedded whitespace.

2. minhash verify intersects xxhash64-mapped shingle arrays. Claim:
   Jaccard over the hashed arrays equals Jaccard over the shingle
   strings absent a 64-bit collision inside one pair's union.
"""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.functions.cleaning import (
    _format_literal_chars,
    lenient_timestamp,
)

ADVERSARIAL = [
    None, "", "  ", "2019-05-16", "20190516", "2019-05-16 10:11:12",
    "210001010",            # 9 digits: yyyyMMdd can bind year=21000
    "2100010100",           # 10 digits, no dashes
    "99999-01-01",          # 5-digit year with dashes
    "999990101",            # 5-digit year undashed
    "2019-5-16",            # non-padded month (strict MM rejects)
    "2019/05/16",           # wrong separator
    "2019-05-16T10:11:12",  # ISO T (no such literal in the formats)
    "2019-05-16 10:11",     # truncated time
    "2019-05-16 10:11:12.5",
    "16-05-2019", "05/16/2019", "not-a-date", "nan",
    "٢٠١٩٠٥١٦",             # arabic-indic digits
    "2019:05:16",           # colons where dashes belong
    " 20190516 ",           # trim path
    "0000-00-00", "20190231",  # invalid calendar values
    "+2019-05-16", "2019-05-16 25:00:00",
    "+210000101",           # sign-prefixed 5-digit year, undashed
    "+21000-01-01",         # sign-prefixed 5-digit year, dashed
]

FORMAT_SETS = [
    ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "yyyyMMdd"),
    ("yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd"),
    ("yyyyMMdd",),          # no literals: guard must degrade to no-op
    ("HH:mm:ss", "yyyy-MM-dd"),
]


@pytest.mark.parametrize("formats", FORMAT_SETS)
def test_guarded_parse_equals_unguarded_coalesce(spark, formats):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "raw string")
    c = F.nullif(F.trim(F.col("raw")), F.lit(""))
    unguarded = F.coalesce(
        *[F.try_to_timestamp(c, F.lit(f)) for f in formats])
    # compare as strings JVM-side: a year like 21000 is representable
    # in Spark's TimestampType but not in Python's datetime (max 9999),
    # so collecting the raw timestamps would crash in the driver
    rows = (df.select("raw",
                      lenient_timestamp("raw", formats).cast("string")
                      .alias("guarded"),
                      unguarded.cast("string").alias("plain"))
            .collect())
    mismatched = [(r["raw"], r["guarded"], r["plain"])
                  for r in rows if r["guarded"] != r["plain"]]
    assert mismatched == []


def test_multidigit_year_still_parses_through_the_guard(spark):
    """The case that makes naive length-dispatch WRONG: java.time's
    'yyyy' accepts >4 digits when sign-prefixed, so the 10-char string
    '+210000101' parses under yyyyMMdd (year 21000) — a length==8
    gate would silently null it. The literal-char guard must let it
    through (yyyyMMdd has no literals -> no guard; '+' is consumed by
    the year FIELD, not a literal)."""
    df = spark.createDataFrame([("+210000101",)], "raw string")
    got = df.select(
        lenient_timestamp("raw", ("yyyy-MM-dd", "yyyyMMdd"))
        .cast("string").alias("ts")).first()["ts"]
    assert got is not None and got.startswith("+21000-01-01")


def test_format_literal_chars_extraction():
    assert _format_literal_chars("yyyy-MM-dd HH:mm:ss") == [" ", "-", ":"]
    assert _format_literal_chars("yyyyMMdd") == []
    # quoted sections are literals, including quoted LETTERS
    assert _format_literal_chars("yyyy-MM-dd'T'HH:mm:ss") == \
        ["-", ":", "T"]


def test_hashed_jaccard_equals_string_jaccard(spark):
    """The minhash verify's hashed-array Jaccard must match the
    string-array Jaccard on corpora with heavy shared/disjoint/empty
    structure (collision-free by construction at these sizes)."""
    from python_etl_rest_api_spark.operators import dedup

    docs = spark.createDataFrame(
        [(0, "a b c d e f g h"),
         (1, "a b c d e f g h"),            # exact dup
         (2, "a b c d e f zz yy"),          # partial overlap
         (3, "p q r s t u v w"),            # disjoint
         (4, "a b"),                        # too short for 3-grams
         (5, None)],                        # null text
        "doc_id long, text string")
    cand, shingled = dedup.minhash_candidate_pairs(docs, n=3)
    sa_s = shingled.select(F.col("doc_id").alias("id_a"),
                           F.col("shingles").alias("a_s"),
                           F.col("sh_hash").alias("a_h"))
    sb_s = shingled.select(F.col("doc_id").alias("id_b"),
                           F.col("shingles").alias("b_s"),
                           F.col("sh_hash").alias("b_h"))
    both = (sa_s.join(sb_s, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    dedup.jaccard(F.col("a_s"), F.col("b_s"))
                    .alias("j_str"),
                    dedup.jaccard(F.col("a_h"), F.col("b_h"))
                    .alias("j_hash"))
            .collect())
    assert both, "no pairs built"
    bad = [r for r in both if r["j_str"] != r["j_hash"]]
    assert bad == []
