"""Dedup operator semantics on controlled synthetic documents."""

import pytest
from pyspark.sql import functions as F

from python_etl_rest_api_spark.operators import dedup

BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep dark forest to find some food for the long cold night")


@pytest.fixture(scope="module")
def docs(spark):
    near = BASE.replace("cold", "warm")            # 1-word change: near-dup
    far = "completely different content with no overlap whatsoever at all " \
          "zebra xylophone quantum banana rocket ship ocean mountain valley"
    rows = [
        (0, BASE), (1, BASE),                       # exact dups
        (2, near),                                  # near-dup of 0/1
        (3, far),                                   # unrelated
        (4, "tiny"),                                # shorter than shingle n
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dup_groups(docs):
    groups = dedup.exact_dup_groups(docs).collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in groups}
    assert by_keep[0] == 2          # docs 0 and 1 collapse
    assert sum(by_keep.values()) == 5


def test_shingles_deterministic_and_distinct(docs):
    sh = dedup.shingled_docs(docs, n=3).collect()
    by_id = {r["doc_id"]: r["shingles"] for r in sh}
    assert by_id[0] == by_id[1]
    assert len(by_id[0]) == len(set(by_id[0]))      # distinct
    assert by_id[4] == []                           # too short -> empty
    assert "the quick brown" in by_id[0]


def test_minhash_identical_signatures(spark, docs):
    sig = dedup.minhash_signatures(dedup.shingled_docs(docs)).collect()
    by_id = {r["doc_id"]: tuple(r[f"h{j}"] for j in range(8)) for r in sig}
    assert by_id[0] == by_id[1]                     # exact dups: same sig
    assert by_id[0] != by_id[3]                     # unrelated: differ


def test_minhash_near_dups_finds_pair(docs):
    pairs = dedup.minhash_near_dups(docs, threshold=0.4).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found                          # exact dup pair
    jacc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jacc[(0, 1)] == 1.0
    assert all(p[0] != 3 and p[1] != 3 for p in found)   # 'far' never pairs


def test_ngram_jaccard_exact_values(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1).collect()
    jacc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jacc[(0, 1)] == 1.0
    # near-dup (one word changed) shares most trigrams but not all
    assert 0.5 < jacc[(0, 2)] < 1.0


def test_simhash_near_dups(docs):
    sk = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert sk[0] == sk[1]
    pairs = dedup.simhash_near_dups(docs, max_hamming=8).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(0, 1)] == 0


def test_simhash_portable_agrees_with_default(docs):
    """Portable (60-bit md5) and default (64-bit xxhash64) variants share
    the invariant properties: identical texts hash identically, the
    portable sketch fits in 60 bits, and the exact-duplicate pair is
    found by both at the same hamming distance (0)."""
    psk = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash64(docs, portable=True).collect()}
    assert psk[0] == psk[1]
    assert all(0 <= v < (1 << 60) for v in psk.values())
    pairs = dedup.simhash_near_dups(docs, max_hamming=8,
                                    portable=True).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(0, 1)] == 0


def test_connected_components_chain_and_clusters(spark):
    """Chain 1-2-3 (transitivity beyond direct pairs), separate pair 10-11,
    triangle 20-21-22: labels must be the component minimum."""
    from python_etl_rest_api_spark.operators.dedup import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long")
    got = {r.vertex: r.component_id
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_when_unconverged(spark):
    """Round-3 advice: a diameter > max_iter chain must raise, not return
    silently split components."""
    import pytest

    from python_etl_rest_api_spark.operators.dedup import connected_components
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    # and a sufficient ceiling converges fine on the same graph
    got = {r.vertex: r.component_id
           for r in connected_components(chain, max_iter=10).collect()}
    assert set(got.values()) == {0}


def test_repeated_span_dedup_keep_first(spark):
    """A span shared by two docs survives only in the earlier one; the
    survivor text is reconstructed in original span order."""
    words = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    shared = words("dup", 16)                  # one exact 16-token span
    a = shared + " " + words("a", 16)          # doc 0: shared + unique
    b = shared + " " + words("b", 16)          # doc 1: shared + unique
    docs = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.repeated_span_dedup(docs, span_tokens=16).collect()}
    assert out[0]["n_spans"] == 2 and out[0]["n_spans_kept"] == 2
    assert out[0]["text_dedup"] == a           # first carrier keeps all
    assert out[1]["n_spans"] == 2 and out[1]["n_spans_kept"] == 1
    assert out[1]["text_dedup"] == words("b", 16)  # shared span removed


def test_repeated_span_dedup_two_pass_matches_single_pass(spark):
    """The digest-only two-pass variant (default) and the legacy
    single-pass shape must return identical rows on a corpus exercising
    partial trailing spans, full-duplicate disappearance, and cross-doc
    keep-first — the r8 verdict's condition for shipping it behind the
    same catalog entry."""
    words = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    shared = words("dup", 16)
    rows = [
        (0, shared + " " + words("a", 16)),
        (1, shared + " " + words("b", 7)),      # partial trailing span
        (2, shared),                            # fully duplicated: drops
        (3, words("c", 40)),                    # 3 spans, last partial
        (4, None),                              # null text: drops
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    two = sorted(map(tuple, dedup.repeated_span_dedup(
        docs, span_tokens=16, two_pass=True).collect()))
    one = sorted(map(tuple, dedup.repeated_span_dedup(
        docs, span_tokens=16, two_pass=False).collect()))
    assert two == one
    assert [t[0] for t in two] == [0, 1, 3]     # doc 2 and 4 dropped


def test_containment_asymmetric(spark):
    """A short doc fully embedded in a long one: low Jaccard (misses the
    0.5 threshold) but containment ~1.0 in the short->long direction."""
    short = " ".join(f"q{i}" for i in range(12))
    long_ = short + " " + " ".join(f"x{i}" for i in range(48))
    docs = spark.createDataFrame(
        [(0, short), (1, long_)], "doc_id long, text string")
    pairs = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == (0, 1)
    assert p["containment_a_in_b"] == 1.0      # every shingle of 0 is in 1
    assert p["containment_b_in_a"] < 0.5       # but not vice versa
    # and the symmetric Jaccard path would NOT pair them at 0.5
    jac = dedup.minhash_near_dups(docs, threshold=0.5).collect()
    assert jac == []


def test_minhash_candidate_pairs_superset_of_verified(spark):
    """Banding candidates must contain every verified pair (the verify
    only prunes), and a near-identical pair must be surfaced."""
    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, base), (1, base + " tail"), (2, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string")
    cand, _ = dedup.minhash_candidate_pairs(docs)
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    verified = {(r["id_a"], r["id_b"])
                for r in dedup.minhash_near_dups(docs, threshold=0.5).collect()}
    assert verified <= cand_set
    assert (0, 1) in cand_set and (0, 1) in verified
    assert (0, 2) not in verified


def test_minhash_permutation_parity_with_duckdb(spark):
    """The r10 signature scheme (one md5-derived base hash + affine
    permutations) must agree bit-for-bit between engines, and the
    catalog oracles must embed the SAME constants (they are generated
    from dedup.MINHASH_A/B/P - this pins against silent drift)."""
    import duckdb
    from pyspark.sql import functions as F

    from python_etl_rest_api_spark.operators.dedup import (
        MINHASH_A, MINHASH_B, MINHASH_P, minhash_signatures,
    )
    from python_etl_rest_api_spark.registry import ORACLES

    texts = ["hello world", "", "émoji 😀", "a" * 100, "x:y|z'q"]
    df = spark.createDataFrame(
        [(i, [t]) for i, t in enumerate(texts)],
        "doc_id long, shingles array<string>")
    got = {r["doc_id"]: [r[f"h{j}"] for j in range(8)]
           for r in minhash_signatures(df, "doc_id", 8).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        esc = t.replace("'", "''")
        want = [con.execute(
            f"SELECT ({MINHASH_A[j]} * (('0x' || substr(md5('{esc}'), 1, 8))"
            f"::BIGINT % {MINHASH_P}) + {MINHASH_B[j]}) % {MINHASH_P}"
        ).fetchone()[0] for j in range(8)]
        assert got[i] == want, (t, got[i], want)
    # Every minhash oracle must embed the FULL generated fragments —
    # all 8 permutation terms from minhash_sig_sql() and all 4 band
    # tuples from minhash_band_values_sql() — so an edit to ANY A[j] /
    # B[j] / P or to the banding layout, on either side, fails here
    # (previously only A[0]/B[0]/P were pinned; A[1..7]/B[1..7] could
    # drift silently).
    import re

    from python_etl_rest_api_spark.operators.dedup import (
        minhash_band_values_sql, minhash_sig_sql,
    )

    def norm(s):
        return re.sub(r"\s+", " ", s)

    sig_terms = re.findall(r"min\(.*?\) AS h\d+",
                           minhash_sig_sql("ex", "doc_id", 8))
    assert len(sig_terms) == 8
    band_tuples = re.findall(r"\(\d+, CAST.*?\)(?=,|\s*\))",
                             minhash_band_values_sql(8, 4))
    assert len(band_tuples) == 4
    for entry in ("dedup_minhash_lsh", "dedup_minhash_recall",
                  "pipeline_docs_curate", "pipeline_training_data",
                  "dedup_cluster_components", "dedup_incremental_index",
                  "dedup_lsh_scurve"):
        sql = norm(ORACLES[entry])
        for term in sig_terms:
            assert norm(term) in sql, (entry, term)
        assert str(MINHASH_P) in sql, entry
        if "band_key" in sql:
            for tup in band_tuples:
                assert norm(tup) in sql, (entry, tup)
