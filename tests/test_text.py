"""Text-analysis operator semantics on controlled inputs."""

import pytest

from python_etl_rest_api_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "el gato de la casa es un gato"),
        (2, "zzz qqq xxx"),
        (3, "the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert got == {0: 6, 1: 8, 2: 3, 3: 4}


def test_quality_score(docs):
    got = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert got[3]["distinct_ratio"] == pytest.approx(0.25)   # the x4
    assert got[0]["stopword_ratio"] == pytest.approx(2 / 6)  # 'the' x2
    assert got[2]["stopword_ratio"] == 0.0
    assert got[0]["n_chars_measured"] == len("the cat sat on the mat")


def test_language_id(docs):
    got = {r["doc_id"]: r["predicted_lang"]
           for r in text.language_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "und"


def test_chunk_windows_overlap_and_tail(spark):
    # 10 tokens, window 4, stride 2 -> starts 0,2,4,6,8; last chunks short
    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    rows = sorted(text.chunk_windows(df, window=4, stride=2).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t2 t3 t4 t5"          # stride-2 overlap
    assert rows[4].chunk_text == "t8 t9"                # clipped tail
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4, 4, 2]


def test_chunks_reconstruct_document(spark):
    # stride == window (no overlap): concatenating chunks = original text
    toks = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    rows = sorted(text.chunk_windows(df, window=4, stride=4).collect(),
                  key=lambda r: r.chunk_id)
    assert " ".join(r.chunk_text for r in rows) == toks


def test_pack_sequences_budget_and_order(spark):
    # 6 docs of 10 tokens each, one group, budget 25:
    # cum_before = 0,10,20,30,40,50 -> packs 0,0,0,1,1,2
    rows = [(i, " ".join(["w"] * 10), "s1") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: r.pack_id
           for r in text.pack_sequences(df, budget=25).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_pack_sequences_groups_are_independent(spark):
    rows = [(1, "a b c", "s1"), (2, "d e f", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text.pack_sequences(df, budget=2).collect()
    # each group starts at pack 0 regardless of the other group's volume
    assert all(r.pack_id == 0 for r in out)
    assert {r.pack_group for r in out} == {"s1", "s2"}


def test_redact_pii(spark):
    rows = [
        (0, "mail me at alice.smith+x@sub.example.co today"),
        (1, "account 123456789 flagged"),
        (2, "short num 12345 stays"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert got[0].text_redacted == "mail me at <EMAIL> today"
    assert got[1].text_redacted == "account <NUM> flagged"
    assert got[2].text_redacted == rows[2][1]      # 5 digits: untouched
    assert [got[i].was_redacted for i in range(4)] == [
        True, True, False, False]


def test_fingerprint_stability(spark, docs):
    fp1 = {r["doc_id"]: r["fp_md5"] for r in text.fingerprint(docs).collect()}
    fp2 = {r["doc_id"]: r["fp_md5"] for r in text.fingerprint(docs).collect()}
    assert fp1 == fp2
    # md5 of normalized text: same text -> same fp; different -> different
    assert len(set(fp1.values())) == 4
    # case/whitespace-insensitive
    shouty = spark.createDataFrame(
        [(9, "  THE CAT SAT ON THE MAT ")], "doc_id long, text string")
    fp9 = text.fingerprint(shouty).collect()[0]["fp_md5"]
    assert fp9 == fp1[0]


def test_chunk_windows_null_and_empty_text(spark):
    """Round-3 advice: size(NULL) is -1 under non-ANSI defaults, so an
    unguarded sequence(0, -2, stride) crashes the stage. A NULL doc must
    chunk to zero rows (the SQL range(0, NULL, s) behavior), not crash;
    an empty string tokenizes to [''] under split semantics (both
    engines) and legitimately yields one empty chunk."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c")], "doc_id long, text string")
    rows = text.chunk_windows(df, window=2, stride=2).collect()
    assert {r.doc_id for r in rows} == {2, 3}
    assert sorted(r.chunk_text for r in rows if r.doc_id == 3) == ["a b", "c"]
    assert [r.chunk_text for r in rows if r.doc_id == 2] == [""]


def test_bpe_merges_hand_corpus(spark):
    """BPE on a hand-computable corpus: 'aaab aaab ab' has word types
    aaab(f=2), ab(f=1). Char pairs: ('a','a') cnt 2*2=4, ('a','b')
    cnt 2+1=3 -> merge 1 = 'a a'. After merging ('<a><a><a><b>' ->
    '<a+a><a><b>', greedy left-to-right, no re-merge of the overlap):
    pairs ('a+a','a') 2, ('a','b') 3 -> merge 2 = 'a b'. Then
    aaab='<a+a><a+b>', ab='<a+b>': pairs ('a+a','a+b') 2 -> merge 3."""
    from python_etl_rest_api_spark.operators.text import bpe_merges

    docs = spark.createDataFrame(
        [(0, "aaab aaab ab")], "doc_id long, text string")
    got = bpe_merges(docs, steps=3)
    assert got == [(1, "a a", 4), (2, "a b", 3), (3, "a+a a+b", 2)]


def test_bpe_encode_counts_hand_corpus(spark):
    """Applying the learned 3-merge table to 'aaab aaab ab': aaab
    compresses <a><a><a><b> -> <a+a><a><b> -> <a+a><a+b> -> <a+a+a+b>
    (1 token), ab -> <a+b> (1 token) => 3 words, 10 chars, 3 BPE
    tokens."""
    from python_etl_rest_api_spark.operators.text import (
        bpe_encode_counts,
        bpe_merges,
    )

    docs = spark.createDataFrame(
        [(0, "aaab aaab ab")], "doc_id long, text string")
    merges = bpe_merges(docs, steps=3)
    row = bpe_encode_counts(docs, merges).collect()[0]
    assert (row.n_words, row.n_chars_tokenized, row.n_bpe_tokens) \
        == (3, 10, 3)
    # no merges learned yet -> every char is its own token
    row0 = bpe_encode_counts(docs, []).collect()[0]
    assert row0.n_bpe_tokens == 10


def test_bpe_batched_hand_corpus(spark):
    """Batched rule on the same corpus: round 1 candidates are
    ('a','a') 4 and ('a','b') 3, which SHARE 'a', so the greedy
    disjoint pick takes only merge 1 = 'a a' and defers 'a b'. Round 2
    (after '<a+a><a><b>' / '<a><b>'): pairs ('a','b') 3, ('a+a','a') 2
    -> picks 'a b' then skips ('a+a','a') (shares 'a')... which leaves
    ('a+a','a') deferred again. Positional numbering: steps 1 and 5."""
    from python_etl_rest_api_spark.operators.text import bpe_merges_batched

    docs = spark.createDataFrame(
        [(0, "aaab aaab ab")], "doc_id long, text string")
    got = bpe_merges_batched(docs, steps=8, round_size=4, window=32)
    assert got[0] == (1, "a a", 4)
    assert got[1][1] == "a b" and got[1][0] == 5


def test_bpe_batched_first_pick_matches_sequential(spark):
    """Each round's FIRST pick is the global argmax - identical to what
    sequential BPE would choose at that point; and all picks within a
    round are pairwise symbol-disjoint."""
    from python_etl_rest_api_spark.operators.text import (
        bpe_merges,
        bpe_merges_batched,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    seq = bpe_merges(docs, steps=1)
    bat = bpe_merges_batched(docs, steps=8, round_size=4)
    assert bat[0][1:] == seq[0][1:]
    assert len(bat) == 8
    round1 = [m for m in bat if m[0] <= 4]
    syms = [s for _, p, _ in round1 for s in p.split(" ")]
    assert len(syms) == len(set(syms)), "round-1 picks share a symbol"


def test_bpe_batched_rejects_ragged_steps(spark):
    from python_etl_rest_api_spark.operators.text import bpe_merges_batched
    import pytest as _pytest

    docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="multiple of round_size"):
        bpe_merges_batched(docs, steps=7, round_size=4)


def test_chunk_accounting_matches_chunk_windows(spark):
    """r14: the closed-form chunk accounting (no explode, no chunk
    text) must agree with the exploded chunk_windows on (count, token
    sum) per doc for every boundary shape — token counts spanning the
    window/stride boundaries, empty string, trailing/consecutive
    spaces — and across overlapping, exact-tiling and ragged
    (window, stride) pairs. pipeline_training_data's summary rides
    this equivalence."""
    from pyspark.sql import functions as F

    from python_etl_rest_api_spark.operators import text

    rows = [(i, " ".join(["t"] * i)) for i in range(1, 50)]
    rows += [(100, ""), (101, "a "), (102, " "), (103, "a  b"),
             (104, "x " * 40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for w, st in ((32, 16), (4, 2), (4, 4), (2, 2), (5, 3)):
        ref = (text.chunk_windows(df, window=w, stride=st)
               .groupBy("doc_id")
               .agg(F.count("*").alias("k"),
                    F.sum("n_chunk_tokens").cast("long").alias("s")))
        k, s = text.chunk_accounting_cols("text", w, st)
        new = df.select("doc_id", k.alias("k2"), s.alias("s2"))
        j = ref.join(new, "doc_id", "full")
        bad = j.filter(
            F.col("k").isNull() | F.col("k2").isNull()
            | (F.col("k") != F.col("k2"))
            | (F.col("s") != F.col("s2"))).count()
        assert bad == 0, f"closed form diverges at window={w} stride={st}"
