"""Text-analysis operators for training-data pipelines (extension surface).

All native expressions over the ``documents`` table (doc_id, text, lang,
source, n_chars) - no UDFs, so everything stays in whole-stage codegen and
scales linearly: each operator is a narrow map over the scan, no shuffle.

Determinism: ratios are exact-int divisions in double; fingerprints are
md5 (portable across engines for the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Real corpora would use larger lists; the heuristic structure
# (token-set hit ratio, argmax across languages) is the operator.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "un", "est", "que"),
}


def tokens(col: Column | str = "text") -> Column:
    """Whitespace tokenization (split on single spaces; the corpus is
    single-space separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish proxy (chars/4,
    the common LLM token estimate) in one projection."""
    toks = tokens(text_col)
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (F.length(text_col).cast("long") / F.lit(4)).cast("long").alias("n_tokens_bpe_est"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, token stats, lexical diversity, stopword
    ratio - the standard cheap filters in front of LLM training data."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return df.select(
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        ((F.length(text_col) - (n_tokens - 1)).cast("double") / n_tokens)
        .alias("avg_token_len"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: hits per language list, argmax with a
    deterministic tiebreak (language name), 'und' when nothing hits."""
    toks = tokens(text_col)

    def in_list(sw):
        # factory: capture the stopword tuple as a closure constant
        return lambda t: t.isin(*sw)

    hit_cols = [
        F.struct(
            F.size(F.filter(toks, in_list(sw))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in sorted(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*hit_cols))
    return df.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("predicted_lang"),
        best["hits"].alias("stopword_hits"),
    )


def chunk_windows(df: DataFrame, text_col: str = "text",
                  window: int = 32, stride: int = 16) -> DataFrame:
    """Document chunking for pre-training prep: overlapping token windows
    of ``window`` tokens every ``stride`` tokens (starts 0, stride,
    2*stride, ... < n_tokens; the final window is shorter when the doc
    runs out). One narrow projection + posexplode - no shuffle, no UDF;
    at 100 TB this is a pure map stage whose output row count is
    n_tokens/stride per doc."""
    from ..session import widen_scan
    staged = widen_scan(df).select("doc_id", tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    # NULL/empty guard: size(NULL) is -1 under non-ANSI defaults and
    # sequence(0, -2, stride) THROWS 'Illegal sequence boundaries' at
    # runtime - a null document must chunk to zero rows (matching the
    # SQL range(0, NULL, stride) behavior), not crash the stage.
    starts = F.when(n >= 1, F.sequence(F.lit(0), n - 1, F.lit(stride))
                    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice("_toks", s + 1, window)).alias("chunk_text"),
            F.least(F.lit(window), n - s).alias("n_chunk_tokens")))
    return (staged.select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id", "c.chunk_id", "c.chunk_text",
                    "c.n_chunk_tokens"))


def chunk_accounting_cols(text_col: str = "text", window: int = 32,
                          stride: int = 16) -> tuple[Column, Column]:
    """(n_chunks, n_chunk_tokens_sum) of :func:`chunk_windows` in CLOSED
    FORM — two integer expressions per document, no explode, no chunk
    text (r14; guide §1.2 step 1: don't compute rows you only count).

    For n = token count (n >= 1; callers must drop null text, where
    both expressions are undefined like chunk_windows' zero rows):

    - starts are 0, stride, ... < n, so K = 1 + (n-1) div stride;
    - a start s contributes least(window, n - s): the F =
      max(0, (n-window) div stride + 1) earliest starts contribute a
      full ``window`` each, and the remaining T = K - F tail starts
      contribute n - s*stride, summing to T*n - stride * (sum of the
      tail start indices) with the index sum exact under integer
      ``div`` (consecutive-integer-range sum: (K-1+F)*T is always
      even). All arithmetic is 64-bit integer (SQL div), identical on
      both engines; verified per-doc against the exploded
      chunk_windows on the full corpus (0 mismatches of 5000 docs)
      and pinned by test_text edge cases.

    This is the accounting half of the chunking story: use
    chunk_windows when the chunk TEXT is the product, and these
    columns when only the counts are (pipeline_training_data's
    summary — measured at sf0.1 the explode+rejoin tail fell 0.62 ->
    0.41 s, the join with its exchange gone from the plan)."""
    n = f"cast(size(split({text_col}, ' ')) AS BIGINT)"
    k = f"(1L + ({n} - 1) div {stride})"
    fl = (f"(CASE WHEN {n} >= {window} "
          f"THEN 1L + ({n} - {window}) div {stride} ELSE 0L END)")
    k_col = F.expr(k)
    s_col = F.expr(
        f"{window}L * {fl} + ({k} - {fl}) * {n} "
        f"- {stride}L * ((({k} - 1 + {fl}) * ({k} - {fl})) div 2)")
    return k_col, s_col


def pack_sequences(df: DataFrame, text_col: str = "text",
                   group_col: str = "source",
                   budget: int = 256) -> DataFrame:
    """Deterministic sequence packing: assign docs to training packs of
    ~``budget`` tokens. Pack id = floor(cumulative-tokens-before-this-doc
    / budget) within ``group_col``, docs in stable doc_id order - a
    streaming-friendly first-fit variant where a pack may overshoot the
    budget by at most one document (the standard trade for a single-pass,
    shuffle-once plan; bin-optimal packing is NP-hard and
    order-dependent).

    Scale shape: ONE shuffle on group_col for the running-sum window; the
    pack assembly (collect packs downstream) groups on (group, pack_id) -
    the same partitioning, so AQE reuses the exchange. State per task is
    one running sum."""
    n = F.size(tokens(text_col))
    from pyspark.sql import Window
    w = (Window.partitionBy(group_col).orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(n).over(w), F.lit(0))
    return df.select(
        "doc_id", F.col(group_col).alias("pack_group"),
        n.alias("n_tokens"),
        F.floor(cum_before / budget).cast("long").alias("pack_id"),
    )


# Redaction patterns: portable between Java regex (Spark) and RE2
# (DuckDB) - character classes and bounded quantifiers only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONG_NUMBER = r"[0-9]{6,}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub for training corpora: mask email addresses and long
    digit runs (account/phone-shaped) with typed placeholders. Native
    regexp_replace (replace-all on both engines), narrow map over the
    scan - the standard pre-training redaction pass."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>"),
        PII_LONG_NUMBER, "<NUM>")
    return df.select(
        "doc_id",
        redacted.alias("text_redacted"),
        (redacted != F.col(text_col)).alias("was_redacted"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of the normalized text (exact-dup key)
    plus a cheap structural sketch (length bucket + first/last token)."""
    norm = F.lower(F.trim(F.col(text_col)))
    toks = tokens(norm)
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.concat_ws("#",
                    (F.length(norm) / 64).cast("long").cast("string"),
                    F.element_at(toks, 1),
                    F.element_at(toks, -1)).alias("fp_struct"),
    )


def _bpe_symbol_frame(df: DataFrame, text_col: str) -> DataFrame:
    """Shared BPE prelude: word-type frequencies, each word as a string
    of self-delimited character symbols ('<t><a><b>').

    The corpus scan is widened first: the tokenize+explode is the
    CPU-heavy narrow leg of training, and an under-split parquet scan
    (10 splits on 32 cores at the 100x point) would run it serially —
    the widen_scan gate is a no-op once the scan has real splits."""
    from ..session import widen_scan
    words = (widen_scan(df.filter(F.col(text_col).isNotNull()))
             .select(F.explode(tokens(text_col)).alias("w"))
             .filter(F.length("w") >= 1)
             .groupBy("w").agg(F.count(F.lit(1)).alias("f")))
    return words.select(
        F.concat(F.lit("<"),
                 F.array_join(F.expr(
                     "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
                     "><"),
                 F.lit(">")).alias("sym"),
        "f")


def _bpe_pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the symbol frame, weighted by
    word frequency (the per-round distributed aggregate)."""
    return (syms.select(
        F.explode(F.expr(
            "case when size(split(substring(sym, 2, length(sym)-2), "
            "'><')) >= 2 then "
            "transform(sequence(1, size(split(substring(sym, 2, "
            "length(sym)-2), '><')) - 1), i -> concat("
            "element_at(split(substring(sym, 2, length(sym)-2), '><'), i),"
            "' ', element_at(split(substring(sym, 2, length(sym)-2), "
            "'><'), i+1))) else array() end")).alias("pair"), "f")
        .groupBy("pair").agg(F.sum("f").alias("cnt")))


def bpe_merges(df: DataFrame, steps: int = 3,
               text_col: str = "text") -> list[tuple[int, str, int]]:
    """Byte-pair-encoding vocabulary induction: the first ``steps`` BPE
    merges learned from the corpus, as iterative distributed aggregates
    (the tokenizer-training loop expressed Spark-first, the second
    iterative algorithm in the repo after connected_components).

    Classic BPE trains on word TYPES weighted by corpus frequency:
    start from character symbols, repeatedly count adjacent symbol
    pairs and merge the most frequent one everywhere. The driver loop
    per step is one pair-count aggregate plus ONE collected scalar (the
    argmax pair - same pattern as the components convergence check);
    the corpus-sized work (explode, count) stays distributed.

    Merge mechanics are engineered for cross-engine exactness: a word's
    symbol sequence rides as a string of self-delimited symbols
    ('<t><a><b>'), so the merge is a plain left-to-right substring
    replace of '<x><y>' with '<x+y>' - no regex, no lambda-typed fold
    (DuckDB's list_reduce cannot carry a struct accumulator), and the
    self-delimiting brackets make boundary false-matches impossible
    while back-to-back occurrences ('<a><a><a>') merge exactly like
    greedy BPE ([aa, a]). Ties break on pair string order.

    Depth bound: ONE Spark job (pair-count aggregate + scalar collect)
    per merge step. Right for oracle/demo depths; a production 32k-merge
    vocabulary would mean 32k jobs - use :func:`bpe_merges_batched`
    (>= 4 merges per job) for that regime.

    Returns [(step, 'x y', count)] - the learned merge table.
    """
    # cache the TYPE table (post-groupBy, vocabulary-bounded — not the
    # corpus): without it every step's pair count re-runs the full
    # corpus tokenize+groupBy through the growing replace lineage
    # (3 corpus scans for 3 merges; measured 11.6s -> ~5s at the 100x
    # point). Steps recompute only their cheap replace chain on top.
    base = _bpe_symbol_frame(df, text_col).cache()
    syms = base
    merges: list[tuple[int, str, int]] = []
    try:
        for step in range(1, steps + 1):
            # the CASE guard inside _bpe_pair_counts matters here:
            # Spark's sequence(1, 0) counts DOWN to [1, 0], so a
            # single-symbol word would index past the array - emit no
            # pairs instead (DuckDB's range(1, 1) is already empty).
            pairs = _bpe_pair_counts(syms)
            best = (pairs.orderBy(F.col("cnt").desc(),
                                  F.col("pair").asc())
                    .limit(1).collect())
            if not best:
                break
            pair, cnt = best[0]["pair"], int(best[0]["cnt"])
            merges.append((step, pair, cnt))
            x, y = pair.split(" ")
            syms = syms.select(
                F.replace("sym", F.lit(f"<{x}><{y}>"),
                          F.lit(f"<{x}+{y}>")).alias("sym"), "f")
    finally:
        try:
            base.unpersist()
        except Exception:
            pass
    return merges


def bpe_encode_counts(df: DataFrame, merges: list[tuple[int, str, int]],
                      text_col: str = "text") -> DataFrame:
    """APPLY a learned BPE merge table: encode every document with the
    merges (in step order) and report its token accounting - the serve
    half of the tokenizer story (:func:`bpe_merges` learns the table,
    this walks the corpus with it). Everything is JVM expressions over
    the token array (self-delimited symbol strings + one replace per
    merge, exactly the training representation), so the encode is a
    ZERO-SHUFFLE narrow map: at 100 TB it runs embedded in the corpus
    scan, the deployment mode a real tokenizer pass needs.

    Returns (doc_id, n_words, n_chars_tokenized, n_bpe_tokens):
    words = whitespace tokens with empty strings filtered (both engines;
    Spark's sequence(1, 0) counts DOWN, so an empty word would emit
    phantom symbols), chars = pre-merge symbol count, bpe tokens =
    post-merge symbol count. n_bpe_tokens == n_chars_tokenized minus
    one per merge occurrence applied.

    The encode runs DOC-LEVEL, not per word (r13): the previous form
    folded an encode expression over the token array with
    F.aggregate — a CodegenFallback higher-order function, so the
    regex + merge replaces ran INTERPRETED once per word occurrence
    (~140M interpreted evals at the 100x point — the same HOF tax the
    minhash sketch measured). The whole document is now encoded in a
    handful of flat string passes (all codegen): one regex inserts
    '><' between adjacent non-space chars, spaces become '> <' and the
    ends are bracketed — producing EXACTLY the concatenation of every
    word's self-delimited symbol string (consecutive spaces yield
    inert '<>' phantoms that no merge pattern '<x><y>' can touch and
    the separator counting below never sees) — then each merge is one
    literal replace over the doc string. A merge match can never span
    words or phantoms (every cross-boundary span contains a space;
    patterns are space-free), so the doc-level replace finds exactly
    the per-word matches in the same left-to-right order. Counts
    close the loop without any split: per word, tokens = '><'-count
    + 1, and '><' never crosses the '> <' separators, so summing over
    the doc gives n_bpe = regexp_count(sym, '><') + n_words, with
    n_words = regexp_count(text, '[^ ]+') ('[^ ]', not '\\S': tokens
    may contain tabs/newlines, which are not split delimiters) and
    n_chars = length minus spaces. Measured at 100x (same-session
    interleaved A/B): apply leg 3.3 -> 2.6 s min; value-identical on
    the full 100x, sf0.1 and sf0.01 corpora (0 differing rows)."""
    from ..session import widen_scan
    t = F.col(text_col)
    sym = F.regexp_replace(t, "(?<=[^ ])(?=[^ ])", "><")
    sym = F.concat(F.lit("<"), F.replace(sym, F.lit(" "), F.lit("> <")),
                   F.lit(">"))
    for _step, pair, _cnt in merges:
        x, y = pair.split(" ")
        sym = F.replace(sym, F.lit(f"<{x}><{y}>"), F.lit(f"<{x}+{y}>"))
    n_words = F.regexp_count(t, F.lit("[^ ]+"))
    # widen: the encode is the CPU-heavy narrow map this docstring
    # describes; an under-split scan would serialize it (10 of 32
    # cores at the 100x point, measured 27s -> ~9s widened). No-op
    # once the scan has >= half-core splits.
    return (widen_scan(df.filter(t.isNotNull()))
            .select("doc_id",
                    n_words.cast("long").alias("n_words"),
                    F.length(F.replace(t, F.lit(" "), F.lit("")))
                    .cast("long").alias("n_chars_tokenized"),
                    (F.regexp_count(sym, F.lit("><")) + n_words)
                    .cast("long").alias("n_bpe_tokens")))


def bpe_merges_batched(df: DataFrame, steps: int = 8, round_size: int = 4,
                       window: int = 32, text_col: str = "text",
                       ) -> list[tuple[int, str, int]]:
    """Batched BPE vocabulary induction: ``round_size`` merges per Spark
    job instead of one - the scale path for real (32k-merge) vocab
    training, where :func:`bpe_merges`'s job-per-merge loop is a wall.

    Per round, ONE distributed pair-count aggregate; the driver takes
    the top-``window`` candidates by (count desc, pair asc) and greedily
    keeps up to ``round_size`` pairs that are pairwise SYMBOL-DISJOINT.
    Disjointness is what makes the batch exact per-round: merging
    '<x><y>' cannot create or destroy an occurrence of any pair whose
    symbols avoid {x, y}, so the published counts - taken from the
    round's single table - are identical to what sequential recounting
    would see for those same pairs, and the replacements commute. The
    deviation from classic BPE is the SELECTION: sequential BPE may
    interleave a just-created pair (t, x+y) between batch picks; this
    variant (the standard parallel-BPE approximation) defers such pairs
    to the next round. The candidate window is a documented bound: a
    pair outside the top-``window`` is never picked even if every
    candidate above it overlaps; the oracle applies the same LIMIT so
    both engines see the identical rule.

    Steps must divide into whole rounds (positional step numbering
    ``(round-1)*round_size + k`` keeps the unrolled SQL oracle in
    lockstep even when a round finds fewer than ``round_size`` disjoint
    pairs). Returns [(step, 'x y', count)] like :func:`bpe_merges`.
    """
    if steps % round_size:
        raise ValueError("steps must be a multiple of round_size "
                         "(positional numbering keeps the oracle aligned)")
    # same type-table cache as bpe_merges: rounds re-aggregate the
    # cached vocabulary through their replace chains, not the corpus
    base = _bpe_symbol_frame(df, text_col).cache()
    syms = base
    merges: list[tuple[int, str, int]] = []
    try:
        for rnd in range(steps // round_size):
            cand = (_bpe_pair_counts(syms)
                    .orderBy(F.col("cnt").desc(), F.col("pair").asc())
                    .limit(window).collect())
            if not cand:
                break
            used: set[str] = set()
            sym_col = F.col("sym")
            picked = 0
            for r in cand:
                x, y = r["pair"].split(" ")
                if x in used or y in used:
                    continue
                used.update((x, y))
                picked += 1
                merges.append((rnd * round_size + picked,
                               r["pair"], int(r["cnt"])))
                sym_col = F.replace(
                    sym_col, F.lit(f"<{x}><{y}>"), F.lit(f"<{x}+{y}>"))
                if picked == round_size:
                    break
            syms = syms.select(sym_col.alias("sym"), "f")
    finally:
        try:
            base.unpersist()
        except Exception:
            pass
    return merges


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL, as a pure JVM
    expression (no UDF): lowercase scheme and host, strip the scheme's
    default port (:80 for http, :443 for https; explicit non-default
    ports survive), drop the fragment, drop utm_* tracking params, sort
    the remaining query params bytewise, and reassemble. The dedup key
    for URL-level corpus dedup: crawls see the same page under
    case-varied hosts, tracking-tagged queries and shuffled param
    orders, and canonicalization collapses them before any fetch or
    content hash. Everything is regexp/array algebra, so the whole
    normalization stays in whole-stage codegen and an oracle can mirror
    it function-for-function."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    hostport = F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = ((port != "")
                 & ~((scheme == "http") & (port == "80"))
                 & ~((scheme == "https") & (port == "443")))
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith("utm_")))
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")))
