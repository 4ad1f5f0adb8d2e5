"""Expression helpers for lenient, pandas-compatible coercion.

Pure Column -> Column compositions of native Spark functions - no UDFs, so
every expression stays inside whole-stage codegen and remains eligible for
constant folding / pushdown. Each helper replicates one semantic of the
reference pipeline (file:line cited per function).

Engine convention: ``try_*`` everywhere, so behavior is identical with
ANSI mode on or off (SURVEY.md section 7.3 item 6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import DECIMAL_16_2_MAX, LENIENT_TIMESTAMP_FORMATS


def normalize_str(col: Column | str) -> Column:
    """trim + lower (reference etl/03_transform_and_load.py:47-49).

    pandas ``astype(str)`` renders missing values as the literal "nan";
    the reference then treats "" and "nan" as sentinels downstream. Here
    values stay NULL and the sentinel check handles both spellings.
    """
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def sentinel_to_null(col: Column | str,
                     sentinels: Sequence[str] = ("", "nan", "<NA>")) -> Column:
    """Map pandas stringified-missing sentinels to NULL
    (reference etl/03_transform_and_load.py:90)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*sentinels), F.lit(None)).otherwise(c)


def is_missing(col: Column | str,
               sentinels: Sequence[str] = ("", "nan")) -> Column:
    """Null-or-sentinel validity predicate
    (reference etl/03_transform_and_load.py:56-60)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | c.isin(*sentinels)


def _format_literal_chars(fmt: str) -> list[str]:
    """Literal (non-field) characters a java.time pattern requires in its
    input: non-alphanumerics outside quotes, everything inside ``'...'``
    quotes. Presence of each is a NECESSARY condition for a successful
    parse (literals must be consumed verbatim), never sufficient.

    A pattern containing an optional section (``[...]``) gets NO guard
    (empty list): characters inside the brackets are only conditionally
    required, and the brackets themselves never appear in the input —
    treating either as required literals would null every value of a
    legal optional-section format. Same conservatism for ``#``, ``{``,
    ``}`` (reserved by DateTimeFormatter)."""
    if any(ch in fmt for ch in "[]#{}"):
        return []
    lits: set[str] = set()
    in_quote = False
    for ch in fmt:
        if ch == "'":
            in_quote = not in_quote
            continue
        if in_quote or not ch.isalnum():
            lits.add(ch)
    return sorted(lits)


def lenient_timestamp(col: Column | str,
                      formats: Sequence[str] = LENIENT_TIMESTAMP_FORMATS) -> Column:
    """Multi-format coerce-to-null timestamp parse.

    Replicates pandas ``to_datetime(errors='coerce')`` format inference
    (reference etl/03_transform_and_load.py:43-44): the dataset contains one
    undashed ``20190516`` that a single-format to_timestamp would null out
    (SURVEY.md section 1.4). coalesce over try_to_timestamp keeps the parse
    entirely JVM-side and never throws.

    Each attempt is gated on the format's literal characters being
    present in the input (``contains`` — a cheap codegen scan). The
    guard is a necessary condition for that format to parse, so
    ``coalesce(when(guard, try), ...)`` is value-identical to the
    unguarded coalesce for EVERY input — it only skips attempts that
    were guaranteed to fail. That matters because a failed
    try_to_timestamp costs a JVM DateTimeParseException per row: on a
    15M-row corpus where most rows carry the SECOND format, gating cut
    the parse leg ~45% (measured on the 100x etl_clean_scaled corpus).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.nullif(F.trim(c), F.lit(""))
    attempts = []
    for fmt in formats:
        attempt = F.try_to_timestamp(c, F.lit(fmt))
        lits = _format_literal_chars(fmt)
        if lits:
            guard = F.lit(True)
            for ch in lits:
                guard = guard & c.contains(ch)
            attempt = F.when(guard, attempt)
        attempts.append(attempt)
    return F.coalesce(*attempts)


def lenient_amount(col: Column | str, scale: int = 2) -> Column:
    """Lenient numeric cast + round, with inf and decimal-range guards.

    Replicates the reference's amount handling end to end
    (etl/03_transform_and_load.py:42,50-52):
      to_numeric(errors='coerce').round(2) -> +-inf to null -> |x| > DECIMAL(16,2) max to null.
    ``try_cast`` parses scientific notation ("3.0e34") like pandas; the
    astronomic exponent ("3.0e213231213123") overflows double to inf, which
    the guard nulls, matching pandas' inf replacement.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = F.trim(c).try_cast("double")
    d = F.when(d.isNull() | F.isnan(d) | (F.abs(d) == float("inf")), F.lit(None)) \
         .otherwise(F.round(d, scale))
    return decimal_guard(d)


def decimal_guard(col: Column | str, max_abs: float = DECIMAL_16_2_MAX) -> Column:
    """Pre-cast DECIMAL(16,2) overflow guard -> null
    (reference etl/03_transform_and_load.py:51-52). Explicit, so an ANSI
    cast-overflow can never throw where the reference expects null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.abs(c) > F.lit(max_abs), F.lit(None)).otherwise(c)


def reason_codes(rules: Sequence[tuple[Column, str]], sep: str = "|") -> Column:
    """Pipe-joined audit reason string (reference etl/03_transform_and_load.py:73-83).

    ``concat_ws`` skips NULL branches, so no trailing-separator rstrip is
    needed; rule order is preserved (the reference appends in declaration
    order: missing_id | missing_company_id | invalid_amount |
    missing_created_at | missing_status).
    """
    return F.concat_ws(
        sep, *[F.when(cond, F.lit(code)) for cond, code in rules])


def money(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a double money column to exact decimal for aggregation.

    Summing doubles is order-dependent (shuffle/partition layout changes the
    result's low bits); summing decimals is exact and reproducible at any
    scale. The engine aggregates money in decimal and casts back to double
    only at the output boundary.
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: a corrupt magnitude (1e308, inf, NaN) becomes NULL and
    # drops out of the exact aggregate instead of throwing an ANSI
    # overflow mid-job (fuzz-sweep hardening). In-range values cast
    # identically, so clean-data results and plans are unchanged.
    return c.try_cast(f"decimal({precision},{scale})")
