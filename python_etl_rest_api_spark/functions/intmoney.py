"""Exact integer-units money arithmetic for hot aggregation paths.

Spark's ``Decimal`` keeps SUMS on a compact long-backed fast path, but
every decimal MULTIPLY promotes to java.math.BigDecimal — so a
per-row product like the TPC-H discounted revenue
``price * (1 - discount)`` allocates BigDecimals for every row of a
60M-row scan. Re-expressing the product in integer units makes the
whole per-row path primitive long arithmetic inside whole-stage
codegen (measured on q1 at the 100x point: 12.2 -> 4.1 s,
bit-identical output).

Recipe (mirrored EXACTLY by the DuckDB oracles — both engines round
the same IEEE double product half-away-from-zero, then do identical
64-bit integer arithmetic):

- ``cents(col)``: nearest integer of col * 100 as BIGINT — exact for
  2-decimal money stored as doubles. Spark side computes it as
  floor(col*100 + 0.5) (pure Math.floor in codegen; Spark's
  Round(double) is BigDecimal-backed per row), the oracle as
  round(col*100) — identical integers because 2-decimal money never
  lands on a .5 tie (see cents() docstring).
- ``rev_units()``: price_cents * (100 - discount_cents) — the
  discounted revenue in 1e-4 units (REV_UNITS_SQL is the oracle
  fragment).
- ``limb_sum_exact`` / ``limb_sum_double``: overflow-safe exact sums
  over a PROJECTED column name. Each value splits into
  (v div 2^20, v % 2^20) and the two parts sum as plain longs:
  |lo| < 2^20 and hi <= |v|/2^20 bound BOTH partial sums by
  ~count * 2^20, exact up to ~8e12 rows PER GROUP (>1 PB of
  lineitem) — far past any per-group cardinality a 100 TB run sees.
  The recombine hi*2^20 + lo runs in decimal(38,0) on the one final
  row per group, where overflow is impossible and cost is nil.
  x = (x div L)*L + (x % L) holds for every long in Spark (truncating
  div, sign-of-dividend remainder), so the identity is exact for
  negative values too. (DuckDB needs no limbs: its SUM(BIGINT)
  accumulates in HUGEINT.)

Final doubles match across engines because both cast the SAME exact
integer to double (correctly rounded) and then divide by the same
exact power of ten (IEEE division is correctly rounded, and the
integer operand is exact in both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LIMB = 1 << 20

# oracle fragment for rev_units() — keep in lock-step with the Column
REV_UNITS_SQL = ("CAST(round(l_extendedprice * 100) AS BIGINT)"
                 " * (100 - CAST(round(l_discount * 100) AS BIGINT))")


def cents(col: str | Column) -> Column:
    """Exact integer cents of a 2-decimal money double.

    floor(x*100 + 0.5), NOT round(x*100): Spark's Round on DoubleType
    allocates a java.math.BigDecimal per row even inside whole-stage
    codegen (BigDecimal.valueOf(v).setScale(0, HALF_UP)), which is
    exactly the per-row allocation this module exists to remove —
    measured at the 100x bench point the BigDecimal-backed form put
    q5_local_supplier_volume at 9.1 s vs 6.5 s for its decimal
    predecessor; floor compiles to a bare (long) Math.floor(...).

    Identical values to the oracle's round(): for 2-decimal money
    stored as a double, x*100 lands within ~1e-9 relative error of an
    INTEGER, so x*100 + 0.5 is never near a floor boundary and
    floor(x*100+0.5) IS the nearest integer — the same integer DuckDB's
    round() produces. (The two differ only at exact .5 ties, i.e. x*100
    half-way between integers, which a 2-decimal value cannot
    produce.) Holds for negative money too: round() is
    half-away-from-zero, floor(+0.5) is half-toward-+inf, and with no
    ties both are just nearest-integer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5))


def rev_units(price_col: str = "l_extendedprice",
              disc_col: str = "l_discount") -> Column:
    """Discounted revenue price*(1-disc) in exact 1e-4 units (long)."""
    return cents(price_col) * (F.lit(100) - cents(disc_col))


def limb_sum_exact(col: str) -> Column:
    """Aggregate expression: exact integer total of projected column
    ``col`` as decimal(38,0), accumulated as two overflow-safe long
    sums (see module doc). Takes a column NAME: project the unit
    column once, then aggregate — keeps the per-row expression single
    and the div/mod pair trivially common-subexpression'd."""
    hi = F.sum(F.expr(f"{col} div {LIMB}"))
    lo = F.sum(F.col(col) % LIMB)
    return hi.cast("decimal(38,0)") * LIMB + lo


def limb_sum_double(col: str, scale: float) -> Column:
    """``limb_sum_exact`` cast to double and de-scaled: the output-
    boundary form (scale = 100.0 for cents, 1e4 for rev units)."""
    return limb_sum_exact(col).cast("double") / F.lit(scale)
