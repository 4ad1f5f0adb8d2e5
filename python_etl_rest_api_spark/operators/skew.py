"""Skew mitigation operators (scale posture, SURVEY.md section 7.2-9).

The reference's own data is a genuine skew fixture: one company owns 98.9%
of rows (SURVEY 1.4). At 100 TB a straight groupBy on such a key puts the
hot key's entire volume through one reducer. Two mitigations:

- salted two-stage aggregation (here): partial-aggregate on (key, salt),
  then final-aggregate on key. Decomposable aggregates (sum/count/min/
  max) are exact; the decimal-money convention keeps sums bit-identical
  to the unsalted plan, so the salted form is oracle-checkable.
- AQE skew-join splitting (configured in session.py) for join-side skew;
  explicit salting of a join (replicate the small side per salt) is the
  fallback when AQE's thresholds don't trigger.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, group_cols: Sequence[str],
               sum_col: Column | str, alias: str,
               buckets: int = 16,
               count_alias: str | None = None) -> DataFrame:
    """Two-stage skew-safe sum (+ optional count): stage 1 aggregates on
    (group_cols, salt) spreading each hot key over ``buckets`` reducers;
    stage 2 combines the partials. Salt is a deterministic spread of the
    rows (spark_partition_id x a cheap per-row counter would also do; a
    hash of all columns is collision-tolerant here because the aggregate
    is decomposable, duplicates just land in the same bucket).
    """
    c = F.col(sum_col) if isinstance(sum_col, str) else sum_col
    salt = F.pmod(F.xxhash64(*[F.col(x) for x in df.columns]), F.lit(buckets))
    stage1 = (df.withColumn("_salt", salt)
              .groupBy(*group_cols, "_salt")
              .agg(F.sum(c).alias("_partial_sum"),
                   F.count(F.lit(1)).alias("_partial_n")))
    aggs = [F.sum("_partial_sum").alias(alias)]
    if count_alias:
        aggs.append(F.sum("_partial_n").alias(count_alias))
    return stage1.groupBy(*group_cols).agg(*aggs)


def salted_sum_cents(df: DataFrame, group_cols: Sequence[str],
                     cents_col: str, alias: str, scale: float,
                     buckets: int = 16,
                     count_alias: str | None = None) -> DataFrame:
    """Two-stage skew-safe EXACT money sum over a projected integer-
    cents COLUMN NAME (+ optional count): the limb-pair twin of
    :func:`salted_sum` (r13; name-not-Column mirrors the
    intmoney.limb_sum_* convention, which builds the ``div`` limb split
    as a SQL fragment).

    Stage 1 partial-sums the (value div 2^20, value mod 2^20) limbs per
    (group, salt) — plain long arithmetic, the same overflow bound as
    intmoney.limb_sum_* (exact to ~8e12 rows per (group, salt)); stage
    2 sums the partial limbs per group and recombines hi*2^20 + lo in
    decimal(38,0) on the one final row, divided by ``scale`` into the
    output double. Limb partials are themselves decomposable, so the
    salted result is bit-identical to the unsalted limb sum."""
    from ..functions.intmoney import LIMB
    salt = F.pmod(F.xxhash64(*[F.col(x) for x in df.columns]),
                  F.lit(buckets))
    stage1 = (df.withColumn("_salt", salt)
              .groupBy(*group_cols, "_salt")
              .agg(F.sum(F.expr(f"`{cents_col}` div {LIMB}")).alias("_hi"),
                   F.sum(F.col(cents_col) % LIMB).alias("_lo"),
                   F.count(F.lit(1)).alias("_partial_n")))
    total = ((F.sum("_hi").cast("decimal(38,0)") * LIMB + F.sum("_lo"))
             .cast("double") / F.lit(scale)).alias(alias)
    aggs = [total]
    if count_alias:
        aggs.append(F.sum("_partial_n").alias(count_alias))
    return stage1.groupBy(*group_cols).agg(*aggs)


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                buckets: int = 8) -> DataFrame:
    """Explicit skew-join salting: fact rows get a deterministic salt in
    [0, buckets); the dim side is replicated once per salt value, so each
    hot join key spreads over ``buckets`` tasks. Exact same rows as the
    plain join. Prefer AQE skew handling; use this when a single key is
    pathological enough to defeat it."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(buckets))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(buckets).select(
                F.col("id").cast("int").alias("_salt"))))
    out = fact_s.join(dim_s, [key, "_salt"]).drop("_salt")
    return out
