"""Aggregation / validation queries (SURVEY.md sections 2.H, 2.D, 2.I).

The flagship is ``daily_company_totals`` (reference sql/02_view.sql:4-11):
fact JOIN dim -> group by (company_name, DATE(created_at)) -> SUM(amount).
Expressed declaratively so Catalyst supplies broadcast-hash join for the
tiny dim, partial+final hash aggregation, and pushes date predicates below
the aggregate (group key) down to the parquet scan - exactly the plan a
1000-executor run wants: one shuffle, on the group keys.

Money sums go through decimal (exact, partition-order-independent) and are
cast to double at the boundary (functions/cleaning.py::money).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import money


def daily_company_totals(charges: DataFrame, companies: DataFrame,
                         company_key: str = "company_id",
                         name_col: str = "company_name",
                         ts_col: str = "created_at",
                         amount_col: str = "amount") -> DataFrame:
    """The reference's view (sql/02_view.sql:4-11), generalized over any
    fact/dim pair. Dim is broadcast (explicit hint; Catalyst would also
    auto-broadcast under the 10MB default, but at 100 TB the fact side must
    never be shuffled for this join)."""
    return (
        charges.join(F.broadcast(companies), company_key, "inner")
        .groupBy(
            F.col(name_col),
            F.to_date(F.col(ts_col)).alias("transaction_date"),
        )
        .agg(F.sum(money(amount_col)).cast("double").alias("total_amount"))
    )


def per_group_count(charges: DataFrame, companies: DataFrame,
                    company_key: str = "company_id",
                    name_col: str = "company_name") -> DataFrame:
    """H3: COUNT(*) per company over the join (reference readme.md:136-140)."""
    return (
        charges.join(F.broadcast(companies), company_key, "inner")
        .groupBy(name_col)
        .agg(F.count(F.lit(1)).alias("n_charges"))
    )


def null_profile(df: DataFrame, pct: bool = False) -> DataFrame:
    """H4/H5: per-column null counts / ratios in ONE pass (the reference
    notebook's df.isna().sum() and mean, cells d0258ae3 / a67deecf).
    A single all-column aggregate - not one job per column."""
    if pct:
        aggs = [F.round(F.avg(F.col(c).isNull().cast("int")) * 100, 2).alias(c)
                for c in df.columns]
    else:
        aggs = [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    return df.agg(*aggs)


def fk_violations(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """I2: FK integrity as a left-anti join (the reference delegates this to
    the MySQL FK constraint, sql/01_schema.sql:18). Broadcast the dim: at
    100 TB the fact side must not shuffle for a validation."""
    return fact.join(F.broadcast(dim), key, "left_anti")


def negative_amounts(charges: DataFrame, amount_col: str = "amount") -> DataFrame:
    """D4: validation filter WHERE amount < 0 (reference readme.md:143-145).
    Predicate pushes to the parquet scan (min/max row-group skipping)."""
    return charges.filter(F.col(amount_col) < 0)
