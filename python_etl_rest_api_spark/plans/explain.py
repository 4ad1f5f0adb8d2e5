"""Plan introspection: assert the physical plan has the shape the 100 TB
design requires (pushdown reached the scan, dim joins broadcast, codegen
spans cover the hot path). Used by tests and by bench diagnostics -
"correct but with the wrong plan" fails here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str = "") -> bool:
    """True if the parquet scan carries pushed filters (optionally matching
    a fragment, e.g. a column name)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.replace(" ", ""):
            if fragment == "" or fragment in line:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols += [f.split(":")[0].strip() for f in inner.split(",") if ":" in f]
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (hashpartitioning) in the plan - the
    scale-dominating cost. Broadcast exchanges and AQE wrappers are
    excluded: broadcasting a dim is exactly what avoids shuffling the
    fact side."""
    plan = simple_plan(df)
    return sum(1 for line in plan.splitlines()
               if "Exchange hashpartitioning" in line)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Whole-stage-codegen spans in the (final) plan, via their ``*(n)``
    markers in the simple plan string. Under AQE the executed plan only
    finalizes after an action - run one by default so the count reflects
    what actually ran."""
    if execute:
        # must be an action on THIS DataFrame: count() builds a separate
        # plan and would leave df's own AQE plan unfinalized
        df.collect()
    plan = simple_plan(df)
    import re
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
