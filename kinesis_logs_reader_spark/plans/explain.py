"""Physical-plan introspection helpers.

The 100-TB posture is only real if the plans prove it: filters reach
the parquet scan, small dims broadcast, narrow queries don't shuffle.
These helpers turn ``explain()`` output into assertable properties;
tests/test_plans.py pins them so a regression in plan shape fails CI,
not a production run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, needle: str) -> bool:
    return needle in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    return formatted_plan(df).count("Exchange hashpartitioning") + formatted_plan(
        df
    ).count("Exchange rangepartitioning")


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    idx = plan.find("PushedFilters: [")
    return idx >= 0 and not plan[idx:].startswith("PushedFilters: []")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the first parquet scan's ReadSchema (pruning check)."""
    plan = formatted_plan(df)
    idx = plan.find("ReadSchema: struct<")
    if idx < 0:
        return []
    inner = plan[idx + len("ReadSchema: struct<"):plan.find(">", idx)]
    return [f.split(":")[0] for f in inner.split(",") if f]
