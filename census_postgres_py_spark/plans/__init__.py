"""Physical-plan introspection (the 100 TB mandate made checkable).

Thin helpers over `df._jdf.queryExecution()` used by the plan-shape
test suites (tests/test_plans.py, tests/test_analytics_ext.py) and
available to users auditing an operator before running it at scale:
a filter that never reaches the parquet scan, a dim join that does
not broadcast, or a nested-loop fallback are invisible at sf0.001
and fatal on a 1000-executor cluster — assert on them instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """The Catalyst-optimized logical plan as text."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The predicate list the scan actually pushed to the source
    (empty string when nothing was pushed)."""
    plan = executed_plan(df)
    if "PushedFilters: [" not in plan:
        return ""
    return plan.split("PushedFilters: [", 1)[1].split("]", 1)[0].strip()


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast) operators in the plan —
    the first thing to bound when reviewing an operator for scale."""
    return executed_plan(df).count("Exchange")


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an all-pairs join (CartesianProduct
    or BroadcastNestedLoopJoin) — a red flag in any candidate path."""
    plan = executed_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
