"""Formatted-plan accessors + assertion helpers.

These encode the engine's performance contract: a query that stops
pushing filters to the scan, loses a broadcast, or grows a Python eval
node in the hot path is a regression even if its results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any(fragment in l for l in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}"
    )


def assert_broadcast_joins(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, found {n}"
    assert "CartesianProduct" not in plan, "unexpected cartesian product"


def assert_no_python_eval(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "Python eval node in a JVM-only plan"
    )
