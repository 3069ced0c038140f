"""Plan inspection helpers — the `.explain("formatted")` feedback loop
as code. Used by tests/test_plans.py to pin the physical properties
that matter at 100 TB (pushdown, pruning, broadcast, top-K, partial
aggregation, no Python in the hot path)."""

from timescale_cdc_spark.plans.inspect import (
    assert_broadcast_joins,
    assert_no_python_eval,
    assert_pushed_filter,
    formatted_plan,
)

__all__ = [
    "assert_broadcast_joins",
    "assert_no_python_eval",
    "assert_pushed_filter",
    "formatted_plan",
]
