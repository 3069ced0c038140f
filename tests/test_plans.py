"""Physical-plan regression tests: the properties that make these
queries survive 100 TB must stay visible in the plan (SURVEY.md goal —
'the plan you'd want, not the first one that passed')."""

from __future__ import annotations

import pytest

from timescale_cdc_spark.plans import formatted_plan
from timescale_cdc_spark.queries import QUERIES


def _plan(spark, name, sf_dir) -> str:
    return formatted_plan(QUERIES[name](spark, sf_dir))


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, "b12_scan_projection", sf_dir)
    assert "GreaterThanOrEqual(l_quantity,45.0)" in plan, "filter not pushed to scan"
    # column pruning: only the 4 projected columns are read
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    for col in ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]:
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "b21_join_broadcast", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, "dim joins must broadcast"
    assert "CartesianProduct" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, "b31_sort_limit_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT must plan top-K"


def test_agg_is_partial(spark, sf_dir):
    plan = _plan(spark, "b25_agg_pricing_summary", sf_dir)
    assert "partial_sum" in plan, "aggregation must combine map-side"
    assert "LessThanOrEqual(l_shipdate" in plan, "ship-date filter not pushed"


def test_no_python_udf_in_core_relational_plans(spark, sf_dir):
    """The relational + CDC surface must be 100% JVM-side (B40/C5 are
    the only sanctioned Python edges)."""
    for name in [
        "flagship_segment_revenue",
        "b25_agg_pricing_summary",
        "b30_latest_state",
        "c2_minhash_lsh",
        "c3_topk_cosine",
        "c4_quality_score",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} has Python in the hot path"
        )
