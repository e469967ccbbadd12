"""Physical-plan assertions (SURVEY.md §4): the at-scale properties —
pushdown, pruning, broadcast, map-side partial aggregation, top-k
without global sort — must hold in the plan, not just in folklore.
These tests fail if a refactor silently degrades the plan shape."""

from __future__ import annotations

import pytest

from ukis_kafka_spark import api

from .conftest import SF_SMOKE


def _formatted_plan(spark, name: str) -> str:
    df = api.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_scan_pruned_pushes_filters_and_columns(spark):
    plan = _formatted_plan(spark, "q_scan_pruned")
    assert "PushedFilters" in plan
    assert "LessThan(l_shipdate" in plan, "shipdate predicate did not reach the parquet reader"
    assert "LessThan(l_quantity" in plan
    # column pruning: the scan must read only the 4 referenced columns
    read_schema = [l for l in plan.splitlines() if l.startswith("ReadSchema")][0]
    struct = read_schema.split("struct<", 1)[1]
    assert struct.count(":") == 4, f"scan reads too many columns: {read_schema}"


def test_broadcast_join_is_broadcast(spark):
    plan = _formatted_plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_small_dim_joins_auto_broadcast(spark):
    # even without the hint, a customer-sized dim must broadcast at
    # this scale (autoBroadcastJoinThreshold)
    plan = _formatted_plan(spark, "q_join_inner")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" not in plan


def test_flagship_agg_is_partial_then_final(spark):
    plan = _formatted_plan(spark, "q_agg_groupby")
    assert "partial_sum" in plan, "no map-side partial aggregation"
    assert plan.count("Exchange") <= 2, "flagship aggregate shuffles more than once"
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_topk_avoids_global_sort(spark):
    plan = _formatted_plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, "top-k should not shuffle"


def test_theta_band_join_broadcasts_tiny_side(spark):
    plan = _formatted_plan(spark, "q_join_theta_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_no_python_udf_in_relational_core(spark):
    """The q_* relational queries must stay JVM-side: no Python eval
    nodes (BatchEvalPython/ArrowEvalPython) anywhere in their plans."""
    names = [n for n in api.queries() if n.startswith("q_")]
    for name in names:
        plan = _formatted_plan(spark, name)
        assert "EvalPython" not in plan, f"{name} crosses the Python boundary"


# AQE-wrapped plans only show codegen ids after execution, so this
# asserts on the non-adaptive (scan-shaped) queries.
@pytest.mark.parametrize("name", ["q_scan_pruned", "q_filter_basic"])
def test_whole_stage_codegen_active(spark, name):
    plan = _formatted_plan(spark, name)
    assert "codegen id" in plan, f"{name} runs without whole-stage codegen"
