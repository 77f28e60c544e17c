"""Plan-shape checks for the TPC-H completion family (operators/tpch.py).

Oracle parity for these queries is covered by the full-surface sweep in
``test_oracle_parity.py``; here we pin the physical strategies that make
the shapes scale — the EXISTS/NOT EXISTS decorrelations must become
semi/anti hash joins, dimensions must broadcast, and the Q6 predicates
must reach the parquet scan.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark import registry


def plan_of(spark, name, sf_dir) -> str:
    df = registry.get(name).fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_the_scan(spark, sf_dir):
    plan = plan_of(spark, "b63_q6_revenue_delta", sf_dir)
    assert "PushedFilters: [" in plan
    # the shipdate range and quantity bound are scan-eligible predicates
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = plan_of(spark, "b64_q4_priority_check", sf_dir)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_decorrelates_to_semi_and_anti_joins(spark, sf_dir):
    """The hardest subquery nest in the family: one correlated EXISTS and
    one correlated NOT EXISTS, both against lineitem. Catalyst must plan
    hash joins (LeftSemi + LeftAnti), never per-row subquery execution."""
    plan = plan_of(spark, "b73_q21_waiting_supplier", sf_dir)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_and_scalar_subquery(spark, sf_dir):
    plan = plan_of(spark, "b74_q22_idle_customers", sf_dir)
    assert "LeftAnti" in plan


@pytest.mark.parametrize(
    "name",
    ["b65_q8_market_share", "b66_q9_product_profit", "b72_q19_disjunctive_revenue"],
)
def test_dimension_sides_broadcast(spark, sf_dir, name):
    """The dim joins must be broadcast-hash — a shuffled dim join here
    would add fact-sized exchanges per dimension at scale."""
    plan = plan_of(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan


def test_q17_threshold_join_is_broadcast_not_shuffle(spark, sf_dir):
    """The per-part AVG threshold is aggregate-sized; joining it back to
    the facts must broadcast, leaving one fact shuffle in the plan."""
    plan = plan_of(spark, "b71_q17_small_quantity", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_q11_threshold_is_single_row_broadcast(spark, sf_dir):
    """The global-value threshold joins as a 1-row broadcast (nested-loop
    over a constant is the sanctioned pattern), not a shuffle."""
    plan = plan_of(spark, "b67_q11_important_parts", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
