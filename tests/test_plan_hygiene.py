"""Whole-registry physical-plan hygiene sweep.

Individual plan-shape tests pin specific strategies (broadcast, pushdown,
TakeOrdered, exchange-free bucketed SMJ, Python-free Tier B). This sweep
guards the whole surface against the silent catastrophic regressions: an
accidental CartesianProduct (a join that lost its equi-condition) — the
difference between O(n) and O(n²) at 100 TB.
"""

from __future__ import annotations

from stock_data_pipeline_spark import registry


def test_no_cartesian_product_in_any_registered_query(spark, sf_dir):
    """A CartesianProduct node means a join condition was dropped.
    BroadcastNestedLoopJoin against a 1-row aggregate (the n_docs /
    count-scalar pattern) is fine and deliberately allowed; an actual
    CartesianProduct is never fine."""
    offenders = {}
    for name, fn in registry.full_queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
    assert not offenders, offenders
