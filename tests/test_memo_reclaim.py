"""Registry plan-memo eviction must release plans PROMPTLY (round 11).

A memoized query plan pins its JVM QueryExecution (analyzed/optimized
trees + every broadcast the plan references) through the py4j binding
for as long as the Python DataFrame object lives. DataFrames sit in
reference cycles, so LRU popitem alone does NOT free them — only a
cycle collection does, and waiting for ambient gc latency let evicted
plans accumulate JVM heap across long single-session sweeps (the r10
b73 broadcast-build OOM at query ~25 under sf0.1+split64 on a 1g
driver). The wrapper now runs ``gc.collect()`` per eviction batch.

Pinned here: a weakref to the evicted DataFrame is DEAD the moment the
evicting call returns — no explicit gc in the test, no sleep — and the
py4j JVM binding went with it (the finalizer path py4j runs on collect).
"""

from __future__ import annotations

import weakref

import pytest

from stock_data_pipeline_spark import registry

_SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tiny_memo(spark):
    old = spark.conf.get(registry.MEMO_CAPACITY_CONF, None)
    spark.conf.set(registry.MEMO_CAPACITY_CONF, "1")
    registry.invalidate_plans(spark)
    yield
    if old is None:
        spark.conf.unset(registry.MEMO_CAPACITY_CONF)
    else:
        spark.conf.set(registry.MEMO_CAPACITY_CONF, old)
    registry.invalidate_plans(spark)


def test_evicted_plan_is_collected_when_eviction_returns(spark, tiny_memo):
    qs = registry.all_queries()
    first = qs["b01_filter_time_range"](spark, _SF)
    ref = weakref.ref(first)
    jdf_ref = weakref.ref(first._jdf)
    del first  # the memo's strong ref is now the only one
    assert ref() is not None  # cycles keep it alive past refcount drop

    # Build a DIFFERENT query: capacity 1 → evicts b01; the wrapper's
    # per-eviction gc.collect() must kill it before this call returns.
    qs["b16_null_handling"](spark, _SF)
    assert ref() is None, "evicted DataFrame survived eviction"
    assert jdf_ref() is None, "py4j JavaObject survived eviction"


def test_memo_capacity_is_still_enforced(spark, tiny_memo):
    # full_queries, not all_queries: the memo is window-agnostic and the
    # driver-window rotation must not be able to break this test by
    # rotating a hardcoded name out (it did in r14: b38_large_orders).
    qs = registry.full_queries()
    for name in ("b01_filter_time_range", "b16_null_handling", "b38_large_orders"):
        qs[name](spark, _SF)
    per_session = registry._PLAN_MEMO.get(spark)
    assert per_session is not None and len(per_session) == 1
