"""gap_fill_hourly spine guards (round-11 API promotion).

The gap-fill spine's size per key is ``(max bucket − min bucket)`` hours,
so one corrupt outlier timestamp (epoch-zero tick, year-9999 sentinel)
inflates a key's ``sequence()`` by millions of buckets. Round 10
documented the caller-side pre-filter; round 11 makes it enforceable:

- ``bounds=(lo, hi)``: pushdown ts-range pre-filter — outliers never
  reach the aggregate;
- ``max_buckets_per_key``: plan-embedded per-key ``raise_error`` (loud,
  names key/count/cap) instead of a silent scaffold explosion.

Pinned here: guards off == oracle semantics (bit-identical to the
registered driver query); full-range bounds are a no-op; an epoch-zero
outlier blows the cap LOUDLY when unbounded and is excluded cleanly when
bounded; the bounded result on poisoned data equals the clean-data result.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stock_data_pipeline_spark.catalog import load, table_path
from stock_data_pipeline_spark.operators.timeseries import gap_fill_hourly

_SF = "/root/testdata/sf0.001"


def _pdf(df):
    return (
        df.toPandas()
        .sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def clean_events(spark):
    return load(spark, _SF, "events")


@pytest.fixture(scope="module")
def ts_range(clean_events):
    row = clean_events.agg(
        {"ts": "min"}
    ).collect()[0][0], clean_events.agg({"ts": "max"}).collect()[0][0]
    return str(row[0]), str(row[1])


@pytest.fixture(scope="module")
def poisoned_events(spark, tmp_path_factory):
    """The real sf0.001 events plus ONE epoch-zero outlier row — the
    corrupt-tick shape the guard exists for (1970 → ~475k hourly buckets
    for that key's spine)."""
    src = pq.read_table(table_path(_SF, "events"))
    pdf = src.to_pandas()
    outlier = pdf.iloc[[0]].copy()
    outlier["event_id"] = pdf["event_id"].max() + 1
    outlier["ts"] = pd.Timestamp("1970-01-01 00:00:00")
    out = pd.concat([pdf, outlier], ignore_index=True)
    d = tmp_path_factory.mktemp("poisoned_sf")
    pq.write_table(
        pa.Table.from_pandas(out, schema=src.schema, preserve_index=False),
        str(d / "events.parquet"),
    )
    return load(spark, str(d), "events")


def test_guards_off_matches_registered_driver_query(spark, clean_events):
    from stock_data_pipeline_spark.registry import get

    via_op = _pdf(gap_fill_hourly(clean_events))
    via_registry = _pdf(get("b28_gap_fill").fn(spark, _SF))
    pd.testing.assert_frame_equal(via_op, via_registry)


def test_full_range_bounds_and_cap_are_a_noop(clean_events, ts_range):
    base = _pdf(gap_fill_hourly(clean_events))
    guarded = _pdf(
        gap_fill_hourly(
            clean_events, bounds=ts_range, max_buckets_per_key=100_000
        )
    )
    pd.testing.assert_frame_equal(base, guarded)


def test_epoch_zero_outlier_blows_cap_loudly(poisoned_events):
    capped = gap_fill_hourly(poisoned_events, max_buckets_per_key=10_000)
    with pytest.raises(Exception) as exc:
        capped.count()
    msg = str(exc.value)
    assert "gap-fill spine overflow" in msg
    assert "max_buckets_per_key=10000" in msg
    assert "bounds=(lo, hi)" in msg  # the actionable fix is named


def test_bounds_exclude_outlier_and_match_clean_result(
    clean_events, poisoned_events, ts_range
):
    clean = _pdf(gap_fill_hourly(clean_events))
    bounded = _pdf(
        gap_fill_hourly(
            poisoned_events, bounds=ts_range, max_buckets_per_key=10_000
        )
    )
    pd.testing.assert_frame_equal(clean, bounded)


def test_hourly_cache_hook_releases_the_persisted_aggregate(clean_events):
    """ADVICE r11: each direct gap_fill_hourly call persists its hourly
    aggregate, and that CacheManager entry outlives the Python handle —
    ad-hoc callers need a release hook. The returned frame exposes the
    persisted aggregate as ``hourly_cache``; unpersisting it must drop
    the storage level back to NONE (no cached blocks retained)."""
    from pyspark import StorageLevel

    out = gap_fill_hourly(clean_events, max_buckets_per_key=100_000)
    out.count()  # materialize the cache
    assert out.hourly_cache.storageLevel == StorageLevel.MEMORY_AND_DISK
    out.hourly_cache.unpersist(blocking=True)
    assert not out.hourly_cache.storageLevel.useMemory
    assert not out.hourly_cache.storageLevel.useDisk


def test_bounds_reach_the_parquet_scan(clean_events, ts_range):
    """The bounds pre-filter must push down to the scan, not post-filter:
    at 100 TB the whole point is skipping row groups."""
    plan = (
        gap_fill_hourly(clean_events, bounds=ts_range)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan
