"""Table maintenance: keyed upsert (MERGE semantics) + compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stock_data_pipeline_spark.sources.maintenance import compact, merge_upsert


def _write_target(spark, path):
    spark.createDataFrame(
        [
            ("AAPL", 1, 100.0),
            ("MSFT", 1, 200.0),
            ("GOOG", 1, 300.0),
        ],
        "ticker string, version int, price double",
    ).write.parquet(path)


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    updates = spark.createDataFrame(
        [
            ("AAPL", 2, 111.0),   # newer version → replaces
            ("NVDA", 1, 500.0),   # new key → inserts
            ("MSFT", 0, 99.0),    # OLDER version → ignored
        ],
        "ticker string, version int, price double",
    )
    merge_upsert(spark, path, updates, keys=["ticker"], version_col="version")
    out = {r.ticker: (r.version, r.price) for r in spark.read.parquet(path).collect()}
    assert out == {
        "AAPL": (2, 111.0),
        "MSFT": (1, 200.0),
        "GOOG": (1, 300.0),
        "NVDA": (1, 500.0),
    }


def test_merge_upsert_same_version_update_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    updates = spark.createDataFrame(
        [("AAPL", 1, 123.0)], "ticker string, version int, price double"
    )
    merge_upsert(spark, path, updates, keys=["ticker"], version_col="version")
    out = {r.ticker: r.price for r in spark.read.parquet(path).collect()}
    assert out["AAPL"] == 123.0  # re-statement of the same version replaces


def test_merge_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    updates = spark.createDataFrame(
        [("AAPL", 2, 111.0)], "ticker string, version int, price double"
    )
    merge_upsert(spark, path, updates, keys=["ticker"], version_col="version")
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    merge_upsert(spark, path, updates, keys=["ticker"], version_col="version")
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == first


def _parquet_files(path):
    return [
        os.path.join(root, f)
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]


def test_compact_collapses_small_files_preserving_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # 40 tiny files — the micro-batch landing-zone shape
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(path)
    assert len(_parquet_files(path)) == 40
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n = compact(spark, path)
    assert n == 1  # tiny table → one target-size file
    assert len(_parquet_files(path)) == 1
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    from stock_data_pipeline_spark.catalog import load
    from stock_data_pipeline_spark.sources.maintenance import (
        read_hourly_rollup,
        refresh_hourly_rollup,
    )

    events = load(spark, "/root/testdata/sf0.001", "events")
    inc1 = events.filter(F.dayofmonth("ts") <= 10)
    inc2 = events.filter(F.dayofmonth("ts") > 10)
    rollup = str(tmp_path / "rollup")
    refresh_hourly_rollup(spark, rollup, inc1)
    refresh_hourly_rollup(spark, rollup, inc2)
    got = {
        (r.event_type, r.bucket): (r.n, r.sum_value, round(r.avg_value, 9))
        for r in read_hourly_rollup(spark, rollup).collect()
    }
    full = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
    )
    want = {
        (r.event_type, r.bucket): (r.n, r.s, round(r.s / r.n, 9))
        for r in full.collect()
    }
    assert got == want


def test_merge_upsert_rejects_column_mismatch(spark, tmp_path):
    """A narrower updates frame must raise, not silently drop the target's
    extra column from the table forever."""
    import pytest

    path = str(tmp_path / "t")
    _write_target(spark, path)
    narrower = spark.createDataFrame(
        [("AAPL", 2)], "ticker string, version int"
    )
    with pytest.raises(ValueError, match="column mismatch"):
        merge_upsert(spark, path, narrower, keys=["ticker"], version_col="version")
    wider = spark.createDataFrame(
        [("AAPL", 2, 1.0, "x")],
        "ticker string, version int, price double, rogue string",
    )
    with pytest.raises(ValueError, match="column mismatch"):
        merge_upsert(spark, path, wider, keys=["ticker"], version_col="version")
    # table untouched by the failed merges
    assert spark.read.parquet(path).count() == 3


def test_append_sink_schema_evolution_mergeschema(spark, tmp_path):
    """Operational reality at 100 TB: a new nullable measure column starts
    arriving mid-stream. Parquet append + mergeSchema read must surface
    the superset schema with NULLs for pre-evolution rows — the Spark
    analog of the reference's BigQuery schema autodetect-on-append."""
    from pyspark.sql import functions as F

    sink = str(tmp_path / "sink")
    v1 = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("price")
    )
    v1.write.mode("append").parquet(sink)
    v2 = spark.range(10, 20).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("price"),
        (F.col("id") * 10).alias("volume"),  # new column mid-stream
    )
    v2.write.mode("append").parquet(sink)

    out = spark.read.option("mergeSchema", "true").parquet(sink)
    assert set(out.columns) == {"k", "price", "volume"}
    assert out.count() == 20
    nulls = out.filter(F.col("volume").isNull()).select("k").collect()
    assert {r.k for r in nulls} == set(range(10))
    # and the evolved rows carry real values
    assert out.filter(F.col("k") == 15).first().volume == 150


def test_incremental_ohlcv_equals_full_recompute_any_order(spark, tmp_path):
    """Bar maintenance is commutative/associative: out-of-order and
    day-splitting batch arrivals must still reproduce the from-scratch
    bars, including the argmin/argmax open/close."""
    from stock_data_pipeline_spark.catalog import load
    from stock_data_pipeline_spark.sources.maintenance import (
        _ohlcv_partials,
        read_ohlcv_bars,
        refresh_ohlcv_bars,
    )

    events = load(spark, "/root/testdata/sf0.001", "events")
    # three slices that split days across batches, applied out of order
    slices = [
        events.filter(F.hour("ts") >= 12),
        events.filter((F.hour("ts") < 12) & (F.dayofmonth("ts") > 15)),
        events.filter((F.hour("ts") < 12) & (F.dayofmonth("ts") <= 15)),
    ]
    bars = str(tmp_path / "bars")
    for s in slices:
        refresh_ohlcv_bars(spark, bars, s)
    got = {
        (r.event_type, r.bar_date): (
            r.open, r.high, r.low, r.close, r.n_ticks, round(r.volume, 6)
        )
        for r in read_ohlcv_bars(spark, bars).collect()
    }

    full = _ohlcv_partials(events)
    want = {
        (r.event_type, r.bar_date): (
            r.open_p.v, r.high, r.low, r.close_p.v, r.n_ticks,
            round(float(r.volume), 6),
        )
        for r in full.collect()
    }
    assert got == want
    # and the bar view agrees with the registered b03 resample on the
    # scalar aggregates (open/close tie semantics differ only on exact
    # timestamp ties, absent in this feed)
    from stock_data_pipeline_spark import registry

    b03 = {
        (r.event_type, r.bar_date): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in registry.full_queries()["b03_ohlcv_bars"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert {k: v[:5] for k, v in got.items()} == b03


# --------------------------------------------------------------------------
# Result cache (semantic-hash keyed)
# --------------------------------------------------------------------------
def test_result_cache_serves_materialized_rows_until_refreshed(spark, tmp_path):
    from stock_data_pipeline_spark.sources.result_cache import (
        cached_result,
        invalidate,
    )

    src = str(tmp_path / "src")
    cache = str(tmp_path / "cache")
    spark.range(10).write.parquet(src)

    def q():
        return spark.read.parquet(src).selectExpr("sum(id) AS s")

    first = cached_result(q(), cache).collect()[0].s
    assert first == 45

    # mutate the source: the cache (by design) still answers the old
    # result — proof the second call reads the materialization
    spark.range(100).write.mode("overwrite").parquet(src)
    assert cached_result(q(), cache).collect()[0].s == 45
    # refresh recomputes against the new source
    assert cached_result(q(), cache, refresh=True).collect()[0].s == 4950
    # and the refreshed entry now serves the new result
    assert cached_result(q(), cache).collect()[0].s == 4950

    # invalidation removes the entry; next call recomputes
    assert invalidate(q(), cache) is True
    assert invalidate(q(), cache) is False


def test_result_cache_distinguishes_different_queries(spark, tmp_path):
    from stock_data_pipeline_spark.sources.result_cache import _entry_path

    src = str(tmp_path / "src2")
    spark.range(10).write.parquet(src)
    a = spark.read.parquet(src).selectExpr("sum(id) AS s")
    b = spark.read.parquet(src).selectExpr("max(id) AS s")
    same = spark.read.parquet(src).selectExpr("sum(id) AS s")
    assert _entry_path("/c", a) != _entry_path("/c", b)
    assert _entry_path("/c", a) == _entry_path("/c", same)


def test_result_cache_collision_degrades_to_recompute(spark, tmp_path, monkeypatch):
    """Two queries with IDENTICAL output schema but different filter
    literals (the parameterized-dashboard case) forced into the SAME
    cache bucket must each get their own correct rows — the plan
    fingerprint turns the collision into a recompute, never into
    serving the other query's cached result."""
    from stock_data_pipeline_spark.sources import result_cache

    src = str(tmp_path / "src3")
    cache = str(tmp_path / "cache3")
    spark.range(10).write.parquet(src)

    def q(lim):
        return (
            spark.read.parquet(src)
            .filter(f"id < {lim}")
            .selectExpr("sum(id) AS s")
        )

    # force a 32-bit bucket collision
    monkeypatch.setattr(
        result_cache, "_entry_path", lambda cd, df: f"{cd}/q_collide"
    )
    assert result_cache.cached_result(q(5), cache).collect()[0].s == 10
    # schema identical, literal different: must NOT serve the cached 10
    assert result_cache.cached_result(q(9), cache).collect()[0].s == 36
    # and re-asking the first query recomputes again (entry was overwritten)
    assert result_cache.cached_result(q(5), cache).collect()[0].s == 10


def test_result_cache_torn_rewrite_never_serves_wrong_rows(
    spark, tmp_path, monkeypatch
):
    """Crash window between a collision recompute's data write and its
    fingerprint write: the tombstone written FIRST must leave the entry
    a cache miss, so the old query can never have another query's
    freshly-written rows validated by its own stale fingerprint."""
    from stock_data_pipeline_spark.sources import result_cache

    src = str(tmp_path / "src4")
    cache = str(tmp_path / "cache4")
    spark.range(10).write.parquet(src)

    def q(lim):
        return (
            spark.read.parquet(src)
            .filter(f"id < {lim}")
            .selectExpr("sum(id) AS s")
        )

    monkeypatch.setattr(
        result_cache, "_entry_path", lambda cd, df: f"{cd}/q_collide"
    )
    assert result_cache.cached_result(q(5), cache).collect()[0].s == 10

    # simulate query B's rewrite crashing AFTER the tombstone + data
    # overwrite but BEFORE the new fingerprint lands
    entry = f"{cache}/q_collide"
    result_cache._write_meta(spark, f"{entry}/__meta", "__rewriting__")
    q(9).write.mode("overwrite").parquet(f"{entry}/data")

    # A must recompute (tombstone != A's fingerprint), not serve B's 36
    assert result_cache.cached_result(q(5), cache).collect()[0].s == 10
