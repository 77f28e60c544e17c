"""SCD2 correctness: incremental fold == batch rebuild, plus edge cases.

The strong check: applying the daily snapshots one at a time through
scd2_apply must produce exactly the validity intervals that the batch
gaps-and-islands query (b54_scd2_history, DuckDB-oracle-backed) rebuilds
from the full feed.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from stock_data_pipeline_spark import registry
from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.operators.scd import scd2_apply, scd2_current


def _daily_snapshots(spark, sf_dir):
    """The b54 input: one (user_id, day, tier) row per user-day."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.floor(F.max_by("value", "ts") / F.lit(100.0))
            .cast("bigint")
            .alias("tier")
        )
    )


def test_incremental_fold_equals_batch_rebuild(spark, sf_dir):
    snaps = _daily_snapshots(spark, sf_dir)
    days = sorted(r.d for r in snaps.select("d").distinct().collect())

    history = None
    for d in days:
        one = snaps.filter(F.col("d") == F.lit(d)).withColumnRenamed("d", "as_of")
        # coalesce_to bounds the union's partition growth across folds;
        # localCheckpoint truncates the lineage (same rule a foreachBatch
        # sink follows by landing each batch)
        history = scd2_apply(
            history, one, keys=["user_id"], attrs=["tier"], coalesce_to=8
        )
        history = history.localCheckpoint(eager=True)

    got = {
        (r.user_id, r.tier, r.valid_from, r.valid_to if r.valid_to else None)
        for r in history.collect()
    }

    batch = registry.full_queries()["b54_scd2_history"](spark, sf_dir).collect()
    # batch valid_to is the last day OBSERVED in the island; incremental
    # valid_to is the day the NEXT version opened (exclusive) or None while
    # open. Map batch intervals to the incremental convention via the next
    # island's valid_from.
    by_user = {}
    for r in batch:
        by_user.setdefault(r.user_id, []).append(r)
    want = set()
    for user, islands in by_user.items():
        islands.sort(key=lambda r: r.valid_from)
        for i, r in enumerate(islands):
            nxt = islands[i + 1].valid_from if i + 1 < len(islands) else None
            want.add((user, r.tier, r.valid_from, nxt))
    assert got == want


def test_bootstrap_and_noop_batches(spark):
    snap = spark.createDataFrame(
        [(1, "gold", datetime.date(2024, 1, 1)), (2, "bronze", datetime.date(2024, 1, 1))],
        "id int, grade string, as_of date",
    )
    h1 = scd2_apply(None, snap, keys=["id"], attrs=["grade"])
    assert h1.count() == 2
    assert scd2_current(h1).count() == 2

    # identical snapshot again: nothing closes, nothing opens
    snap2 = snap.withColumn("as_of", F.lit(datetime.date(2024, 1, 2)))
    h2 = scd2_apply(h1, snap2, keys=["id"], attrs=["grade"])
    rows = h2.collect()
    assert len(rows) == 2
    assert all(r.is_current and r.valid_to is None for r in rows)
    assert {r.valid_from for r in rows} == {datetime.date(2024, 1, 1)}


def test_change_closes_and_opens(spark):
    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 5)
    h = scd2_apply(
        None,
        spark.createDataFrame([(1, "gold", d1)], "id int, grade string, as_of date"),
        keys=["id"],
        attrs=["grade"],
    )
    h = scd2_apply(
        h,
        spark.createDataFrame([(1, "silver", d2), (2, "bronze", d2)],
                              "id int, grade string, as_of date"),
        keys=["id"],
        attrs=["grade"],
    )
    rows = {(r.id, r.grade): r for r in h.collect()}
    assert len(rows) == 3
    old = rows[(1, "gold")]
    assert not old.is_current and old.valid_to == d2 and old.valid_from == d1
    new = rows[(1, "silver")]
    assert new.is_current and new.valid_from == d2 and new.valid_to is None
    assert rows[(2, "bronze")].is_current


def test_missing_key_stays_open(spark):
    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
    h = scd2_apply(
        None,
        spark.createDataFrame([(1, "gold", d1), (2, "bronze", d1)],
                              "id int, grade string, as_of date"),
        keys=["id"],
        attrs=["grade"],
    )
    # key 2 absent from the next snapshot: its row must stay open
    h = scd2_apply(
        h,
        spark.createDataFrame([(1, "gold", d2)], "id int, grade string, as_of date"),
        keys=["id"],
        attrs=["grade"],
    )
    rows = {r.id: r for r in h.collect()}
    assert len(rows) == 2
    assert rows[2].is_current and rows[2].valid_to is None


def test_null_attribute_transitions(spark):
    """NULL→value and value→NULL are real changes; NULL→NULL is not
    (null-safe comparison)."""
    d = [datetime.date(2024, 1, i) for i in range(1, 4)]
    h = scd2_apply(
        None,
        spark.createDataFrame([(1, None, d[0])], "id int, grade string, as_of date"),
        keys=["id"], attrs=["grade"],
    )
    h = scd2_apply(
        h,
        spark.createDataFrame([(1, None, d[1])], "id int, grade string, as_of date"),
        keys=["id"], attrs=["grade"],
    )
    assert h.count() == 1  # NULL == NULL: no new version
    h = scd2_apply(
        h,
        spark.createDataFrame([(1, "gold", d[2])], "id int, grade string, as_of date"),
        keys=["id"], attrs=["grade"],
    )
    rows = sorted(h.collect(), key=lambda r: r.valid_from)
    assert len(rows) == 2
    assert rows[0].grade is None and rows[0].valid_to == d[2]
    assert rows[1].grade == "gold" and rows[1].is_current


def test_enrich_point_in_time_accepts_null_valid_to(spark):
    """The serving-side PIT join must accept an scd2_apply-maintained
    history, whose CURRENT rows carry valid_to IS NULL (the open-interval
    convention), in addition to the b54 closed-interval convention. A
    naive `day <= valid_to` predicate evaluates NULL for every event in
    the current version window and silently drops them."""
    import datetime as dt

    from stock_data_pipeline_spark.streaming.jobs import enrich_point_in_time

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 10)
    h = scd2_apply(
        None,
        spark.createDataFrame([(1, "gold", d1)], "user_id int, tier string, as_of date"),
        keys=["user_id"],
        attrs=["tier"],
    )
    h = scd2_apply(
        h,
        spark.createDataFrame([(1, "silver", d2)], "user_id int, tier string, as_of date"),
        keys=["user_id"],
        attrs=["tier"],
    )
    from pyspark.sql import Window

    history = h.withColumn(
        "version",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("valid_from")
        ),
    )
    # one event in the closed (historical) window, one in the OPEN
    # current window, one non-purchase control
    events = spark.createDataFrame(
        [
            (100, 1, "purchase", dt.datetime(2024, 1, 3, 12)),
            (101, 1, "purchase", dt.datetime(2024, 2, 1, 9)),
            (102, 1, "view", dt.datetime(2024, 2, 1, 9)),
        ],
        "event_id int, user_id int, event_type string, ts timestamp",
    )
    got = {
        (r.event_id, r.tier, r.version)
        for r in enrich_point_in_time(events, history).collect()
    }
    # event 101 lands in the silver window (valid_to IS NULL) — it must
    # be enriched, not dropped
    assert got == {(100, "gold", 1), (101, "silver", 2)}
