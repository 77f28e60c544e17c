"""Bucketed co-located joins: the write-once-shuffle-never scale path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    sf_dir = "/root/testdata/sf0.001"
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_b", bucket_by="o_orderkey", n_buckets=8,
        sort_by="o_orderkey", path=str(warehouse / "orders_b"),
    )
    write_bucketed(
        lineitem, "lineitem_b", bucket_by="l_orderkey", n_buckets=8,
        sort_by="l_orderkey", path=str(warehouse / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join(o, li):
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
        "o_orderstatus"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev"),
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o_name, li_name = bucketed_tables
    # Disable auto-broadcast so the test exercises the SMJ path bucketing
    # is designed for (at real scale neither fact side broadcasts).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _join(read_table(spark, o_name), read_table(spark, li_name))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    # The join's inputs come straight from bucketed scans — no shuffle.
    assert "Exchange hashpartitioning" not in join_section


def test_bucketed_join_equals_plain_join(spark, bucketed_tables):
    o_name, li_name = bucketed_tables
    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        map(
            tuple,
            _join(
                read_table(spark, o_name), read_table(spark, li_name)
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _join(
                load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
            ).collect(),
        )
    )
    assert got == want


def test_registered_bucketed_join_query_is_exchange_free(spark):
    """The driver-facing b05_bucketed_join must keep the no-shuffle plan:
    SMJ over bucketed scans, no Exchange feeding the join."""
    from stock_data_pipeline_spark.registry import get

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = get("b05_bucketed_join").fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_section


def test_registered_bucketed_join_reuses_tables_across_calls(spark):
    """Second invocation must read the already-written bucketed tables,
    not rewrite them (idempotent within a session)."""
    import time

    from stock_data_pipeline_spark.registry import get

    fn = get("b05_bucketed_join").fn
    fn(spark, "/root/testdata/sf0.001").collect()  # ensures tables exist
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.001").collect()
    assert time.perf_counter() - t0 < 30  # no rewrite path


def test_gold_layout_prunes_partitions_and_joins_without_exchange(
    spark, sf_dir, tmp_path
):
    """One write, three access paths: the day-partitioned + user-bucketed
    + ts-sorted layout must show partition pruning AND an exchange-free
    join in the SAME query plan, and the result must equal the plain
    computation."""
    from stock_data_pipeline_spark.sources.bucketed import (
        read_table,
        write_gold_table,
    )

    events = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    views = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    for name, df in [("gold_views", views), ("gold_clicks", clicks)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_gold_table(
            df,
            name,
            partition_by="day",
            bucket_by="user_id",
            n_buckets=8,
            sort_by="user_id",
            path=str(tmp_path / name),
        )

    day = "2024-01-05"
    # disable auto-broadcast so the planner exercises the bucket layout
    # (at real scale neither side broadcasts; tiny test tables would)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_table(spark, "gold_views").filter(F.col("day") == day)
        b = read_table(spark, "gold_clicks").filter(F.col("day") == day)
        joined = a.select("user_id", F.col("event_id").alias("view_id")).join(
            b.select("user_id", F.col("event_id").alias("click_id")), "user_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
    assert "Exchange" not in plan  # bucketed co-location: no shuffle
    assert plan.count("PartitionFilters: [") == 2
    assert day.replace("-", "") in plan.replace("-", "")  # filter reached pruning

    # correctness vs plain computation
    want = (
        views.filter(F.col("day") == day)
        .select("user_id", F.col("event_id").alias("view_id"))
        .join(
            clicks.filter(F.col("day") == day).select(
                "user_id", F.col("event_id").alias("click_id")
            ),
            "user_id",
        )
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
    spark.sql("DROP TABLE IF EXISTS gold_views")
    spark.sql("DROP TABLE IF EXISTS gold_clicks")
