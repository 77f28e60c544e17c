"""Partitioned-sink scale behaviors: planning-time partition pruning and
idempotent single-day backfill via dynamic partition overwrite.

These are the two properties that make the date-partitioned sink layout
(pipelines/ingest.py) survive 100 TB: a day query must list one day's
directories, and repairing a bad day must rewrite one day's directories —
never scan or truncate the table.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from stock_data_pipeline_spark.pipelines.ingest import (
    TICKER_SPEC,
    IngestPipeline,
)
from stock_data_pipeline_spark.sources.fetch import synthetic_quote_fetcher

DAY1 = datetime(2024, 3, 1, 9, 30, 0)
DAY2 = datetime(2024, 3, 2, 9, 30, 0)
DAY3 = datetime(2024, 3, 3, 9, 30, 0)

SYMBOLS = [f"SYM{i:03d}" for i in range(20)]


@pytest.fixture()
def landed(spark, tmp_path):
    p = IngestPipeline(
        TICKER_SPEC,
        str(tmp_path),
        fetcher=synthetic_quote_fetcher(TICKER_SPEC.fields),
        symbols=SYMBOLS,
    )
    for t in (DAY1, DAY2, DAY3):
        p.run_batch(spark, t)
    return p


def _executed_plan(df) -> str:
    if not hasattr(df, "_jdf"):  # Spark Connect: no JVM plan handle
        pytest.skip("classic session required for executed-plan asserts")
    return df._jdf.queryExecution().executedPlan().toString()


def test_day_read_prunes_partitions(spark, landed):
    day = landed.read_sink_day(spark, "2024-03-02")
    rows = day.collect()
    assert len(rows) == 20
    assert {r.Time for r in rows} == {DAY2}

    plan = _executed_plan(day)
    # the date filter must resolve against the directory layout, not the rows
    assert "PartitionFilters: []" not in plan
    assert "ingest_date" in plan.split("PartitionFilters", 1)[1].split("]")[0]


def test_unfiltered_read_has_no_partition_filter(spark, landed):
    plan = _executed_plan(spark.read.parquet(landed.sink_path))
    assert "PartitionFilters: []" in plan


def test_backfill_replaces_only_the_target_day(spark, landed):
    # corrupt repair scenario: rebuild day 2 with halved prices
    repaired = (
        landed.read_sink_day(spark, "2024-03-02")
        .drop("ingest_date")
        .withColumn("Price", F.col("Price") / 2)
    )
    before_d1 = {tuple(r) for r in landed.read_sink_day(spark, "2024-03-01").collect()}
    before_d3 = {tuple(r) for r in landed.read_sink_day(spark, "2024-03-03").collect()}

    landed.backfill_day(repaired, "2024-03-02")

    # target day replaced (same row count, new values), not appended
    after_d2 = landed.read_sink_day(spark, "2024-03-02")
    assert after_d2.count() == 20
    # other partitions byte-identical — dynamic overwrite never touched them
    assert {tuple(r) for r in landed.read_sink_day(spark, "2024-03-01").collect()} == before_d1
    assert {tuple(r) for r in landed.read_sink_day(spark, "2024-03-03").collect()} == before_d3
    assert landed.read_sink(spark).count() == 60


def test_backfill_is_idempotent(spark, landed):
    # each attempt rebuilds its read (a retried job starts fresh) — and
    # each read-fix-write derives from the sink being overwritten, which
    # backfill_day's lineage cut makes safe
    for _ in range(2):
        repaired = landed.read_sink_day(spark, "2024-03-02").drop("ingest_date")
        landed.backfill_day(repaired, "2024-03-02")
    assert landed.read_sink(spark).count() == 60
    assert landed.read_sink_day(spark, "2024-03-02").count() == 20


def test_backfill_ignores_rows_outside_the_day(spark, landed):
    """A repair frame polluted with other days' rows must not leak them
    into the target-day write (the filter is part of the contract)."""
    all_rows = landed.read_sink(spark)
    landed.backfill_day(all_rows, "2024-03-02")
    assert landed.read_sink(spark).count() == 60
    assert landed.read_sink_day(spark, "2024-03-02").count() == 20


# --------------------------------------------------------------------------
# Object-store sink URIs (A18 hand-off: the reference copies CSVs to GCS;
# here the sink root IS the object-store URI — see MIGRATION.md)
# --------------------------------------------------------------------------
def test_sink_uri_scheme_passes_through_unchanged(spark):
    """An `s3a://`-style sink_root must flow through path construction,
    the write path, and the partition-pruned read UNCHANGED — resolved
    by Hadoop's FileSystem registry, never mangled into a driver-local
    path. No network: the proof is that resolution fails looking for
    the S3A connector CLASS (scheme intact, handed to the right
    plug-in point), not with a local file-not-found."""
    import pytest

    from stock_data_pipeline_spark.pipelines.ingest import (
        TICKER_SPEC,
        IngestPipeline,
    )

    p = IngestPipeline(
        TICKER_SPEC, "s3a://warehouse/prod", symbols=["AAPL", "MSFT"]
    )
    # path construction: URI preserved verbatim
    assert p.sink_path == "s3a://warehouse/prod/ticker_data"
    assert p.quarantine_path == "s3a://warehouse/prod/ticker_data_quarantine"

    # read path: the failure must be connector-class resolution for the
    # s3a scheme — proof the URI reached Hadoop FS lookup unchanged
    with pytest.raises(Exception, match="S3AFileSystem"):
        p.read_sink_day(spark, "2024-01-02").collect()

    # write path (full batch lineage: fetch -> split -> enforce -> append)
    from datetime import datetime

    with pytest.raises(Exception, match="S3AFileSystem"):
        p.run_batch(spark, datetime(2024, 1, 2, 9, 30))
