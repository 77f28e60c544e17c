"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the recurring fact⋈fact join (prices ⋈ news on ticker, lineitem ⋈
orders on orderkey) pays a full shuffle of BOTH sides every query. Bucketing
pre-shuffles ONCE at write time: both tables hash-partitioned into the same
number of buckets on the join key, so every subsequent join/groupBy on that
key is exchange-free (SortMergeJoin over pre-bucketed scans).

This is the growth path the catalog docstring reserves: hot fact tables get
bucketed copies in the warehouse; ad-hoc tables stay plain parquet. Bucketed
writes require ``saveAsTable`` (bucket metadata lives in the catalog, not in
parquet itself).

Verified in tests/test_bucketing.py: the bucketed join plan contains NO
Exchange, and results equal the plain-parquet join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    n_buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_by`` pre-sorts within buckets so SortMergeJoin also skips the
    per-task sort. Pick ``n_buckets`` so one bucket ≈ 100-500 MB at target
    scale (e.g. 4096 buckets for a 1 TB table). ``path`` makes the table
    external (data at an explicit location instead of the warehouse dir —
    the warehouse dir is static config, unchangeable on a live session).
    """
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata applied automatically)."""
    return spark.table(table)


def write_gold_table(
    df: DataFrame,
    table: str,
    *,
    partition_by: str | list[str],
    bucket_by: str | list[str],
    n_buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """The full analytics ("gold") layout: directory PARTITIONS on the
    time/tenant column compose with BUCKETS on the join key and an
    in-bucket SORT — so one write buys all three access paths every
    dashboard query needs:

    - time-range predicates prune whole partition directories
      (planning-time, before any I/O),
    - the recurring key join/groupBy is exchange-free against any other
      table bucketed the same way,
    - SortMergeJoin and range scans skip the per-task sort.

    Partition and bucket columns must differ (Spark enforces it): the
    partition column is the COARSE pruning axis (ingest day), the bucket
    key the JOIN axis (entity id) — exactly the b85/PIT and bars-join
    access patterns. Size n_buckets for 100-500 MB per bucket per
    partition at target scale. Both layout layers are verified together
    in tests/test_bucketing.py (pruned scan + no-Exchange join in ONE
    plan).
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).partitionBy(*parts).bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
