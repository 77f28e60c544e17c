"""Adaptive partition rebalancing for CPU-heavy per-row operators.

Motivation (measured, see BENCH history): the local test tables are single
row-group parquet files, so scans yield ONE partition and shingling/hashing
/vector-scoring serialize on one core — 4× slower than necessary on 32.
At cluster scale the same operators read thousands of partitions and a
blind ``repartition()`` would be a catastrophic full-corpus shuffle.

:func:`rebalance` therefore widens ONLY when the input has fewer
partitions than the session's parallelism — a no-op exactly when the scan
is already parallel. Safe on every operator whose output is
partitioning-independent (all registered queries are, by the determinism
contract in registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the frame is under-parallelized."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
