"""Result-set caching keyed by the query's semantic plan hash.

Warehouses answer repeated dashboard queries from a result cache instead
of recomputing (BigQuery does this implicitly — the reference's promised
dashboard would have leaned on it). The engine equivalent: materialize a
DataFrame's result under ``semanticHash()`` of its analyzed plan (public
PySpark API, Spark-Connect-safe — two frames with canonically equal plans
share one entry) and serve subsequent calls from the parquet scan.

Correctness stance: the cache is EXPLICIT and session-external — entries
do not observe source-table changes (same as any warehouse result cache
with a TTL). ``refresh=True`` recomputes; callers owning mutable sources
should key freshness on their ingest batch id (e.g. refresh after each
``run_batch``). A crash mid-write leaves no ``_SUCCESS`` marker, so a
half-written entry is treated as absent, never served.

Scale: entries are whatever the RESULT is — for the dashboard queries
this engine registers, aggregate-grain KB..MB, not input-sized. The
32-bit hash is a cache key, not an integrity check; collisions are
possible in principle, so the entry layout includes the result schema and
a schema mismatch forces recompute (the observable failure mode becomes a
cache miss, not wrong rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _entry_path(cache_dir: str, df: DataFrame) -> str:
    key = df.semanticHash() & 0xFFFFFFFF
    return os.path.join(cache_dir, f"q_{key:08x}")


def cached_result(
    df: DataFrame, cache_dir: str, *, refresh: bool = False
) -> DataFrame:
    """Return ``df``'s result, serving from / populating the cache.

    Hit criteria: the ``_SUCCESS`` marker exists AND the cached schema
    equals the query's schema (collision guard). Anything else —
    including a torn write — recomputes and overwrites the entry.
    """
    spark = df.sparkSession
    path = _entry_path(cache_dir, df)
    if not refresh and os.path.exists(os.path.join(path, "_SUCCESS")):
        hit = spark.read.parquet(path)
        if hit.schema == df.schema:
            return hit
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def invalidate(df: DataFrame, cache_dir: str) -> bool:
    """Drop the entry for this query, if present. Returns whether one
    existed — the hook an ingest job calls after landing a batch."""
    import shutil

    path = _entry_path(cache_dir, df)
    if os.path.isdir(path):
        shutil.rmtree(path)
        return True
    return False
