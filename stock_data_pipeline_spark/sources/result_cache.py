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

Collision stance: the 32-bit ``semanticHash`` is a bucket key, not an
integrity check. Each entry carries a sha256 FINGERPRINT of the query's
full extended plan text in a ``__meta`` side table, and a hit requires
the fingerprint to match — so two distinct queries that collide on the
32-bit hash (same projection, different filter literal is the common
parameterized-dashboard case, and such twins usually share a schema too)
degrade to a recompute-and-overwrite, never to served-wrong-rows.

Filesystem stance: all existence/delete operations go through the Hadoop
FileSystem API resolved from the entry path itself (``file://``, HDFS,
``s3a://`` … whatever the session's Hadoop conf supports), matching the
``df.write`` path resolution — never ``os.path`` which silently only
sees the driver-local disk. On a Spark Connect session (no JVM gateway)
existence degrades to a read-probe, which is still FS-correct.
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import re

from pyspark.sql import DataFrame


def _entry_path(cache_dir: str, df: DataFrame) -> str:
    key = df.semanticHash() & 0xFFFFFFFF
    sep = "" if cache_dir.endswith("/") else "/"
    return f"{cache_dir}{sep}q_{key:08x}"


def _plan_fingerprint(df: DataFrame) -> str:
    """sha256 of the LOGICAL plan text (captured from ``explain``, the
    one plan rendering that is public API on classic AND Connect).

    Two normalizations make the fingerprint a stable query identity:
    - expression IDs (``#123``) are stripped — they differ on every
      plan construction of the same query;
    - the optimized/physical sections are dropped — they embed file
      counts/sizes, so the fingerprint would change when the SOURCE
      changes, and this cache's documented contract is explicit
      refresh, not source-freshness.
    Filter/projection literals live in the analyzed section, so the
    parameterized-dashboard collision (same schema, different literal)
    is distinguished; the source path disambiguates via the bucket key
    (``semanticHash`` canonicalizes over the relation identity).
    """
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(extended=True)
    logical = buf.getvalue().split("== Optimized Logical Plan ==")[0]
    return hashlib.sha256(re.sub(r"#\d+", "#", logical).encode()).hexdigest()


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) resolved for ``path`` via the session's Hadoop
    conf, or (None, None) on a Connect session with no JVM gateway."""
    jvm = getattr(spark, "_jvm", None)
    jsc = getattr(spark, "_jsc", None)
    if jvm is None or jsc is None:
        return None, None
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(jsc.hadoopConfiguration())
    return fs, jpath


def _data_present(spark, data_path: str) -> bool:
    """Whether a committed data entry exists. Classic sessions check the
    ``_SUCCESS`` marker via the Hadoop FS; a Connect session (no gateway)
    probes the parquet DIRECTORY by read — probing the marker file itself
    would always fail (a zero-byte '_'-prefixed file is not a parquet
    dataset) and silently kill the cache. The probe accepts a torn write
    (files, no marker); the fingerprint check downstream rejects it."""
    fs, jpath = _hadoop_fs(spark, f"{data_path}/_SUCCESS")
    if fs is not None:
        return bool(fs.exists(jpath))
    try:
        spark.read.parquet(data_path).schema
        return True
    except Exception:
        return False


def cached_result(
    df: DataFrame, cache_dir: str, *, refresh: bool = False
) -> DataFrame:
    """Return ``df``'s result, serving from / populating the cache.

    Hit criteria: the data ``_SUCCESS`` marker exists AND the stored
    plan fingerprint equals this query's fingerprint (collision guard —
    schema equality alone cannot distinguish two parameterizations of
    the same dashboard query). Anything else — including a torn write —
    recomputes and overwrites the entry.
    """
    spark = df.sparkSession
    path = _entry_path(cache_dir, df)
    data_path, meta_path = f"{path}/data", f"{path}/__meta"
    fp = _plan_fingerprint(df)
    had_entry = _data_present(spark, data_path)
    if not refresh and had_entry:
        try:
            meta = spark.read.parquet(meta_path).collect()
        except Exception:
            meta = []
        if len(meta) == 1 and meta[0].plan_sha256 == fp:
            return spark.read.parquet(data_path)
    # Rewrite protocol: tombstone the OLD fingerprint first, then data,
    # then the new fingerprint. A crash at any point leaves either
    # (tombstone, old-or-torn data) or (tombstone, new data) — both a
    # cache miss on the next call — never a stale fingerprint validating
    # another query's freshly-written rows (the collision-crash serve).
    if had_entry:
        _write_meta(spark, meta_path, "__rewriting__")
    df.write.mode("overwrite").parquet(data_path)
    _write_meta(spark, meta_path, fp)
    return spark.read.parquet(data_path)


def _write_meta(spark, meta_path: str, fp: str) -> None:
    spark.createDataFrame([(fp,)], "plan_sha256 string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(meta_path)


def invalidate(df: DataFrame, cache_dir: str) -> bool:
    """Drop the entry for this query, if present. Returns whether one
    existed — the hook an ingest job calls after landing a batch.

    Uses the Hadoop FileSystem recursive delete so invalidation works on
    whatever FS the cache lives on; on a Connect session (no gateway) it
    degrades to tombstoning the fingerprint, which forces the next
    ``cached_result`` call to recompute and overwrite — same observable
    behavior, entry files reclaimed at that point.
    """
    spark = df.sparkSession
    path = _entry_path(cache_dir, df)
    fs, jpath = _hadoop_fs(spark, path)
    if fs is not None:
        if fs.exists(jpath):
            fs.delete(jpath, True)
            return True
        return False
    existed = _data_present(spark, f"{path}/data")
    if existed:
        _write_meta(spark, f"{path}/__meta", "__invalidated__")
    return existed
