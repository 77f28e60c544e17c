"""Scan-level quarantine: parse-aware reads that keep bad records observable.

The reference swallows per-row failures with bare ``except: continue``
(/root/reference/dags/stock_data_to_gcp.py:48-50,
news_data_to_gcp.py:60-64) — rows vanish silently. The engine keeps the
*semantic* (one bad record must never kill a 500-ticker batch) but makes
rejects first-class: each input line is parsed with ``from_csv`` /
``from_json`` in PERMISSIVE mode, and the split returns (good,
quarantined) frames so reject counts are monitorable (the A6/A11
pairing).

Why text + ``from_csv`` instead of the DataFrameReader's own PERMISSIVE
mode: Spark forbids queries over a raw CSV/JSON scan that reference only
the internal corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_
CORRUPT_RECORD_COLUMN) — the documented workaround is to cache the scan,
which is a non-starter at 100 TB. Reading lines with ``spark.read.text``
and parsing via expression sidesteps the restriction entirely: the file
relation's referenced column is the real ``value`` line, parsing is one
pass, everything stays lazy, and the raw line rides along for free as the
replay record.

At 100 TB this is the only workable posture: a fail-fast scan over a
billion-file lake aborts hours into the job on one truncated upload;
quarantine keeps the pipeline flowing and the damage auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _ddl_with_corrupt(schema: T.StructType) -> str:
    cols = [f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields]
    cols.append(f"`{CORRUPT_COL}` string")
    return ", ".join(cols)


def _split(parsed: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    good = (
        parsed.filter(F.col(f"rec.{CORRUPT_COL}").isNull())
        .select(*[F.col(f"rec.`{f.name}`").alias(f.name) for f in schema.fields])
    )
    bad = parsed.filter(F.col(f"rec.{CORRUPT_COL}").isNotNull()).select(
        F.col("raw_record")
    )
    return good, bad


def read_csv_quarantined(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> tuple[DataFrame, DataFrame]:
    """CSV scan with explicit schema; returns (good, quarantined).

    Good rows have every declared column parsed; rows that fail type
    coercion or shape checks land in the quarantine frame with the raw
    line preserved for replay/debugging. ``options`` are ``from_csv``
    options (``sep``, ``quote``, ...); header rows are not supported —
    production hops are headerless (the reference's shard CSVs carry the
    schema at the sink, stock_data_to_gcp.py:128-133).
    """
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    opts.update({k: str(v) for k, v in options.items()})
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_record"),
        F.from_csv(F.col("value"), _ddl_with_corrupt(schema), opts).alias("rec"),
    )
    return _split(parsed, schema)


def read_json_quarantined(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan with explicit schema; returns (good, quarantined)."""
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    opts.update({k: str(v) for k, v in options.items()})
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_record"),
        F.from_json(
            F.col("value"), f"struct<{_ddl_with_corrupt(schema)}>", opts
        ).alias("rec"),
    )
    return _split(parsed, schema)


def read_parquet_tolerant(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, list[str]]:
    """Landed-format (parquet) scan that survives corrupt files.

    CSV/JSON tolerate corruption per ROW (PERMISSIVE above); a corrupt
    parquet FILE kills the whole job under defaults
    (FAILED_READ_FILE) — one truncated upload in a 100k-file landing
    zone must not take down the batch. Strategy: footer-validate each
    file driver-side (metadata-only — reads the 8-byte magic + footer,
    never data pages), scan only the valid files with the declared
    schema, and return the quarantined PATHS for the repair workflow.

    Deliberately NOT ``spark.sql.files.ignoreCorruptFiles``: that conf
    silently drops corrupt files mid-scan with no record of WHAT was
    skipped — the silent-drop anti-pattern this module exists to
    prevent (observable quarantine, SURVEY §2 A6). The validation cost
    is one footer read per file, O(files) driver time at listing
    magnitude; for 100k+ files run the same check as a parallelized
    ``binaryFile`` pre-pass.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    candidates = sorted(
        _glob.glob(_os.path.join(path, "*.parquet"))
        if _os.path.isdir(path)
        else _glob.glob(path)
    )
    good_files, bad_files = [], []
    for f in candidates:
        try:
            _pq.read_metadata(f)
            good_files.append(f)
        except Exception:  # noqa: BLE001 — any unreadable footer quarantines
            bad_files.append(f)
    if not good_files:
        empty = spark.createDataFrame([], schema)
        return empty, bad_files
    return spark.read.schema(schema).parquet(*good_files), bad_files
