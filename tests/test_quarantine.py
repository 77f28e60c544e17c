"""Scan-level quarantine (A6 at the source boundary): bad records are
routed, counted, and replayable — never silently dropped, never fatal."""

from __future__ import annotations

from pyspark.sql import types as T

from stock_data_pipeline_spark.sources.quarantine import (
    read_csv_quarantined,
    read_json_quarantined,
)

TICKER_SCHEMA = T.StructType(
    [
        T.StructField("Ticker", T.StringType()),
        T.StructField("Price", T.DoubleType()),
        T.StructField("Volume", T.DoubleType()),
    ]
)


def test_csv_quarantine_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "ticks.csv"
    p.write_text(
        "AAPL,187.5,1000000\n"
        "MSFT,not_a_price,2000000\n"  # type failure → quarantine
        "GOOG,140.25,1500000\n"
    )
    good, bad = read_csv_quarantined(spark, str(p), TICKER_SCHEMA)
    good_rows = {r.Ticker: r.Price for r in good.collect()}
    assert good_rows == {"AAPL": 187.5, "GOOG": 140.25}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not_a_price" in bad_rows[0].raw_record  # raw line replayable


def test_json_quarantine_preserves_malformed_lines(spark, tmp_path):
    p = tmp_path / "ticks.jsonl"
    p.write_text(
        '{"Ticker": "AAPL", "Price": 187.5, "Volume": 1e6}\n'
        "{this is not json}\n"
        '{"Ticker": "MSFT", "Price": 402.1, "Volume": 2e6}\n'
    )
    good, bad = read_json_quarantined(spark, str(p), TICKER_SCHEMA)
    assert good.count() == 2
    assert bad.count() == 1
    assert "not json" in bad.collect()[0].raw_record


def test_quarantine_batch_never_fails_whole_scan(spark, tmp_path):
    """An all-bad file still yields an empty good frame, not an exception —
    the reference's one defensible semantic (batch survives bad rows)."""
    p = tmp_path / "garbage.csv"
    p.write_text("x,y\noops,entirely\n,broken,extra,cols\n")
    good, bad = read_csv_quarantined(spark, str(p), TICKER_SCHEMA)
    assert good.count() + bad.count() == 3
    assert all(r.Price is None or isinstance(r.Price, float) for r in good.collect())


def test_corrupt_parquet_file_skipped_not_fatal(spark, tmp_path):
    """A truncated/garbage parquet file inside a scan directory must not
    kill the batch when ignoreCorruptFiles is on — at 100 TB one bad
    object is a certainty, and the default fail-fast is the right
    debugging posture but the wrong production one. Both modes checked."""
    import pytest
    from py4j.protocol import Py4JJavaError

    sink = tmp_path / "scan"
    sink.mkdir()
    spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(str(sink))
    (sink / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    # default: fail fast (and loudly)
    with pytest.raises(Exception):
        spark.read.parquet(str(sink)).count()

    out = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(str(sink)).count()
    )
    assert out == 100


def test_parquet_tolerant_scan_quarantines_corrupt_files(spark, tmp_path):
    """A truncated/garbage parquet file must be quarantined BY PATH while
    every valid file's rows survive — and the default reader must indeed
    die on the same input (the failure mode the tolerant scan exists for)."""
    from stock_data_pipeline_spark.sources.quarantine import (
        read_parquet_tolerant,
    )

    land = tmp_path / "landing"
    land.mkdir()
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.coalesce(1).write.parquet(str(tmp_path / "ok1"))
    df.selectExpr("id + 100 AS id", "id AS v").coalesce(1).write.parquet(
        str(tmp_path / "ok2")
    )
    import glob
    import shutil as sh

    for i, d in enumerate(["ok1", "ok2"]):
        sh.copy(
            glob.glob(str(tmp_path / d / "*.parquet"))[0],
            land / f"part{i}.parquet",
        )
    # a truncated upload: valid magic, garbage after
    (land / "part2.parquet").write_bytes(b"PAR1" + b"\x00" * 64)

    schema = spark.range(1).selectExpr("id", "id AS v").schema
    # default reader dies on the corrupt file
    import pytest as _pytest

    with _pytest.raises(Exception, match="PARQUET|FAILED_READ|magic|footer"):
        spark.read.schema(schema).parquet(str(land)).count()

    good, bad = read_parquet_tolerant(spark, str(land), schema)
    assert [b.split("/")[-1] for b in bad] == ["part2.parquet"]
    assert good.count() == 200
    assert good.agg({"id": "max"}).first()[0] == 199
