"""Source/sink format breadth: declared-schema roundtrips for every format
the engine supports as an export/landing hop (parquet is the canonical lake
format; CSV mirrors the reference's shard hops,
/root/reference/dags/stock_data_to_gcp.py:51,62; JSON-lines and ORC are the
other lake-standard hops), plus the binaryFile source for real media
payloads (SURVEY.md §2 C5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.schemas import TICKER_DATA


def _ticker_rows(spark):
    return spark.createDataFrame(
        [
            ("2024-01-02 09:30:00", "AAPL", 187.5, 1_000_000.0),
            ("2024-01-02 09:30:00", "MSFT", 402.1, None),
            ("2024-01-02 09:32:00", "GOOG", None, 1_500_000.0),
        ],
        "Time string, Ticker string, Price double, Volume double",
    ).select(
        F.col("Time").cast("timestamp_ntz").alias("Time"),
        "Ticker", "Price", "Volume",
    )


def _assert_roundtrip(df, back):
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_lines_roundtrip_with_declared_schema(spark, tmp_path):
    df = _ticker_rows(spark)
    path = str(tmp_path / "ticks_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(df.schema).json(path)
    _assert_roundtrip(df, back)


def test_orc_roundtrip_with_declared_schema(spark, tmp_path):
    df = _ticker_rows(spark)
    path = str(tmp_path / "ticks_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.schema(df.schema).orc(path)
    _assert_roundtrip(df, back)


def test_schemas_match_reference_declaration(spark):
    # the four reference schema_fields lists are mirrored in schemas.py;
    # spot-check the ticker one end-to-end through a format hop
    assert [f.name for f in TICKER_DATA.fields] == [
        "Time", "Ticker", "Price", "Volume",
    ]


def test_binary_file_source_feeds_feature_extraction(spark, tmp_path):
    """The real media-lake path: payload FILES on disk → binaryFile source
    → Arrow-batched feature extraction (same mapInPandas contract as the
    documents-derived payloads)."""
    import hashlib

    from stock_data_pipeline_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        _byte_features,
    )

    media = tmp_path / "media"; media.mkdir()
    payloads = {0: b"fake-jpeg-bytes-000", 1: b"x" * 1024, 2: b"z"}
    for i, b in payloads.items():
        (media / f"{i:04d}.bin").write_bytes(b)

    files = (
        spark.read.format("binaryFile")
        .load(str(media))
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    feats = {r.doc_id: r for r in files.mapInPandas(_byte_features, FEATURE_SCHEMA).collect()}
    for i, b in payloads.items():
        assert feats[i].n_bytes == len(b)
        assert feats[i].payload_sha256 == hashlib.sha256(b).hexdigest()


def test_xml_file_source_roundtrip_with_declared_schema(spark, tmp_path):
    """Spark 4's native XML file source: write the ticker rows as XML,
    read them back under the declared schema — the file-level
    counterpart of the landed-HTML fragment parsing in
    sources/landed.py (from_xml handles embedded fragments; this is the
    whole-document landing format, e.g. vendor XML feeds). NULL
    elements must survive the hop (the reference's nullable quote
    fields)."""
    df = _ticker_rows(spark)
    path = str(tmp_path / "ticks_xml")
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "quotes")
        .option("rowTag", "quote")
        .save(path)
    )
    back = (
        spark.read.schema(df.schema)
        .format("xml")
        .option("rowTag", "quote")
        .load(path)
    )
    _assert_roundtrip(df, back)


def test_avro_is_absent_and_fails_loudly(spark, tmp_path):
    """Avro is an EXTERNAL Spark module (spark-avro jar), not deployed in
    this container: the engine takes no Avro dependency, and an
    accidental .format('avro') must fail with the deploy-the-module
    error, never write something else silently. MIGRATION.md's format
    list stays honest because this pins the actual support matrix."""
    import pytest

    with pytest.raises(Exception, match="[Aa]vro"):
        _ticker_rows(spark).write.mode("overwrite").format("avro").save(
            str(tmp_path / "ticks_avro")
        )
