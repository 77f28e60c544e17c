"""collect_pdf streamed-collect equivalence (round 12, VERDICT r11 task 7).

The fuzz harness's compare path hashes the full Spark result; through
r11 that was one ``toPandas()`` collect, whose JVM-side materialization
OOM'd the default-1g fuzz JVM at sf1 (~6M rows). ``collect_pdf`` under
``FUZZ_STREAM_COLLECT=1`` streams one partition at a time through
``toLocalIterator`` and converts via a single Arrow-level concat.

The hash compare is only sound if the streamed path reproduces
``toPandas``'s dtype mapping EXACTLY — '2' vs '2.0' is a driver-hash
mismatch. Pinned here over every dtype class the fuzz shapes emit:
bigint, nullable bigint (→float64), double, string, timestamp_ntz,
decimal, boolean — plus chunk-boundary behavior (chunk smaller than the
result) and the empty result.
"""

from __future__ import annotations

import pandas as pd
import pytest

from .oracle import _driver_hash, _streamed_pdf, collect_pdf, normalize

_SF = "/root/testdata/sf0.01"

# One query per dtype class the fuzz shapes can emit. Nullable-int is the
# treacherous one: Arrow int64-with-nulls converts to float64 — per-chunk
# conversion would give int64 for null-free chunks and float64 for the
# rest; the Arrow-level concat-then-convert-once in _streamed_pdf is what
# keeps the global dtype identical to toPandas.
_QUERIES = [
    (
        "scalar mix",
        """SELECT l_orderkey, l_linenumber,
                  CAST(l_quantity AS DOUBLE) AS qty,
                  l_returnflag,
                  CAST(l_shipdate AS TIMESTAMP) AS ship_ts,
                  CAST(l_extendedprice AS DECIMAL(18,2)) AS price_dec,
                  l_quantity > 25 AS big
           FROM lineitem LIMIT 5000""",
    ),
    (
        "nullable bigint",
        """SELECT l_orderkey,
                  CASE WHEN l_linenumber > 3 THEN NULL
                       ELSE l_linenumber END AS maybe_ln
           FROM lineitem LIMIT 5000""",
    ),
    (
        "all-null column",
        "SELECT l_orderkey, CAST(NULL AS BIGINT) AS always_null "
        "FROM lineitem LIMIT 100",
    ),
    ("empty result", "SELECT l_orderkey, l_returnflag FROM lineitem WHERE 1=0"),
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    from stock_data_pipeline_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, _SF, t).createOrReplaceTempView(t)


@pytest.mark.parametrize("label,sql", _QUERIES, ids=[q[0] for q in _QUERIES])
def test_streamed_collect_hashes_like_topandas(spark, label, sql):
    df = spark.sql(sql)
    via_topandas = normalize(df.toPandas())
    via_stream = normalize(_streamed_pdf(df))
    assert list(via_stream.columns) == list(via_topandas.columns)
    assert [str(d) for d in via_stream.dtypes] == [
        str(d) for d in via_topandas.dtypes
    ], f"{label}: dtype drift would silently break the driver hash"
    assert _driver_hash(via_stream) == _driver_hash(via_topandas), label


def test_chunk_boundary_does_not_change_the_hash(spark):
    df = spark.sql(
        "SELECT l_orderkey, l_partkey, CAST(l_shipdate AS TIMESTAMP) AS ts "
        "FROM lineitem LIMIT 5000"
    )
    whole = normalize(_streamed_pdf(df, rows_per_chunk=1_000_000))
    chunked = normalize(_streamed_pdf(df, rows_per_chunk=137))
    assert _driver_hash(whole) == _driver_hash(chunked)


def test_collect_pdf_env_switch(spark, monkeypatch):
    df = spark.sql("SELECT l_orderkey FROM lineitem LIMIT 10")
    monkeypatch.delenv("FUZZ_STREAM_COLLECT", raising=False)
    default_path = collect_pdf(df)
    monkeypatch.setenv("FUZZ_STREAM_COLLECT", "1")
    streamed_path = collect_pdf(df)
    assert _driver_hash(normalize(default_path)) == _driver_hash(
        normalize(streamed_path)
    )
