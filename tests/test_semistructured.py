"""Semi-structured surface (C6 JSON / C7 array+map) beyond oracle parity:
schema inference, accessor equivalence, map-algebra behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load


def test_schema_of_json_infers_props_shape(spark):
    """C6: schema_of_json — DDL inference from a sample document (the
    exploration step before committing a typed from_json schema)."""
    ddl = spark.range(1).select(
        F.schema_of_json(F.lit('{"k": 42}')).alias("ddl")
    ).first().ddl
    assert "k" in ddl and "BIGINT" in ddl.upper()
    # the inferred schema round-trips: from_json with it parses the sample
    parsed = (
        spark.createDataFrame([('{"k": 42}',)], "props string")
        .select(F.from_json("props", ddl).getField("k").alias("k"))
        .first()
    )
    assert parsed.k == 42


def test_get_json_object_equals_typed_from_json(spark, sf_dir):
    """The string-plucking accessor and the typed parse must agree on
    every row of the real events table."""
    events = load(spark, sf_dir, "events")
    mismatch = events.select(
        F.from_json("props", "k BIGINT").getField("k").alias("typed"),
        F.get_json_object("props", "$.k").cast("bigint").alias("plucked"),
    ).filter(~F.col("typed").eqNullSafe(F.col("plucked")))
    assert mismatch.count() == 0


def test_json_object_keys_on_events(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    distinct_keys = (
        events.select(F.explode(F.json_object_keys("props")).alias("key"))
        .distinct()
        .collect()
    )
    assert {r.key for r in distinct_keys} == {"k"}


def test_variant_typed_extraction_and_inference(spark):
    """C6b: VariantType behavior beyond the oracle — schema_of_variant
    infers the shredded shape, variant_get enforces the requested type
    (cast failure -> error, try_variant_get -> null), and to_json
    round-trips the document."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [('{"k": 7, "tag": "x"}',)], "props string"
    ).select(F.parse_json("props").alias("v"))
    row = df.select(
        F.schema_of_variant("v").alias("ddl"),
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.variant_get("v", "$.tag", "string").alias("tag"),
        F.try_variant_get("v", "$.tag", "bigint").alias("tag_as_int"),
        F.to_json("v").alias("round_trip"),
    ).first()
    assert "k" in row.ddl and "BIGINT" in row.ddl.upper()
    assert (row.k, row.tag) == (7, "x")
    assert row.tag_as_int is None  # safe accessor: bad cast -> null
    assert '"k":7' in row.round_trip.replace(" ", "")
    with pytest.raises(SparkRuntimeException):  # strict accessor raises
        df.select(F.variant_get("v", "$.tag", "bigint")).first()


def test_variant_extraction_equals_string_accessors(spark, sf_dir):
    """parse_json+variant_get must agree with get_json_object on every
    row of the real events table (same contract the oracle checks in
    aggregate, asserted here row-level)."""
    events = load(spark, sf_dir, "events")
    mismatch = events.select(
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("shredded"),
        F.get_json_object("props", "$.k").cast("bigint").alias("plucked"),
    ).filter(~F.col("shredded").eqNullSafe(F.col("plucked")))
    assert mismatch.count() == 0


def test_map_funcs_algebra_on_crafted_rows(spark):
    """map_from_entries → map_concat → map_filter → transform_values on
    hand-picked values where every branch (kept / dropped / overwritten)
    is exercised."""
    from stock_data_pipeline_spark.registry import get  # noqa: F401

    df = spark.createDataFrame(
        [(1, 3.0), (2, -2.0), (3, 0.0)], "event_id long, value double"
    )
    v = F.col("value")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("neg").alias("key"), (-v).alias("val")),
            F.struct(F.lit("value").alias("key"), v.alias("val")),
        )
    )
    out = {
        r.event_id: (r.n, r.keys_csv, r.value_x2)
        for r in df.select(
            "event_id",
            F.size(
                F.map_filter(
                    F.map_concat(m, F.create_map(F.lit("unit"), F.lit(1.0))),
                    lambda k, val: val > 0,
                )
            ).alias("n"),
            F.array_join(
                F.array_sort(
                    F.map_keys(F.map_filter(m, lambda k, val: val > 0))
                ),
                ",",
            ).alias("keys_csv"),
            F.element_at(
                F.transform_values(
                    F.map_filter(m, lambda k, val: val > 0),
                    lambda k, val: val * 2.0,
                ),
                "value",
            ).alias("value_x2"),
        ).collect()
    }
    assert out[1] == (2, "value", 6.0)  # value kept, neg dropped
    assert out[2] == (2, "neg", None)  # neg kept, value dropped
    assert out[3] == (1, "", None)  # both zero → only unit survives


def test_map_concat_duplicate_key_policy(spark):
    """Duplicate keys across map_concat inputs: the engine default
    (EXCEPTION) refuses silently-ambiguous data; LAST_WIN opt-in resolves
    to the right-most value. c07_map_funcs relies on key-disjoint inputs,
    so neither path triggers there."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    dup = F.element_at(
        F.map_concat(
            F.create_map(F.lit("k"), F.lit(1.0)),
            F.create_map(F.lit("k"), F.lit(2.0)),
        ),
        "k",
    ).alias("v")
    with pytest.raises(SparkRuntimeException, match="DUPLICATED_MAP_KEY"):
        spark.range(1).select(dup).first()
    old = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try:
        assert spark.range(1).select(dup).first().v == 2.0
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", old)


def test_parse_news_dom_extracts_headlines(spark):
    """A13 declarative twin: from_xml DOM parse fans one page-snippet row
    out to one row per headline, all JVM-side."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.operators.semistructured import parse_news_dom

    pages = [
        ("AAPL",
         '<ul><li><a href="http://n/a1">AAPL beats</a></li>'
         '<li><a href="http://n/a2">AAPL guides up</a></li></ul>'),
        ("MSFT", '<ul><li><a href="http://n/m1">MSFT ships</a></li></ul>'),
        ("EMPT", "<ul></ul>"),
    ]
    df = spark.createDataFrame(pages, "symbol string, html string")
    out = (
        df.select("symbol", F.explode(parse_news_dom("html")).alias("h"))
        .select("symbol", F.col("h.href").alias("href"), F.col("h.title").alias("title"))
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        ("AAPL", "http://n/a1", "AAPL beats"),
        ("AAPL", "http://n/a2", "AAPL guides up"),
        ("MSFT", "http://n/m1", "MSFT ships"),
    ]
    # zero Python in the extraction plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_parse_news_dom_malformed_rows_null_not_crash(spark):
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.operators.semistructured import parse_news_dom

    df = spark.createDataFrame(
        [("ok", '<ul><li><a href="u">t</a></li></ul>'), ("bad", "<ul><li>no close")],
        "tag string, html string",
    )
    out = df.select("tag", parse_news_dom("html").alias("hs")).collect()
    got = {r.tag: r.hs for r in out}
    assert got["ok"] and got["ok"][0].title == "t"
    assert got["bad"] is None or got["bad"] == []
