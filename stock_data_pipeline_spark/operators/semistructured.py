"""Tier C semi-structured operators (SURVEY.md §2 C6 JSON, C7 arrays).

The reference's schemas are flat scalars only (§1.2); the driver's ``events.
props`` (JSON string) and ``embeddings.embedding`` (array<float>) extend the
data model to nested types, handled entirely with built-in JVM functions —
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import query


@query(
    "c06_json_extract",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def c06_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: JSON path extraction + typed aggregation over ``events.props``.

    ``from_json`` with an explicit schema (not schema inference, not
    ``get_json_object`` string-plucking) parses once per row inside
    codegen; integer sums are exact so no decimal dance is needed.
    Scale: JSON parse is per-row CPU, no shuffle added; the aggregate is
    the usual map-side-combined hash agg.
    """
    events = load(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.LongType())])
    k = F.from_json("props", props_schema).getField("k")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").alias("max_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
    )


@query(
    "c07_array_funcs",
    oracle="""
    SELECT
      vec_id,
      label,
      CAST(len(embedding) AS INT) AS dim,
      round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
      round(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
      CAST(list_max(embedding) AS DOUBLE) AS vec_max,
      CAST(list_min(embedding) AS DOUBLE) AS vec_min,
      CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def c07_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: higher-order array functions over the embedding vectors.

    ``transform`` / ``filter`` / ``aggregate`` are JVM higher-order
    functions — the whole per-vector reduction runs inside codegen with
    zero Python. This is the building block the similarity operators
    (operators/similarity.py) reuse. Scale: embarrassingly parallel, no
    shuffle.
    """
    emb = load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    zero = F.lit(0.0)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.aggregate(as_double, zero, lambda a, x: a + x), 6).alias("vec_sum"),
        F.round(F.sqrt(F.aggregate(sq, zero, lambda a, x: a + x)), 6).alias("l2_norm"),
        F.array_max("embedding").cast("double").alias("vec_max"),
        F.array_min("embedding").cast("double").alias("vec_min"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_positive"),
    )
