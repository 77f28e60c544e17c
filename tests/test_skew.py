"""AQE skew-join reach, measured (functions/skew.py's tool-ordering
claims): OptimizeSkewedJoin fires on the celebrity shape when real
payload bytes flow through the shuffle — and is blind to the same row
skew when the shuffled columns compress away, the documented residual
case that belongs to salting.

Mechanics pinned here (found round 10, BENCHNOTES): detection compares
COMPRESSED per-partition shuffle bytes against
``skewedPartitionThresholdInBytes`` and ``factor × median``; splitting
happens at mapper granularity; and the split must not break a downstream
partitioning requirement (a same-key groupBy right above the join
suppresses it). The thresholds here are tiny only because the fixture
is; production keeps the defaults (256 MB / 5x) where the same geometry
holds.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

_N_USERS = 400
_HOT_ROWS = 6000
_BASE_ROWS_PER_USER = 8

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture(scope="module")
def skewed_tables(spark, tmp_path_factory):
    """On-disk celebrity fact (user 0 owns ~65% of rows, incompressible
    payload, spread over 8 files so AQE has mapper granularity) + dim."""
    d = tmp_path_factory.mktemp("aqe_skew")
    base = spark.range(_N_USERS * _BASE_ROWS_PER_USER).select(
        (F.col("id") % _N_USERS).alias("user_id"), F.col("id").alias("row_id")
    )
    hot = spark.range(_HOT_ROWS).select(
        F.lit(0).cast("long").alias("user_id"),
        (F.col("id") + 10_000_000).alias("row_id"),
    )
    fact = (
        base.unionByName(hot)
        # payload the shuffle can't compress away: hash-derived doubles
        .withColumn(
            "value", (F.pmod(F.xxhash64("row_id"), F.lit(10**9)) / 1e9)
        )
        .withColumn("tag", F.sha2(F.col("row_id").cast("string"), 256))
        .repartition(8)  # >1 mapper per shuffle: splits need map granularity
    )
    fact.write.mode("overwrite").parquet(str(d / "fact.parquet"))
    spark.range(_N_USERS).select(
        F.col("id").alias("user_id"), F.lit(1).alias("flag")
    ).write.mode("overwrite").parquet(str(d / "dim.parquet"))
    return str(d / "fact.parquet"), str(d / "dim.parquet")


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join_agg(spark, fact_path, dim_path, *, payload: bool):
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    j = fact.join(dim, "user_id")
    if payload:
        # keep value/tag alive through the shuffle
        return j.agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.count("tag").alias("nt"),
        )
    # column-pruned twin: the shuffle carries ONLY user_id, and the hot
    # partition's thousands of identical longs compress to ~nothing
    return j.agg(F.count("*").alias("n"))


def test_aqe_skew_join_fires_on_celebrity_payload_and_result_is_exact(
    spark, skewed_tables, skew_confs
):
    fact_path, dim_path = skewed_tables
    j = _join_agg(spark, fact_path, dim_path, payload=True)
    row = j.collect()[0]
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    # exactness under the split: every fact row matches exactly one dim row
    assert row.n == _N_USERS * _BASE_ROWS_PER_USER + _HOT_ROWS
    assert row.nt == row.n


def test_aqe_skew_detection_is_blind_to_compressed_key_only_shuffles(
    spark, skewed_tables, skew_confs
):
    """Same rows, same hot key, same thresholds — but the aggregate lets
    Catalyst prune the shuffle to bare user_id, whose hot partition
    compresses under the byte threshold: no split. This is the measured
    residual row-skew case the salting docstring routes to salted_join."""
    fact_path, dim_path = skewed_tables
    j = _join_agg(spark, fact_path, dim_path, payload=False)
    row = j.collect()[0]
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan
    assert row.n == _N_USERS * _BASE_ROWS_PER_USER + _HOT_ROWS
