"""Sharded JSONL export: stable assignment, lossless roundtrip,
manifest consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.sources.export import (
    SHARD_COL,
    export_jsonl_shards,
    with_shard,
)

N_SHARDS = 4


def test_export_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    manifest = export_jsonl_shards(docs, str(tmp_path / "out"), n_shards=N_SHARDS)

    back = spark.read.json(str(tmp_path / "out" / "shards"))
    assert back.count() == docs.count()
    # lossless text roundtrip through the JSON writer
    orig = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == orig

    m = {r.shard: (r.n_docs, r.n_tokens) for r in manifest.collect()}
    assert sum(n for n, _ in m.values()) == docs.count()
    # manifest counts equal what the files actually contain, per shard
    per_file = {
        r[SHARD_COL]: r.n
        for r in back.groupBy(SHARD_COL).agg(F.count("*").alias("n")).collect()
    }
    assert {s: n for s, (n, _) in m.items()} == per_file

    # one data file per shard (file-count control == shard count)
    shard_dirs = [
        p for p in (tmp_path / "out" / "shards").iterdir()
        if p.name.startswith(f"{SHARD_COL}=")
    ]
    assert len(shard_dirs) == N_SHARDS
    for d in shard_dirs:
        parts = [p for p in d.iterdir() if p.name.startswith("part-")]
        assert len(parts) == 1, d


def test_shard_assignment_is_stable_and_partition_invariant(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    a = {r.doc_id: r[SHARD_COL] for r in with_shard(docs, n_shards=N_SHARDS).collect()}
    b = {
        r.doc_id: r[SHARD_COL]
        for r in with_shard(docs.repartition(13), n_shards=N_SHARDS).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(N_SHARDS))
