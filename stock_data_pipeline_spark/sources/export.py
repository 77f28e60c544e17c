"""Sharded JSONL corpus export — the training-data delivery format.

LLM data pipelines hand corpora downstream as fixed-count JSONL shards
with a manifest of per-shard statistics (the webdataset / tfrecord-shard
convention, minus the container format). This module produces both from
one corpus scan:

- documents are assigned to shards by an engine-independent content hash
  (same md5-bucket primitive as the split/sample operators in
  operators/sampling.py), so shard membership is stable across reruns,
  partitionings, and engines — a re-export after an upstream fix moves
  only the documents that actually changed;
- each shard writes as exactly one ``part-*.json`` file of
  ``{"doc_id":...,"text":...}`` lines via Spark's native JSON writer
  (JVM-side serialization, one file per final partition);
- the manifest (one parquet row per shard: n_docs, n_tokens, n_chars)
  aggregates from the SAME assignment column, so it is consistent with
  the files by construction, not by re-reading them.

Scale: one shuffle, keyed by shard — ``repartition(n_shards, shard)``
is also exactly the file-count control (no coalesce games); the manifest
aggregate is map-side partial over the already-sharded data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import tokens

SHARD_COL = "_shard"

# One shard-count constant shared by the JSONL export layout and the
# interleaved-read-order query (operators/sampling.py c09_interleave_order):
# same md5 hash + same modulus means a shard id computed by the reader
# corresponds 1:1 to an exported shard directory.
DEFAULT_N_SHARDS = 8


def with_shard(docs: DataFrame, *, n_shards: int) -> DataFrame:
    """Stable shard id in [0, n_shards): the CANONICAL md5 bucket
    (functions/partitioning.py) salted 'shard:' — the interleaved-read
    query computes shard ids with the same helper, so reader shards
    correspond 1:1 to exported shard directories by construction, not
    by two inline spellings happening to match."""
    from ..functions.partitioning import hash_bucket

    return docs.withColumn(
        SHARD_COL, hash_bucket("doc_id", salt="shard:", mod=n_shards).cast("int")
    )


def export_jsonl_shards(
    docs: DataFrame, path: str, *, n_shards: int = DEFAULT_N_SHARDS
) -> DataFrame:
    """Write ``docs`` as ``{path}/shards/`` JSONL (one file per shard,
    ``_shard`` as the partition directory) plus ``{path}/manifest``
    parquet. Returns the manifest DataFrame."""
    sharded = with_shard(docs, n_shards=n_shards)
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .json(f"{path}/shards")
    )
    manifest = (
        sharded.groupBy(F.col(SHARD_COL).alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
    )
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")
    return manifest
