"""Distributed Bloom filter, pure DataFrame expressions end to end.

This PySpark build exposes neither ``bloom_filter_agg`` (internal to the
runtime-filter optimizer) nor ``DataFrameStatFunctions.bloomFilter``, so
the engine carries its own — and the DataFrame formulation is arguably
nicer than either:

- BUILD: every key emits its k bit positions (k seeded ``xxhash64``
  expressions — no Python, no sampling), positions explode to
  (word, mask) pairs, and one ``bit_or`` aggregate ORs the masks per
  64-bit word. The shuffle carries at most m/64 rows; the collected
  filter is m/8 bytes on the driver (1.2 MB for 1M keys at 10 bits/key).
- PROBE: the word array rides a 1-row broadcast; membership is k
  ``element_at`` + shift/mask tests in WholeStageCodegen. No Python
  anywhere, so probing is a map-side expression at any scale.

Properties: deterministic (seeded hashes, no RNG), standard fpp
(~0.0082 at 10 bits/key with k=5), and — because callers verify
suspects with an exact join — false positives only cost shuffle bytes,
never correctness. For reference sets so large the bitset outgrows a
broadcast (≫10⁹ keys), shard the build by key range and probe each
shard's slice; the per-shard shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_K = 5  # hash functions; with m = 10n bits this sits near the fpp optimum


def _bit_positions(col: Column, m_bits: int) -> list[Column]:
    """k independent bit positions for a key column (seeded xxhash64)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
        for seed in range(_K)
    ]


def bloom_build(df: DataFrame, col: str, *, bits_per_key: int = 10) -> tuple[list[int], int]:
    """Build the filter over ``df[col]``; returns (words, m_bits).

    ``words`` is the m/64-long list of 64-bit words — the only
    driver-resident artifact, sized by the KEY COUNT, not the data.
    """
    n = df.count()
    m_bits = max(64, n * bits_per_key)
    m_bits += (-m_bits) % 64  # whole words
    pos = F.explode(F.array(*_bit_positions(F.col(col), m_bits))).alias("pos")
    packed = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in packed:
        words[r.word_idx] = r.word
    return words, m_bits


def with_bloom_probe(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    *,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Adds ``out_col``: true iff ``df[col]`` may be in the filter.

    The word array joins as a 1-row broadcast (never a literal — a
    15k-element literal array bloats every task's plan); the k membership
    tests are codegen arithmetic.
    """
    from functools import reduce

    spark = df.sparkSession
    bits = spark.createDataFrame(
        [([int(w) for w in words],)], "bf_words array<bigint>"
    )
    probed = df.crossJoin(F.broadcast(bits))
    conds = []
    for i, p in enumerate(_bit_positions(F.col(col), m_bits)):
        probed = probed.withColumn(f"_bfp{i}", p)
        # SQL shiftrightunsigned takes COLUMN shift amounts (the PySpark
        # wrapper artificially restricts to int literals)
        conds.append(
            F.expr(
                f"(shiftrightunsigned("
                f"element_at(bf_words, CAST(_bfp{i} DIV 64 AS INT) + 1), "
                f"CAST(_bfp{i} % 64 AS INT)) & 1) = 1"
            )
        )
    out = probed.withColumn(out_col, reduce(lambda a, b: a & b, conds))
    return out.drop("bf_words", *[f"_bfp{i}" for i in range(_K)])


# --------------------------------------------------------------------------
# Sharded form: reference sets whose single bitset outgrows a broadcast
# --------------------------------------------------------------------------
_SHARD_SEED = 999


def _shard_of(col: Column, n_shards: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(_SHARD_SEED)), F.lit(n_shards))


def bloom_build_sharded(
    df: DataFrame, col: str, *, n_shards: int = 16, bits_per_key: int = 10
) -> tuple[DataFrame, int]:
    """Partitioned Bloom: one filter per key-hash shard, kept as a TABLE
    of (shard, words map<word_idx → word>) rows instead of a driver
    artifact — the ≫10⁹-key regime where m/8 bytes no longer broadcasts.
    Returns (bloom_table, m_bits) with m sized per shard.

    Sparse map rather than dense array: a shard's occupied words
    assemble with ``map_from_entries(collect_list(...))`` in one
    aggregate — no driver-side zero-filling, and absent words are simply
    absent (probe coalesces to 0).
    """
    n = df.count()
    m_bits = max(64, (n // n_shards + 1) * bits_per_key)
    m_bits += (-m_bits) % 64
    key = F.col(col)
    pos = F.explode(F.array(*_bit_positions(key, m_bits))).alias("pos")
    table = (
        df.select(_shard_of(key, n_shards).alias("shard"), pos)
        .select(
            "shard",
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("shard", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .groupBy("shard")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word_idx", "word"))
            ).alias("bf_map")
        )
    )
    return table, m_bits


def with_sharded_bloom_probe(
    df: DataFrame,
    col: str,
    bloom_table: DataFrame,
    m_bits: int,
    *,
    n_shards: int = 16,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Probe against the sharded filter: an equi-join on the key's shard
    (broadcast while the table fits, shuffle-join co-keyed beyond that —
    Catalyst/AQE decide from stats) plus the same k codegen bit tests,
    reading words through the shard's sparse map. A key whose shard row
    is missing (empty shard) is definitively absent."""
    from functools import reduce

    key = F.col(col)
    probed = df.withColumn("_bfshard", _shard_of(key, n_shards)).join(
        bloom_table.withColumnRenamed("shard", "_bfshard"),
        "_bfshard",
        "left",
    )
    conds = []
    for i, p in enumerate(_bit_positions(key, m_bits)):
        probed = probed.withColumn(f"_bfp{i}", p)
        conds.append(
            F.expr(
                f"(shiftrightunsigned("
                f"coalesce(element_at(bf_map, CAST(_bfp{i} DIV 64 AS LONG)), 0L), "
                f"CAST(_bfp{i} % 64 AS INT)) & 1) = 1"
            )
        )
    out = probed.withColumn(
        out_col,
        F.col("bf_map").isNotNull() & reduce(lambda a, b: a & b, conds),
    )
    return out.drop("bf_map", "_bfshard", *[f"_bfp{i}" for i in range(_K)])
