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
