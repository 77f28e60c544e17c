"""Z-order clustered file layout: multi-column data skipping at scan time.

Parquet readers prune whole row groups whose column min/max statistics
cannot satisfy the pushed-down predicate. Sorting by ONE column makes its
stats tight but leaves every other column's ranges wide; interleaving the
bits of two columns (a Z-order / Morton curve) makes BOTH columns' ranges
narrow per file, so range predicates on either column (or both) skip most
of the table. This is the layout move behind Delta/Iceberg ``OPTIMIZE
ZORDER BY`` — here expressed with plain Spark: compute the Morton value as
a codegen'd column expression, range-partition + sort by it, write plain
parquet. No format extension, no index files; the "index" is the parquet
footer stats the layout makes selective.

The reference's analog: its append-only tables are written in arrival
order (/root/reference/dags/stock_data_to_gcp.py:134), so every BigQuery
query pays a full scan — clustering is exactly what its dashboard-latency
roadmap item needs.

Verified in tests/test_layout.py by reading footers back with pyarrow:
under the same two-column range predicate, the Z-ordered layout leaves a
small fraction of row groups eligible while the arrival-order layout
leaves nearly all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # 2 × 16 interleaved bits → Morton values < 2^32 (exact in i64)


def z_value(a: Column, b: Column, *, bits: int = Z_BITS) -> Column:
    """Morton (Z-curve) interleave of the low ``bits`` bits of two
    non-negative integer columns: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1.

    Built as a flat sum of shift/mask terms — a single codegen'd
    expression, no UDF, no shuffle. Inputs are masked to ``bits`` bits so
    outliers wrap instead of overflowing (callers should pre-scale real
    domains, e.g. days-since-epoch, onto [0, 2^bits)).
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        z = z + bit_a * F.lit(1 << (2 * i)) + bit_b * F.lit(1 << (2 * i + 1))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    col_a: str,
    col_b: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as plain parquet clustered on the Z-curve of
    (``col_a``, ``col_b``).

    ``repartitionByRange`` on the Morton value gives each output file a
    contiguous Z-range (sampled range partitioner → balanced files at any
    scale); the within-partition sort tightens row-group stats inside
    each file. One extra exchange at write time buys stats-based pruning
    on every subsequent read — the classic write-once/scan-many trade.
    """
    (
        df.withColumn("_z", z_value(F.col(col_a), F.col(col_b)))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
