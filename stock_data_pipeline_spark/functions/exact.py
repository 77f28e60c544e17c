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
    """Order-independent SUM: decimal-exact accumulation, DOUBLE result."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG = exact decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    """DuckDB oracle spelling of :func:`dec_sum` (identical semantics)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


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
