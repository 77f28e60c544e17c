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

    Implementation (round 7, the limb decomposition): round each value to
    ``scale`` decimal places as a scaled BIGINT — ``floor(x·10ˢ + 0.5)``
    — then accumulate its two 16-bit-split limbs ``x >> 16`` and
    ``x & 0xFFFF`` as TWO plain BIGINT sums, recombining once per group in
    DECIMAL(38,0): ``hi·2¹⁶ + lo``. Both limb sums stay inside
    whole-stage codegen's primitive-long hash-aggregate path (no
    BigDecimal anywhere per row), which halves the Q1-shape aggregate
    cost vs the previous ``SUM(DECIMAL(18,0))`` spelling (min-of-6 at
    sf0.1: 0.197 s vs 0.395 s; the raw-BIGINT spelling's 0.189 s was
    rejected for overflow, see below). Integer accumulation stays exact
    and associative, so the result is bit-identical under ANY
    partitioning/summation order, and every op is spelled identically in
    the DuckDB oracle (:func:`sql_dec_sum`) — HUGEINT recombination
    there, DECIMAL(38,0) here, both exact, both casting one exact
    integer to DOUBLE (correctly rounded on both engines).

    Overflow analysis at the 100 TB design point (~1.75e11 rows per Q1
    group at 1e4 scaling, values ≤ ~1e10 scaled): the lo-limb sum is
    bounded by n·65535 → overflows past n ≈ 1.4e14 rows/group; the
    hi-limb by n·(max/2¹⁶) ≈ n·1.5e5 → n ≈ 6e13. That is ~300× design
    headroom — versus the single-BIGINT sum's 6× (n·1e10 → wraparound at
    one order of magnitude of growth, the round-5 rejection). Negative
    inputs are safe: ``>>``/``&`` are arithmetic-shift/two's-complement
    in BOTH engines (verified: −70001 → (−2, 61071) on each), so
    hi·2¹⁶ + lo ≡ x for all signs.

    Rounding semantics: ``floor(x·10ˢ + 0.5)`` rounds ties toward
    +infinity, which differs from DECIMAL's HALF_UP (away from zero) for
    NEGATIVE values at the .xx5 boundary (-2.005 → -2.00 here, -2.01
    under HALF_UP). Fine for sums of measured quantities (and all current
    call sites are non-negative); if away-from-zero tie-breaking matters,
    use ``floor(abs(x)·m + 0.5)·sign(x)`` on both engines instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    x = F.floor(c * F.lit(m) + F.lit(0.5)).cast("long")
    hi = F.sum(F.shiftright(x, 16))
    lo = F.sum(x.bitwiseAND(F.lit(65535)))
    return (
        (hi.cast("decimal(38,0)") * F.lit(65536) + lo).cast("double")
        / F.lit(m)
    )


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG = exact fixed-point sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    """SQL spelling of :func:`dec_sum` — identical semantics, and valid
    in BOTH dialects (b24_sql_api runs the same text on Spark and
    DuckDB, so HUGEINT is out): the same 16-bit limb split, recombined
    in DECIMAL(38,0), which both engines carry exactly through the
    ·65536 multiply-add (verified equal to the Column spelling on the
    fixture revenue sum)."""
    m = float(10**scale)
    xi = f"CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)"
    return (
        f"(CAST(CAST(SUM(({xi}) >> 16) AS DECIMAL(38,0)) * 65536 "
        f"+ CAST(SUM(({xi}) & 65535) AS DECIMAL(38,0)) AS DOUBLE) / {m})"
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
