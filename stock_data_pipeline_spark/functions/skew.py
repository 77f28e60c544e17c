"""Skew mitigation: salted joins for hot keys.

At 100 TB a handful of hot keys (the reference's analog: one ticker with
100× the ticks) put an entire shuffle partition on one task. Three tools,
in preference order:

1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on by default
   in session.py) — splits oversized partitions at runtime; use it and do
   nothing. Two measured reach limits (round 10, BENCHNOTES): it splits
   at MAPPER granularity, so a shuffle with one effective mapper cannot
   be split (a non-issue at 100 TB where every shuffle has thousands of
   mappers); and it detects skew from COMPRESSED per-partition shuffle
   bytes, so a hot key whose shuffled columns compress away (a key-only
   shuffle: thousands of identical ids → a few hundred bytes) is
   invisible to it — acceptable when cost is byte-driven, but
   row-count-driven costs (sort CPU, per-row UDFs) still pile on one
   task; that residual row-skew case belongs to salting. With real
   payload bytes flowing, `SortMergeJoin(skew=true)` fires on exactly
   the celebrity shape this module models, with output equal to the
   unsplit join (tests/test_skew.py::test_aqe_skew_join_fires...).
   This module exists for the cases AQE cannot touch:
2. **Broadcast** the small side (no shuffle at all) — but only if it fits.
3. **Manual salting** (this module) — when the build side is too big to
   broadcast AND the join is outside AQE's reach (streaming-static joins,
   or a stubbornly hot key inside an otherwise balanced shuffle).

Skewed *aggregations* need none of this: Spark's partial (map-side)
aggregation already combines hot-key rows before the shuffle, which is
exactly what a manual two-stage salted aggregate would do by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    ``big`` rows get a uniform random-ish salt derived from a *stable* hash
    of the whole row's join-independent identity — here ``monotonically
    _increasing_id`` would be nondeterministic, so we hash the partition-
    independent payload: ``xxhash64(all columns)``. ``small`` is exploded
    ×``n_salts`` so every (key, salt) bucket finds its match. The shuffle
    key becomes (key, salt): a key carrying 1/k of the data now spreads
    over ``n_salts`` tasks.

    Cost: ``small`` is replicated n_salts× (keep it the dimension side);
    result equals the plain join exactly (verified in tests/test_skew.py).
    """
    # Only joins whose output is driven by the big side are salt-safe:
    # for 'right'/'full' every UNMATCHED small-side row would be emitted
    # once per salt replica (n_salts copies) instead of once.
    allowed = {"inner", "left", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}, got {how!r}; "
            "for right/full joins swap the sides or use AQE skew handling"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
    big_salted = big.withColumn(SALT_COL, salt)
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_salted, keys + [SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str
) -> DataFrame:
    """COUNT(DISTINCT x) per group, skew-proof: (group, x) pre-distinct,
    then a plain count per group.

    A direct ``countDistinct`` ships every raw (group, value) pair of a
    hot group to ONE reducer to deduplicate — the classic straggler at
    100 TB. The rewrite dedups on the (group, value) COMPOSITE key first
    (uniformly distributed even when one group dominates, and partially
    aggregated map-side), so no single task ever holds a hot group's full
    value set; the second aggregate then counts already-distinct rows —
    partial counts combine, the hot group costs O(its distinct values),
    not O(its rows).
    """
    return (
        df.select(group_col, distinct_col)
        .distinct()
        .groupBy(group_col)
        .agg(F.count(distinct_col).alias(f"n_distinct_{distinct_col}"))
    )
