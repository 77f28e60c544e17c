"""The b29 recursive-CTE oracle's standing assumptions, pinned.

The oracle replays pandas' ewm loop bit-for-bit but deliberately omits
the NaN-decay branch (ignore_na=False observation skipping) — sound
only while the fixture's `value` column has no NULLs and the per-key
sort key is unique. Assert both, at every fixture scale, so testdata
drift fails here with a pointer instead of as a bare driver hash
mismatch."""

from __future__ import annotations

import duckdb
import pytest

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_fixture_satisfies_b29_oracle_assumptions(sf_dir):
    con = duckdb.connect()
    nulls, dups = con.execute(
        f"""
        SELECT
          (SELECT count(*) FROM '{sf_dir}/events.parquet'
           WHERE value IS NULL),
          (SELECT count(*) FROM (
             SELECT user_id, ts, event_id FROM '{sf_dir}/events.parquet'
             GROUP BY ALL HAVING count(*) > 1))
        """
    ).fetchone()
    assert nulls == 0, (
        f"{sf_dir}: events.value grew NULLs — the b29 oracle does not "
        "replicate pandas' NaN decay; extend _B29_SQL before trusting it"
    )
    assert dups == 0, (
        f"{sf_dir}: (user_id, ts, event_id) no longer unique — the "
        "b29 oracle's ROW_NUMBER order is ambiguous"
    )


def test_b29_oracle_matches_pandas_reference_bitwise(sf_dir):
    """Belt under the hash gate: the DuckDB recurrence equals the
    single-process pandas reference EXACTLY (==, not approx) on every
    row — localizes any future drift to engine vs oracle immediately."""
    import numpy as np

    from stock_data_pipeline_spark.operators.timeseries import (
        _B29_SQL,
        _indicators_shard,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    d = (
        con.execute(_B29_SQL)
        .df()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    src = con.execute(
        "SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS value "
        "FROM events"
    ).df()
    p = (
        _indicators_shard(src)
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(p) == len(d) > 0
    for col in ["ema", "rsi"]:
        a = p[col].to_numpy(dtype=float)
        b = d[col].to_numpy(dtype=float)
        eq = (a == b) | (np.isnan(a) & np.isnan(b))
        assert eq.all(), f"{col}: {int((~eq).sum())} rows differ bitwise"


def test_b29_oracle_bitwise_on_arbitrary_series():
    """Property-style extension of the fixture check: the recursive-CTE
    replay must equal pandas' ewm loop bit-for-bit on ARBITRARY no-NULL
    series, not just the shipped fixture — including constant runs (the
    `weighted_avg != cur` short-circuit path), monotone ramps (loss
    stays 0 → rsi pinned at 100), alternating signs, single-row keys,
    and sub-ulp value steps. Pure DuckDB + pandas — no Spark needed, so
    this runs in milliseconds and pins the arithmetic contract itself."""
    import duckdb
    import numpy as np
    import pandas as pd

    from stock_data_pipeline_spark.operators.timeseries import (
        _B29_SQL,
        _indicators_shard,
    )

    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    series = {
        0: np.full(30, 42.5),                          # constant: short-circuit
        1: np.arange(1.0, 41.0),                       # monotone up: loss == 0
        2: -np.arange(1.0, 41.0),                      # monotone down
        3: np.array([5.0]),                            # single row
        4: rng.standard_normal(50) * 1e6,              # large magnitudes
        5: 1.0 + rng.standard_normal(50) * 1e-12,      # sub-ulp steps
        6: np.where(np.arange(40) % 2 == 0, 3.0, -3.0),  # alternating
        7: rng.standard_normal(37),                    # plain noise
    }
    for uid, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((uid, eid, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i), float(v)))
            eid += 1
    src = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])

    con = duckdb.connect()
    con.register("events", src)
    d = (
        con.execute(_B29_SQL)
        .df()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    p = (
        _indicators_shard(src.copy())
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(p) == len(d) == len(src)
    for col in ["ema", "rsi"]:
        a = p[col].to_numpy(dtype=float)
        b = d[col].to_numpy(dtype=float)
        eq = (a == b) | (np.isnan(a) & np.isnan(b))
        assert eq.all(), f"{col}: {int((~eq).sum())} rows differ bitwise"


def test_engine_matches_pandas_on_skewed_chain(spark):
    """b29's ENGINE under celebrity skew (round 12): the recursive-CTE
    ORACLE is O(longest per-key chain) iterations, so the skew-regime
    window sweep substitutes it (tools/window_sweep.py) — this test is
    the standing engine-side skew evidence it points at. One hot user
    with a 10,000-event chain (the sf1-skew hot-key shape) plus normal
    keys goes through the DISTRIBUTED path (shard repartition →
    applyInPandas → Arrow batching of one giant group) and must equal
    pandas' ewm loop bit-for-bit on every row."""
    import numpy as np
    import pandas as pd

    from stock_data_pipeline_spark.operators.timeseries import (
        _indicators_shard,
        with_indicators,
    )

    rng = np.random.default_rng(1212)
    rows = []
    eid = 0
    chains = {0: 10_000, 1: 37, 2: 1, 3: 99}
    for uid, n in chains.items():
        vals = rng.standard_normal(n) * 50.0 + 100.0
        for i, v in enumerate(vals):
            rows.append(
                (
                    uid,
                    eid,
                    pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i),
                    float(v),
                )
            )
            eid += 1
    src = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])

    got = (
        with_indicators(spark.createDataFrame(src))
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        _indicators_shard(src.copy())
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == len(src)
    for col in ["ema", "rsi"]:
        a = got[col].to_numpy(dtype=float)
        b = want[col].to_numpy(dtype=float)
        eq = (a == b) | (np.isnan(a) & np.isnan(b))
        assert eq.all(), f"{col}: {int((~eq).sum())} rows differ bitwise"
