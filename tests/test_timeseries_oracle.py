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
