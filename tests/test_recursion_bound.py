"""b19_sessionize_recursive round budget (round-11 hardening).

The recursive-CTE sessionization's depth equals the longest per-user
event chain; each level is a self-join stage, so on hostile data
(celebrity-skew twin: one 8,600-event user) an uncapped walk spins for
hours instead of erroring (BENCHNOTES round 10). The fix is a pre-check:
one aggregate measures the longest chain and raises a loud ValueError
when it exceeds ``max_rounds`` — BEFORE any recursion stage launches.

Pinned here:
1. a hostile chain fails FAST with the actionable message;
2. raising ``max_rounds`` explicitly re-admits the same data, and the
   result matches the window formulation exactly;
3. the uniform driver fixture is bit-unchanged under the default cap
   (recursive == window formulation row-for-row on sf0.001).
"""

from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stock_data_pipeline_spark.catalog import load, table_path
from stock_data_pipeline_spark.streaming.jobs import (
    MAX_RECURSION_ROUNDS_DEFAULT,
    recursive_sessionize,
    sessionize,
)

_SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.user_id, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    """events fixture with one 40-event chain (user 1) + one 5-event
    chain (user 2), written with the real fixture's arrow schema so the
    catalog's ns-timestamp normalization applies identically."""
    src = pq.read_table(table_path(_SF, "events"))
    base_ts = pd.Timestamp("2024-03-01 09:00:00")
    rows = []
    for uid, n in ((1, 40), (2, 5)):
        for i in range(n):
            # 40-minute spacing > the 30-minute gap: every event opens a
            # new session, so session counts are trivially predictable.
            rows.append(
                {
                    "event_id": uid * 1000 + i,
                    "ts": base_ts + pd.Timedelta(minutes=40 * i),
                    "user_id": uid,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
    pdf = pd.DataFrame(rows)
    d = tmp_path_factory.mktemp("hostile_sf")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=src.schema, preserve_index=False),
        str(d / "events.parquet"),
    )
    # register_views registers every catalog table; link the untouched ones.
    import os

    from stock_data_pipeline_spark.catalog import TABLES

    for t in TABLES:
        if t != "events":
            os.symlink(table_path(_SF, t), str(d / f"{t}.parquet"))
    return str(d)


def test_hostile_chain_fails_fast_with_actionable_message(spark, hostile_dir):
    t0 = time.monotonic()
    with pytest.raises(ValueError) as exc:
        recursive_sessionize(spark, hostile_dir, max_rounds=10)
    elapsed = time.monotonic() - t0
    msg = str(exc.value)
    assert "max_rounds=10" in msg
    assert "40 rounds" in msg  # the measured chain length is reported
    assert "b19_sessionization" in msg  # the scale-path alternative is named
    # Fail-fast means one aggregate scan, not 40 self-join stages.
    assert elapsed < 30


def test_explicit_max_rounds_readmits_and_matches_window_form(spark, hostile_dir):
    got = _rows(recursive_sessionize(spark, hostile_dir, max_rounds=64))
    want = _rows(sessionize(load(spark, hostile_dir, "events"), gap_minutes=30))
    assert got == want
    # 40-minute spacing: every event is its own session.
    assert len(got) == 45


def test_uniform_fixture_unchanged_under_default_cap(spark):
    got = _rows(recursive_sessionize(spark, _SF))
    want = _rows(sessionize(load(spark, _SF, "events"), gap_minutes=30))
    assert got == want


def test_default_cap_clears_all_uniform_sfs_with_headroom():
    """The default must clear the real fixtures' longest chain (99 at
    sf0.1, FIXTURES.md) with headroom — a regression here means a fixture
    regeneration silently outgrew the cap."""
    import duckdb

    longest = duckdb.sql(
        "SELECT max(c) FROM (SELECT count(*) AS c FROM "
        "'/root/testdata/sf0.1/events.parquet' GROUP BY user_id)"
    ).fetchone()[0]
    assert longest * 2 <= MAX_RECURSION_ROUNDS_DEFAULT
