"""File-layout invariance: identical rows split across many small part
files must produce BIT-identical results to the single-file fixtures.

At 100 TB every table is thousands of files; mapper granularity (split
planning, row-group boundaries, partial-aggregation input order) must
never leak into results. The full-window twin of this check is the
tools/splitgen.py + tools/window_sweep.py regime (BENCHNOTES round 10,
50/50 vs DuckDB on a 64-file sf0.01 twin); this test pins the property
in the suite on representative query classes so a layout-sensitive
operator can't land between regime sweeps.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from stock_data_pipeline_spark.catalog import TABLES
from stock_data_pipeline_spark.registry import get

from .oracle import normalize

# One representative per result-shape class, including the operators a
# layout change is most likely to disturb: per-group packing
# (applyInPandas over a content-hash group), exact-decimal aggregation
# (partial-agg input order), window frames, join+topk, and text
# tokenization grain.
_QUERIES = [
    "b02_group_agg",
    "b03_ohlcv_bars",
    "b05_large_join",
    "b09_moving_window",
    "c01_exact_dedup",
    "c04_top_tokens",
    "c09_sequence_packing_portable",
    # the query whose sf0.1+split64 sweep failure was adjudicated as
    # session-heap capacity (BENCHNOTES r10): pin that its RESULT is
    # layout-invariant so the adjudication stays checkable
    "b73_q21_waiting_supplier",
]

_K = 8  # part files per table (sf0.001 tables are tiny; 8 is plenty hostile)


@pytest.fixture(scope="module")
def split_sf_dir(sf_dir, tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("sf0.001-split"))
    for t in TABLES:
        tb = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        d = os.path.join(dst, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        n = tb.num_rows
        k = min(_K, max(1, n))
        step = -(-n // k)
        for i in range(0, n, step):
            pq.write_table(tb.slice(i, step), os.path.join(d, f"part-{i // step:05d}.parquet"))
    return dst


@pytest.mark.parametrize("name", _QUERIES)
def test_split_layout_is_bit_identical(spark, sf_dir, split_sf_dir, name):
    base = normalize(get(name).fn(spark, sf_dir).toPandas())
    split = normalize(get(name).fn(spark, split_sf_dir).toPandas())
    assert list(base.columns) == list(split.columns), name
    assert len(base) == len(split), name
    # exact equality, not approx: layout must not shift a single ulp
    for col in base.columns:
        a, b = base[col], split[col]
        same = (a == b) | (a.isna() & b.isna())
        assert bool(same.all()), (
            f"{name}.{col}: {int((~same).sum())} of {len(a)} rows differ "
            f"between single-file and {_K}-file layouts"
        )
