"""Differential tests: every oracle-backed registered query vs DuckDB.

This mirrors (strictly) the driver's t2 correctness gate at sf=0.01.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark import registry

from .oracle import assert_matches_oracle

ORACLE_NAMES = sorted(registry.full_oracles())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_check_dir, name):
    assert_matches_oracle(spark, name, sf_check_dir)


def test_every_query_returns_rows_smoke(spark, sf_dir):
    """Every registered query (oracle or not) runs at sf0.001 and has a
    stable, non-empty schema."""
    for name, fn in registry.full_queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
