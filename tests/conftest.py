"""Shared fixtures: one SparkSession per test run, testdata paths."""

from __future__ import annotations

import os

import pytest

from stock_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"
SF_STRESS = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pytest_addoption(parser):
    parser.addoption(
        "--live",
        action="store_true",
        default=False,
        help="run opt-in live-transport smokes (network + yfinance)",
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_check_dir() -> str:
    return SF_CHECK


@pytest.fixture(scope="session")
def sf_stress_dir() -> str:
    """Largest data dir for scale-stress tests; skip where it's absent
    instead of erroring on machines without the full testdata tree."""
    if not os.path.isdir(SF_STRESS):
        pytest.skip(f"stress data dir not present: {SF_STRESS}")
    return SF_STRESS
