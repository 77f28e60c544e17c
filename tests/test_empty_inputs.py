"""Empty-input robustness: every registered query must run (not crash)
over a dataset where all ten tables exist but hold zero rows — the
empty-partition / empty-day case that 100 TB jobs hit routinely."""

from __future__ import annotations

import glob
import shutil

import pytest

from stock_data_pipeline_spark import registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(0)
        tmp = str(root / f"tmp_{t}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, str(root / f"{t}.parquet"))
        shutil.rmtree(tmp)
    return str(root)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = {}
    for name, fn in registry.full_queries().items():
        try:
            fn(spark, empty_sf_dir).limit(5).collect()
        except Exception as ex:  # noqa: BLE001 - collecting a report
            failures[name] = str(ex).split("\n")[0][:160]
    assert not failures, failures
