"""Capstone integration: the reference user's full workflow on the engine.

One test walks everything a user of justpqa/stock_data_pipeline actually
does in a day, end to end on engine components only: two intraday ticker
batches and two financial-ratio batches land through the parameterized
ingest pipeline (quarantine + schema-enforced append), the ratio
snapshots fold into an SCD2 dimension, the ticks enrich point-in-time
against it (never seeing future ratios), and the dashboard layer screens
top movers — with every number cross-checked against a plain-Python
recompute of the same landed data.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from stock_data_pipeline_spark.operators.scd import scd2_apply
from stock_data_pipeline_spark.pipelines.ingest import (
    RATIO_SPEC,
    TICKER_SPEC,
    IngestPipeline,
)
from stock_data_pipeline_spark.sources.fetch import synthetic_quote_fetcher
from stock_data_pipeline_spark.sources.seed import BAD_TICKERS

T0 = datetime(2024, 3, 1, 9, 30, 0)
T1 = datetime(2024, 3, 1, 10, 30, 0)
SYMBOLS = [f"SYM{i:03d}" for i in range(25)] + list(BAD_TICKERS)


def test_reference_user_day_end_to_end(spark, tmp_path):
    # --- 1. land two batches of each feed (A1-A19 semantics) -------------
    ticks = IngestPipeline(
        TICKER_SPEC,
        str(tmp_path),
        fetcher=synthetic_quote_fetcher(TICKER_SPEC.fields),
        symbols=SYMBOLS,
    )
    ratios = IngestPipeline(
        RATIO_SPEC,
        str(tmp_path),
        fetcher=synthetic_quote_fetcher(RATIO_SPEC.fields),
        symbols=SYMBOLS,
    )
    for t in (T0, T1):
        m_t = ticks.run_batch(spark, t)
        m_r = ratios.run_batch(spark, t)
        assert m_t.n_ok == 25 and m_r.n_ok == 25

    tick_rows = ticks.read_sink(spark)
    assert tick_rows.count() == 50  # 25 tickers x 2 batches

    # --- 2. fold ratio snapshots into the SCD2 dimension -----------------
    history = None
    for t in (T0, T1):
        snap = (
            ratios.read_sink(spark)
            .filter(F.col("Time") == t)
            .select("Ticker", "QuickRatio", F.col("Time").alias("as_of"))
        )
        history = scd2_apply(history, snap, keys=["Ticker"], attrs=["QuickRatio"])
    hist_rows = history.collect()
    # synthetic values move batch to batch: every ticker has 2 versions
    assert len(hist_rows) == 50
    assert sum(1 for r in hist_rows if r.is_current) == 25

    # --- 3. point-in-time enrichment (no future-ratio leakage) -----------
    h = history.select(
        F.col("Ticker").alias("h_ticker"),
        "QuickRatio",
        "valid_from",
        "valid_to",
    )
    enriched = tick_rows.join(
        F.broadcast(h),
        (F.col("Ticker") == F.col("h_ticker"))
        & (F.col("Time") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("Time") < F.col("valid_to"))),
    ).select("Time", "Ticker", "Price", "QuickRatio")
    got = {(r.Ticker, r.Time): r.QuickRatio for r in enriched.collect()}
    assert len(got) == 50  # every tick matched exactly one version
    # the T0 tick must see the T0 ratio, the T1 tick the T1 ratio
    want = {
        (r.Ticker, r.valid_from): r.QuickRatio for r in hist_rows
    }
    assert got == want

    # --- 4. dashboard: top movers between the two batches ----------------
    px = {
        (r.Ticker, r.Time): r.Price for r in tick_rows.collect()
    }
    py_ret = {
        s: px[(s, T1)] / px[(s, T0)] - 1
        for s in {k[0] for k in px}
        if px[(s, T0)]
    }
    top3 = sorted(py_ret, key=lambda s: (-py_ret[s], s))[:3]

    first_last = (
        tick_rows.groupBy("Ticker")
        .agg(
            F.min_by("Price", "Time").alias("open_px"),
            F.max_by("Price", "Time").alias("close_px"),
        )
        .filter(F.col("open_px") != 0)
        .select(
            "Ticker",
            (F.col("close_px") / F.col("open_px") - 1).alias("ret"),
        )
        .orderBy(F.desc("ret"), F.asc("Ticker"))
        .limit(3)
    )
    assert [r.Ticker for r in first_last.collect()] == top3
