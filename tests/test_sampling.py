"""Behavior tests for sampling/splitting/packing and technical indicators
(operators/sampling.py, operators/timeseries.py B29) — the registered
queries without a SQL oracle, checked by invariant here instead."""

from __future__ import annotations

import pandas as pd
import pytest

from stock_data_pipeline_spark.catalog import load
from stock_data_pipeline_spark.operators.sampling import (
    PACK_BUDGET,
    pack_sequences,
    with_split,
)
from stock_data_pipeline_spark.operators.timeseries import (
    _indicators,
    with_indicators,
)


def test_hash_split_is_deterministic_and_partition_invariant(spark, sf_check_dir):
    docs = load(spark, sf_check_dir, "documents")
    a = with_split(docs).select("doc_id", "split").toPandas()
    b = (
        with_split(docs.repartition(13, "lang"))
        .select("doc_id", "split")
        .toPandas()
    )
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert len(merged) == len(a)
    assert (merged["split_a"] == merged["split_b"]).all()


def test_hash_split_fractions_near_nominal(spark, sf_check_dir):
    docs = load(spark, sf_check_dir, "documents")
    counts = with_split(docs).groupBy("split").count().toPandas()
    frac = dict(zip(counts["split"], counts["count"] / counts["count"].sum()))
    assert frac["train"] == pytest.approx(0.80, abs=0.06)
    assert frac["val"] == pytest.approx(0.10, abs=0.05)
    assert frac["test"] == pytest.approx(0.10, abs=0.05)


def test_packing_covers_every_doc_exactly_once(spark, sf_check_dir):
    docs = load(spark, sf_check_dir, "documents")
    packed = pack_sequences(docs).toPandas()
    assert packed["doc_id"].is_unique
    assert len(packed) == docs.count()


def test_packing_respects_token_budget(spark, sf_check_dir):
    docs = load(spark, sf_check_dir, "documents")
    packed = pack_sequences(docs).toPandas()
    fills = packed.groupby(["pack_group", "bin_id"]).agg(
        total=("n_tokens", "sum"), n_docs=("n_tokens", "size")
    )
    # A bin over budget is allowed only as a singleton oversize document.
    over = fills[fills["total"] > PACK_BUDGET]
    assert (over["n_docs"] == 1).all()
    # The reported bin_fill matches the actual bin content.
    joined = packed.merge(
        fills.reset_index(), on=["pack_group", "bin_id"], how="left"
    )
    assert (joined["bin_fill"] == joined["total"]).all()


def test_packing_is_reasonably_dense(spark, sf_check_dir):
    """FFD should waste little: mean fill of multi-doc bins ≥ 50% budget."""
    docs = load(spark, sf_check_dir, "documents")
    packed = pack_sequences(docs).toPandas()
    fills = packed.groupby(["pack_group", "bin_id"])["n_tokens"].sum()
    # All but the last (residual) bin per group should be well-filled on
    # average; assert the corpus-wide mean utilization clears 50%.
    assert fills.mean() >= PACK_BUDGET * 0.5


def test_ema_rsi_matches_pandas_ground_truth(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    got = (
        with_indicators(events)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    raw = events.select("user_id", "event_id", "ts", "value").toPandas()
    want = (
        raw.groupby("user_id", group_keys=False)[raw.columns]
        .apply(_indicators)
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)


def test_rsi_bounds_and_warmup_null(spark, sf_dir):
    got = with_indicators(load(spark, sf_dir, "events")).toPandas()
    first = got.sort_values(["user_id", "ts", "event_id"]).groupby("user_id").head(1)
    assert first["rsi"].isna().all()  # no delta on the first row of a key
    rest = got["rsi"].dropna()
    assert ((rest >= 0.0) & (rest <= 100.0)).all()
