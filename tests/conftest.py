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


# ---------------------------------------------------------------------------
# Two-tier suite (r14, VERDICT r13 task 1). The verification driver runs the
# default tier (`pytest tests/ -x -q` with pytest.ini's `-m "not slow"`);
# everything below is the `slow` tier — the scale/stress/fuzz/sf1-replay
# tests plus every individual test that measured >=10 s in the r14 full
# profiling run (`pytest --durations=0`, 645 passed / 39:51 wall; the list
# sums to ~25 min). Membership is maintained HERE, in one auditable place,
# rather than as decorators scattered over 19 files; regenerate with
# `python -m pytest tests/ -q -m "slow or not slow" --durations=0`.
# Deliberately kept in the default tier despite >=10 s:
#   test_registry_contract.py::test_driver_queries_emit_only_atomic_columns
#   (a driver-contract gate — the exact failure class the default tier
#   exists to catch before the driver does).
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_scale_stress.py",      # replication-twin scale invariants (353 s)
    "test_differential_fuzz.py", # fuzz-derived differential plans (213 s)
    "test_streaming_sf1.py",     # sf1 streaming replay (58 s)
}

SLOW_TESTS = {
    "test_oracle_parity.py::test_every_query_returns_rows_smoke",
    "test_oracle_parity.py::test_query_matches_oracle[b19_sessionize_recursive]",
    "test_oracle_parity.py::test_query_matches_oracle[c10_kcore_peel]",
    "test_oracle_parity.py::test_query_matches_oracle[c10_component_labels]",
    "test_properties.py::test_scd2_apply_matches_python_model",
    "test_properties.py::test_ohlcv_partials_merge_slicing_invariant",
    "test_properties.py::test_exact_dedup_fingerprint_groups_cover_all_docs",
    "test_properties.py::test_dec_sum_matches_duckdb_spelling_on_adversarial_values",
    "test_properties.py::test_obv_is_prefix_sum_of_signed_flow",
    "test_properties.py::test_dec_sum_is_partitioning_invariant",
    "test_properties.py::test_up_streaks_match_python_reference",
    "test_ann_ingest.py::test_stream_ingest_then_search_sees_new_vectors",
    "test_ann_ingest.py::test_replayed_ivf_batch_appends_nothing",
    "test_ann_ingest.py::test_skewed_batch_flags_retrain",
    "test_empty_inputs.py::test_every_query_survives_empty_tables",
    "test_plan_hygiene.py::test_no_cartesian_product_in_any_registered_query",
    "test_relational.py::test_no_python_udf_in_relational_plans",
    "test_graph.py::test_kcore_peel_fixpoint_on_corpus",
    "test_graph.py::test_component_labels_converge_to_true_cc_on_corpus",
    "test_graph.py::test_kcore_peel_planted_cascade",
    "test_maintenance.py::test_result_cache_collision_degrades_to_recompute",
    "test_maintenance.py::test_result_cache_torn_rewrite_never_serves_wrong_rows",
    "test_maintenance.py::test_result_cache_serves_materialized_rows_until_refreshed",
    "test_end_to_end_corpus.py::test_llm_corpus_day_end_to_end",
    "test_tokenizer.py::test_batched_training_equals_sequential",
    "test_tokenizer.py::test_batched_training_round_budget",
    "test_similarity.py::test_ivf_retrain_on_drift_rebalances_and_swaps_atomically",
    "test_similarity.py::test_empty_persisted_index_roundtrips_and_searches_empty",
    "test_similarity.py::test_ivfpq_roundtrip_recall_and_pruning",
    "test_similarity.py::test_ivf_retrain_samples_whole_corpus_not_partition_prefix",
    "test_dedup.py::test_fuzzy_join_blocking_has_perfect_recall",
    "test_streaming.py::test_stream_zscore_ordered_survives_restart",
    "test_streaming.py::test_dedup_ingest_across_batches_and_replay",
    "test_streaming.py::test_near_dedup_ingest_cross_batch",
    "test_streaming.py::test_near_dedup_ingest_streaming_wiring",
    "test_partitioning_invariance.py::test_result_identical_under_different_shuffle_partitioning[c10_kcore_peel]",
    "test_recursion_bound.py::test_uniform_fixture_unchanged_under_default_cap",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in SLOW_MODULES or f"{base}::{item.name}" in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
