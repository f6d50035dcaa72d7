"""Every registry query must hash-match its DuckDB oracle — this is a local
replica of the driver's t2 correctness gate (run at sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import os

import pytest

from dynamic_etl_spark.registry import all_queries
from tests.conftest import SF_SMALL
from tests.parity import compare, run_oracle

SF_DIR = os.environ.get("PARITY_SF_DIR", SF_SMALL)
REGISTRY = all_queries()
ORACLE_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, name):
    query = REGISTRY[name]
    result = compare(name, query.fn(spark, SF_DIR), run_oracle(query.oracle, SF_DIR))
    assert result.ok, str(result)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_driver_window_holds_the_r7_rotation():
    """The driver hash-checks only the first DRIVER_WINDOW registered
    queries. The r7 window closes the driver-signal ledger (VERDICT r6
    #1): all 13 never-driver-confirmed r6 post-window additions sit
    in-window, plus the one confirmed query whose code path changed this
    round; every windowed query is oracle-backed; everything rotated out
    stays hash-checked by this local harness."""
    from dynamic_etl_spark.registry import DRIVER_WINDOW, _ROTATED_OUT

    window = list(REGISTRY)[:DRIVER_WINDOW]
    for name in (
        # the 13 r6 post-window additions, never driver-confirmed
        "count_min_maintenance",
        "duplicated_span_removal",
        "events_compaction_plan",
        "events_ks_drift",
        "events_value_trend",
        "fk_integrity_report",
        "leakage_safe_split",
        "length_bucketed_batching",
        "quasi_identifier_risk",
        "rollup_slice_rebuild",
        "semantic_decontamination",
        "semantic_decontamination_vectorized",
        "source_diversity_profile",
        # numpy decode rewrite this round (VERDICT r6 #4)
        "multimodal_feature_extract",
        # every r7 addition ships with a hard-signal slot of its own
        "events_ks_drift_binned",
        "events_ks_drift_autogrid",
        "curation_pipeline_accounting",
        "ks_drift_maintenance",
        "split_leakage_audit",
        "dedup_impact_forecast",
        "benchmark_span_scrub",
    ):
        assert name in window, f"{name} fell outside the driver correctness window"
    # a rows-only query in the window would waste a hash slot
    assert all(REGISTRY[n].oracle is not None for n in window)
    stale = set(window) & set(_ROTATED_OUT)
    assert not stale, f"rotated-out queries occupy window slots: {sorted(stale)}"


def test_driver_window_is_fully_oracle_backed():
    """A rows-only query inside the window wastes a hard-signal slot."""
    from dynamic_etl_spark.registry import DRIVER_WINDOW

    window = list(REGISTRY.items())[:DRIVER_WINDOW]
    missing = [n for n, q in window if q.oracle is None]
    assert not missing, f"windowed queries without oracles: {missing}"
