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


def test_driver_window_holds_the_r5_rotation():
    """The driver hash-checks only the first DRIVER_WINDOW registered
    queries. The r5 window hands the hard signal to the oracle-backed
    queries never driver-confirmed in r1–r4 (VERDICT r4 next-steps #1)
    plus the two r4-green queries whose results change in r5; everything
    rotated out stays hash-checked by this local harness."""
    from dynamic_etl_spark.registry import DRIVER_WINDOW, _R5_ROTATED_OUT

    window = list(REGISTRY)[:DRIVER_WINDOW]
    for name in (
        # representatives of the never-confirmed families
        "scd2_point_in_time_lookup",
        "heavy_hitter_maintenance",
        "semantic_dedup_survivors",
        "events_zorder_tiles",
        "benchmark_decontamination_bloom",
        # changed in r5: cross-column rule / real BMP+WAV decode
        "validation_report",
        "multimodal_feature_extract",
    ):
        assert name in window, f"{name} fell outside the driver correctness window"
    # nothing already driver-confirmed wastes a slot (except the two
    # changed queries, which need re-confirmation)
    stale = set(window) & set(_R5_ROTATED_OUT)
    assert not stale, f"already-confirmed queries occupy window slots: {sorted(stale)}"


def test_driver_window_is_fully_oracle_backed():
    """A rows-only query inside the window wastes a hard-signal slot."""
    from dynamic_etl_spark.registry import DRIVER_WINDOW

    window = list(REGISTRY.items())[:DRIVER_WINDOW]
    missing = [n for n, q in window if q.oracle is None]
    assert not missing, f"windowed queries without oracles: {missing}"
