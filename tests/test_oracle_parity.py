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
