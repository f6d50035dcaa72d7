from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-tail tests skipped unless FULL_SUITE=1 — the default "
        "run is the fast tier (oracle parity + plan shapes + budgets + "
        "op semantics) sized to finish inside the driver's pytest budget "
        "(VERDICT r13 #7); run `FULL_SUITE=1 python -m pytest tests/ -q` "
        "for everything",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("FULL_SUITE"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — set FULL_SUITE=1 (driver budget, VERDICT r13 #7)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from dynamic_etl_spark.session import get_spark

    spark = get_spark(app_name="dynamic-etl-spark-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
