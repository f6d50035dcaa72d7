from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from dynamic_etl_spark.session import get_spark

    spark = get_spark(app_name="dynamic-etl-spark-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
