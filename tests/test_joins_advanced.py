"""Unit tests for the as-of join and bucketized range join — boundary and
tie semantics plus plan-shape guarantees (the oracle parity harness
covers value-exactness of the registered queries)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.asof import asof_join
from dynamic_etl_spark.ops.rangejoin import point_in_interval_join
from tests.conftest import SF_SMALL


def _ts(s: str):
    return datetime.fromisoformat(s)


# -------------------------------------------------------------- as-of ---

def _asof_fixture(spark):
    probe = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # equal-ts state exists
            (2, 10, _ts("2024-01-01 09:00:00")),  # no state yet
            (3, 10, _ts("2024-01-01 12:30:00")),  # between states
            (4, 20, _ts("2024-01-01 23:00:00")),  # key with one state
            (5, 30, _ts("2024-01-01 23:00:00")),  # key with no state at all
        ],
        "pid long, k long, ts timestamp",
    )
    state = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 10:00:00"), 1.0),  # ties with probe 1
            (101, 10, _ts("2024-01-01 10:00:00"), 2.0),  # same ts, higher id wins
            (102, 10, _ts("2024-01-01 12:00:00"), 3.0),
            (103, 10, _ts("2024-01-01 13:00:00"), 4.0),
            (104, 20, _ts("2024-01-01 00:00:00"), 5.0),
        ],
        "sid long, k long, ts timestamp, v double",
    )
    return probe, state


def test_asof_inclusive_ties_and_nulls(spark):
    probe, state = _asof_fixture(spark)
    out = {
        r["pid"]: r
        for r in asof_join(
            probe, state, key_cols=["k"], ts_col="ts",
            attach_cols=["sid", "v"], tiebreak_col="sid",
        ).collect()
    }
    assert len(out) == 5  # every probe row survives exactly once
    # equal ts is INCLUSIVE and the max-tiebreak state wins the tie
    assert out[1]["asof_sid"] == 101 and out[1]["asof_v"] == 2.0
    # probe before any state -> nulls
    assert out[2]["asof_sid"] is None and out[2]["asof_v"] is None
    # strictly-between picks the earlier state, not the later
    assert out[3]["asof_sid"] == 102
    assert out[4]["asof_sid"] == 104
    # key absent from state entirely -> nulls
    assert out[5]["asof_sid"] is None


def test_asof_attach_collision_raises(spark):
    probe, state = _asof_fixture(spark)
    probe2 = probe.withColumn("asof_sid", F.lit(0))
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            probe2, state, key_cols=["k"], ts_col="ts",
            attach_cols=["sid"], tiebreak_col="sid",
        )


def test_asof_registered_query_plan_has_no_join_at_all(spark):
    """The union-window formulation must compile to exchanges + window,
    never a join operator — that's its whole scale argument."""
    from dynamic_etl_spark.registry import all_queries

    plan = (
        all_queries()["events_asof_last_purchase"]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------- range join ---

def _range_fixture(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # exactly on a start boundary
            (2, _ts("2024-01-01 11:59:59")),  # just inside the end
            (3, _ts("2024-01-01 12:00:00")),  # exactly on the end -> excluded
            (4, _ts("2024-01-01 03:00:00")),  # in no interval
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            # straddles a 2h-bucket boundary (11:00 start with 7200s buckets)
            (11, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 13:00:00")),
            (12, _ts("2024-01-01 20:00:00"), _ts("2024-01-01 22:00:00")),  # empty
            (13, _ts("2024-01-01 05:00:00"), _ts("2024-01-01 05:00:00")),  # degenerate
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def test_range_join_boundaries_and_multiplicity(spark):
    points, intervals = _range_fixture(spark)
    out = point_in_interval_join(
        points, intervals, ts_col="ts", bucket_seconds=7200, how="inner"
    )
    pairs = sorted((r["iid"], r["pid"]) for r in out.collect())
    # start inclusive, end exclusive, each real match exactly once even
    # when the interval spans two buckets
    assert pairs == [(10, 1), (10, 2), (11, 2), (11, 3)]


def test_range_join_left_preserves_empty_and_drops_degenerate(spark):
    points, intervals = _range_fixture(spark)
    out = point_in_interval_join(
        points, intervals, ts_col="ts", bucket_seconds=7200, how="left"
    )
    agg = {
        r["iid"]: r["n"]
        for r in out.groupBy("iid").agg(F.count("pid").alias("n")).collect()
    }
    assert agg[12] == 0          # empty interval survives with zero points
    assert 13 not in agg         # degenerate interval dropped
    assert agg[10] == 2 and agg[11] == 2


def test_range_join_rejects_interval_longer_than_bucket(spark):
    points, intervals = _range_fixture(spark)
    with pytest.raises(Exception, match="longer than bucket_seconds"):
        point_in_interval_join(
            points, intervals, ts_col="ts", bucket_seconds=3600, how="inner"
        ).collect()


def test_range_registered_query_plan_is_equi_join(spark):
    from dynamic_etl_spark.registry import all_queries

    plan = (
        all_queries()["events_range_interval_join"]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
