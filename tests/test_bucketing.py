"""Bucketed co-located joins (SCALE.md: 'co-locate joins via bucketing'):
the written layout replaces the per-query shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.catalog import load_table
from dynamic_etl_spark.io.sinks import write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_needs_no_exchange(spark, tmp_path, no_broadcast):
    """Both sides bucketed identically on the join key: the sort-merge
    join compiles WITHOUT a single Exchange — the shuffle was paid once
    at write time, not per query. The same join over plain parquet
    shuffles both sides."""
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")
    try:
        write_bucketed(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "b_orders", ("o_custkey",), 8, path=str(tmp_path / "b_orders"),
            sort_cols=("o_custkey",),
        )
        write_bucketed(
            customer.select("c_custkey", "c_name"),
            "b_customer", ("c_custkey",), 8, path=str(tmp_path / "b_customer"),
            sort_cols=("c_custkey",),
        )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"

        plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan  # the baseline DOES shuffle

        assert joined.count() == plain.count()

        # bucketed aggregation on the bucket key: also exchange-free
        agg = spark.table("b_orders").groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
