"""Physical-layout scale features: date-partitioned writes prune at the
scan, and bucketed tables co-locate joins (no Exchange). These are the
SURVEY §4 'partition pruning becomes relevant once we write
date_id-partitioned parquet' and the brief's 'bucketing for co-located
joins' made observable."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from dynamic_etl_spark import generate as G

SCRATCH = Path(__file__).resolve().parent.parent / ".tmp" / "layout"


@pytest.fixture()
def scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    SCRATCH.mkdir(parents=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_date_partitioned_write_prunes(spark, scratch):
    stores = G.generate_stores(spark, 20).cache()
    products = G.generate_products(spark, 50).cache()
    dists = G.generate_distributors(spark, 10).cache()
    days = [20240601, 20240602, 20240603]
    facts = None
    for d in days:
        day = G.generate_fact_sales(spark, stores, products, dists, date_id=d, rows=200)
        facts = day if facts is None else facts.unionByName(day)
    path = str(scratch / "fact_partitioned")
    facts.write.partitionBy("date_id").mode("overwrite").parquet(path)

    # one directory per day on disk
    dirs = sorted(p.name for p in Path(path).iterdir() if p.name.startswith("date_id="))
    assert dirs == [f"date_id={d}" for d in days]

    q = spark.read.parquet(path).filter(F.col("date_id") == 20240602)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "20240602" in plan
    # pruned scan reads exactly one day
    assert q.count() == 200


def test_bucketed_join_has_no_shuffle(spark):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and can't be pointed at the scratch dir per-test
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    from dynamic_etl_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    orders = load_table(spark, SF_SMALL, "orders")
    lines = load_table(spark, SF_SMALL, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lines.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lines")
    )
    joined = spark.table("b_lines").join(spark.table("b_orders"), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: the join consumes bucketed scans directly — no Exchange
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() == lines.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
