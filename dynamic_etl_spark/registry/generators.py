"""Generator queries (SURVEY.md §2.11 G1-G3, G5) — rows-only: outputs are
deterministic (hash-based uniforms) but not SQL-reproducible, so the
driver records the weaker check; tests/test_generate.py enforces the
validator gates, FK resolution, money invariants, and
partitioning-independence."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dynamic_etl_spark import generate as G
from dynamic_etl_spark.registry.core import Query, QueryRegistry


def generator_stores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.generate_stores(spark, 100)


def generator_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.generate_products(spark, 300)


def generator_distributors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return G.generate_distributors(spark, 50)


def generator_fact_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    stores = G.generate_stores(spark, 100)
    products = G.generate_products(spark, 300)
    dists = G.generate_distributors(spark, 50)
    return G.generate_fact_sales(spark, stores, products, dists, date_id=20240615, rows=1000)


QUERIES: QueryRegistry = {
    "generator_stores": Query(generator_stores, None, "G2 seeded store generator"),
    "generator_products": Query(generator_products, None, "G1 seeded product generator"),
    "generator_distributors": Query(generator_distributors, None, "G3 seeded distributor generator"),
    "generator_fact_day": Query(
        generator_fact_day, None, "G5 1000-row fact day (weighted/affinity picks, tiered discount)"
    ),
}
