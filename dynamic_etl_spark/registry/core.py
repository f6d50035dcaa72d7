"""Shared plumbing for registry modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from dynamic_etl_spark.catalog import load_table


@dataclass(frozen=True)
class Query:
    """One driver-checkable query: Spark plan + DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


QueryRegistry = dict[str, Query]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def sql_dsum(col: str) -> str:
    """DuckDB twin of ops.agg.dsum (see agg.as_double for the scale-4 hop)."""
    return f"CAST(CAST(SUM(CAST({col} AS DECIMAL(25,6))) AS DECIMAL(38,4)) AS DOUBLE)"


def sql_davg(col: str) -> str:
    """DuckDB twin of ops.agg.davg."""
    return f"({sql_dsum(col)} / COUNT({col}))"
