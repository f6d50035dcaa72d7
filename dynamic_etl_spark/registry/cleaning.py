"""Placeholder — populated in a later milestone."""

from dynamic_etl_spark.registry.core import QueryRegistry

QUERIES: QueryRegistry = {}
