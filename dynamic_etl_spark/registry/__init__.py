"""Driver-facing query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string the DuckDB oracle can run on the same parquet
tables (None for genuinely non-SQL-expressible operators — the driver then
records a weaker rows-only check).

Parity discipline (SURVEY.md §5, §7 "parity traps"):
- every computed column is aliased identically in Spark and SQL;
- double aggregates go through exact decimal sums and come back as double,
  so values are bit-identical regardless of partitioning / evaluation order;
- timestamps are naive UTC on both sides (session TZ pinned in session.py).
"""

from __future__ import annotations

from dynamic_etl_spark.registry.core import Query, QueryRegistry


def all_queries() -> QueryRegistry:
    from dynamic_etl_spark.registry import (
        cleaning,
        dates,
        events,
        generators,
        llm,
        merge,
        relational,
        validation,
        windows,
    )

    registry: QueryRegistry = {}
    for module in (
        relational,
        windows,
        cleaning,
        dates,
        merge,
        validation,
        events,
        llm,
        generators,
    ):
        overlap = registry.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        registry.update(module.QUERIES)
    return registry
