"""Physical-plan introspection helpers shared by the budget harness and
the bench sidecar — ONE definition of the counting convention so the two
surfaces can never drift apart (review r8: bench.py had re-implemented
the counter verbatim)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def count_shuffle_exchanges(plan: str) -> int:
    """Count SHUFFLE exchanges only: hash/range/single-partition/
    round-robin. A bare ``plan.count("Exchange")`` also counts
    BroadcastExchange and ReusedExchange, which can mask a
    broadcast-join degradation — the exact regression this counting
    rule exists to catch (review r4 pass 2)."""
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
        + plan.count("Exchange RoundRobinPartitioning")
    )


def physical_plan(df: DataFrame) -> str:
    """The AQE-INITIAL physical plan string of an unexecuted DataFrame —
    the deterministic convention both the shuffle budgets and the bench
    sidecar record (post-execution AQE rewrites vary with runtime
    stats)."""
    return df._jdf.queryExecution().executedPlan().toString()
