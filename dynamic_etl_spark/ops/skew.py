"""Skew mitigation: key salting (SURVEY.md §4 / driver brief "salting for
skew").

AQE's skew-join handling (on in session.py) covers sort-merge joins by
splitting oversized partitions at runtime. Salting is the complementary
STATIC remedy for the cases AQE can't fix: skewed aggregations (one hot
group key) and broadcast-ineligible joins against a replicable side. Both
helpers are semantics-preserving — results are identical to the unsalted
plan, only the shuffle distribution changes — which is exactly what makes
them oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets): derived from the whole
    row's hash, not rand() (reproducible at any parallelism)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    reaggs: Sequence[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for a skewed group key: phase 1 groups on
    (key, salt) — the hot key's rows spread over ``buckets`` reducers —
    phase 2 re-combines per key. ``aggs`` are the phase-1 aggregates
    (aliased); ``reaggs`` combine those aliases (e.g. count -> sum,
    sum -> sum, min -> min).

    Note Spark's hash aggregation already does map-side partial
    aggregation, which defuses most count/sum skew; salting matters when
    phase-1 state per key is large (collect_set, exact distinct) or the
    combiner can't run (few input partitions, high cardinality payloads).
    """
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(*aggs)
    return phase1.groupBy(*keys).agg(*reaggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a row-hash salt, the dim
    side is REPLICATED ``buckets`` times (explode of the salt range), and
    the join key becomes (key, salt) — a hot fact key now lands on
    ``buckets`` different reducers instead of one.

    Result is exactly the unsalted join for fact-preserving modes.
    Right/full-outer are rejected: an unmatched dim row exists ``buckets``
    times after replication and would be emitted once per copy.
    Replication multiplies the dim shuffle volume by ``buckets``: use for
    moderate dims that are too big to broadcast but far smaller than the
    fact side.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports fact-preserving modes only, not {how!r} "
            "(replicated dim rows would duplicate in right/full outer)"
        )
    keys = list(on)
    salted_fact = with_salt(fact, buckets)
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_fact.join(replicated, [*keys, "__salt"], how)
    return out.drop("__salt")
