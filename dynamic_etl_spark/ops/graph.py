"""Connected components over a pair graph (near-dup clustering).

The missing last step of every dedup pipeline: pair detectors (MinHash-LSH,
n-gram Jaccard, SimHash, embedding-cosine — ops/lsh.py, ops/ann.py) emit
EDGES; corpus curation needs CLUSTERS plus one canonical survivor per
cluster. The reference has no graph operator (its dedup stops at
drop_duplicates, scripts2/load_dim_product_dw.py:387-392); this is part of
the beyond-reference LLM-data layer.

Algorithm: iterative min-label propagation with pointer jumping
(path halving), the DataFrame re-expression of classic MapReduce CC
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).
Each round does

    l(v) <- min(l(v), min_{u in N(v)} l(u))     # one join + one groupBy
    l(v) <- min(l(v), l(l(v)))                  # pointer jump: one self-join

Plain propagation needs O(diameter) rounds; the jump contracts label
chains geometrically, so convergence is O(log diameter) — a 2^30-long
path converges inside the default ``max_iter=30``. Near-dup components
are dense (diameter 1-3) and converge in 2-3 rounds.

Scale shape: every round is two key shuffles (neighbor groupBy, label
self-join) over (vertex, label) pairs — never over payloads. Labels are
persisted per round and unpersisted as soon as the next round lands;
lineage is truncated with ``localCheckpoint`` every ``checkpoint_every``
rounds so plan size stays O(1) across iterations (an iterative job's
classic failure mode). The only driver-side values are the per-round
label-sum convergence scalars (labels never increase, so an unchanged
exact-decimal sum IS the fixpoint — no old-vs-new join needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    MINIMUM vertex id of its connected component (the canonical-survivor
    convention of the dedup layer: keep-first = keep MIN id).

    Returns (vertex, component) for every vertex incident to at least one
    edge; isolated vertices are the caller's to add (left-join + coalesce
    to their own id — see registry near_dup_components). Self-loops and
    null endpoints are dropped.

    Deterministic at any parallelism: min() is order-insensitive and the
    iteration count depends only on graph shape.
    """
    sym = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
        .union(edges.select(F.col(dst).alias("v"), F.col(src).alias("n")))
        .filter(F.col("v") != F.col("n"))
        .distinct()
        .persist()
    )
    labels = (
        sym.groupBy("v")
        .agg(F.min("n").alias("__mn"))
        .select("v", F.least(F.col("v"), F.col("__mn")).alias("l"))
        .persist()
    )
    # Convergence detector: labels never increase, so the exact-decimal
    # label sum strictly decreases until the fixpoint — one cheap agg on
    # the already-persisted round output, no old-vs-new join needed.
    def _label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("l").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]

    prev_sum = _label_sum(labels)
    converged = False
    for it in range(max_iter):
        nbr = (
            sym.join(labels.select(F.col("v").alias("n"), F.col("l").alias("nl")), "n")
            .groupBy("v")
            .agg(F.min("nl").alias("nl"))
        )
        prop = labels.join(nbr, "v", "left").select(
            "v", F.least(F.col("l"), F.coalesce(F.col("nl"), F.col("l"))).alias("l")
        )
        # pointer jump: adopt the label OF the label vertex
        lookup = prop.select(F.col("v").alias("l"), F.col("l").alias("ll"))
        jumped = prop.join(lookup, "l", "left").select(
            "v", F.least(F.col("l"), F.coalesce(F.col("ll"), F.col("l"))).alias("l")
        )
        if (it + 1) % checkpoint_every == 0:
            jumped = jumped.localCheckpoint()
        else:
            jumped = jumped.persist()
        new_sum = _label_sum(jumped)
        labels.unpersist()
        labels = jumped
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "with pointer jumping this needs a component diameter beyond "
            f"~2^{max_iter}; raise max_iter"
        )
    # return a checkpointed LEAF and release the loop's cache: the final
    # per-round persist would otherwise stay pinned in the CacheManager
    # forever (per-batch callers like the streaming dedup sink would leak
    # one entry per invocation — review r4 pass 2); the extra checkpoint
    # re-reads cached/checkpointed partitions, not the iteration
    out = labels.select("v", F.col("l").alias("component")).localCheckpoint()
    labels.unpersist()
    return out
