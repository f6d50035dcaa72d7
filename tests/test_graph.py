"""Connected-components operator (ops/graph.py): correctness vs a pure-
Python union-find on seeded random graphs, chain-contraction convergence,
and the empty/degenerate edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.graph import connected_components


def _union_find_components(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id per component
    roots = {}
    for v in vertices:
        r = find(v)
        roots.setdefault(r, []).append(v)
    return {v: min(mem) for mem in roots.values() for v in mem}


@pytest.mark.parametrize("seed,n,m", [(7, 120, 90), (99, 60, 200)])
def test_components_match_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["v"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    touched = sorted({x for e in edges for x in e})
    want = _union_find_components(edges, touched)
    assert got == want


def test_chain_converges_via_pointer_jumping(spark):
    # a 120-long path is the worst case for plain propagation (120 rounds);
    # pointer jumping must close it inside the default max_iter=30
    chain = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    out = connected_components(df, "src", "dst")
    labels = {r["component"] for r in out.collect()}
    assert labels == {0}
    assert out.count() == 121


def test_empty_and_self_loop_edges(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    empty = spark.createDataFrame([], schema)
    assert connected_components(empty, "src", "dst").count() == 0

    loops = spark.createDataFrame([(5, 5), (5, 6)], ["src", "dst"])
    got = {
        r["v"]: r["component"]
        for r in connected_components(loops, "src", "dst").collect()
    }
    assert got == {5: 5, 6: 5}
