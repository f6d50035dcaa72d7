"""Incremental semantic admission (ops/ann.incremental_semantic_merge):
explicit component semantics, brute-force equivalence across batches,
frozen-fit/store reuse, and replay idempotence — the semantic mirror of
tests/test_incremental_dedup.py."""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.ops import ann as A

THRESHOLD = 0.95
DIM = 16


def _vec(seed: int) -> list[float]:
    """Deterministic pseudo-random direction — distinct seeds are
    near-orthogonal in expectation (natural cosines ~0 +- 0.4 at
    DIM=16, far below THRESHOLD)."""
    rng = np.random.RandomState(seed)
    return [float(x) for x in rng.uniform(-1.0, 1.0, DIM)]


def _near(v: list[float]) -> list[float]:
    """The repo's index-keyed perturbation: cosine vs source ~0.999999."""
    return [float(x + 1e-3 * ((i % 3) - 1)) for i, x in enumerate(v)]


def _df(spark, rows: dict[int, list[float]]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(rows.items())],
        "vec_id long, embedding array<double>",
    )


def _cos(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    return num / den if den else 0.0


def _brute_admit(existing: dict[int, list[float]], batch: dict[int, list[float]]):
    """Reference implementation of the shared admission rule
    (ops/graph.admit_batch) over exact all-pairs cosine."""
    cross_hit = {
        n for n in batch
        if any(_cos(batch[n], existing[e]) >= THRESHOLD for e in existing)
    }
    parent = {n: n for n in batch}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in combinations(sorted(batch), 2):
        if _cos(batch[a], batch[b]) >= THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, set[int]] = {}
    for n in batch:
        comps.setdefault(find(n), set()).add(n)
    return {min(m) for m in comps.values() if not m & cross_hit}


def test_semantic_admission_semantics(spark):
    existing = {i: _vec(i) for i in range(10)}
    batch = {
        100: _near(existing[3]),  # near store -> reject
        101: _vec(60),            # unique -> admit
        102: _vec(61),            # pair with 103 -> component min admits
        103: _near(_vec(61)),
        104: _vec(62),            # unique -> admit
    }
    out = A.incremental_semantic_merge(
        _df(spark, existing), _df(spark, batch), "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=3, n_probe=2,
    )
    accepted = {r["vec_id"] for r in out["accepted"].collect()}
    assert accepted == _brute_admit(existing, batch) == {101, 102, 104}

    pairs = {
        (r["id_new"], r["id_matched"], r["scope"])
        for r in out["dup_pairs"].collect()
    }
    assert (100, 3, "existing") in pairs
    assert (103, 102, "batch") in pairs

    # the store delta covers exactly the admitted docs, store-shaped
    assert set(out["new_assigned"].columns) == {"vec_id", "embedding", "cell"}
    delta_ids = {r["vec_id"] for r in out["new_assigned"].collect()}
    assert delta_ids == accepted


def test_semantic_component_rejected_whole_on_store_hit(spark):
    """A within-batch component with one member near the store is
    rejected entirely (the transitive near-dup convention the lexical
    tier pins)."""
    existing = {1: _vec(7)}
    batch = {
        20: _near(_vec(7)),          # near existing
        21: _near(_near(_vec(7))),   # near 20 AND near existing
    }
    out = A.incremental_semantic_merge(
        _df(spark, existing), _df(spark, batch), "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=2, n_probe=2,
    )
    assert out["accepted"].count() == 0
    assert _brute_admit(existing, batch) == set()


def test_semantic_matches_bruteforce_and_state_reuse(spark):
    """Two sequential batches: Spark admission equals the brute-force
    rule, and reusing the frozen fit + accumulated store gives results
    identical to re-assigning the grown corpus from docs (the
    store-reuse-equivalence contract, VERDICT r8 #4)."""
    existing = {i: _vec(i) for i in range(40)}
    batch1 = {
        100: _near(existing[3]),   # near existing 3 -> reject
        101: _vec(60),             # unique
        102: _vec(61),             # pair with 103
        103: _near(_vec(61)),
        104: _vec(62),             # unique
    }
    e_df = _df(spark, existing)
    out1 = A.incremental_semantic_merge(
        e_df, _df(spark, batch1), "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=4, n_probe=2,
    )
    centers = out1["centers"]
    acc1 = {r["vec_id"] for r in out1["accepted"].collect()}
    assert acc1 == _brute_admit(existing, batch1) == {101, 102, 104}

    existing2 = {**existing, **{i: batch1[i] for i in acc1}}
    batch2 = {
        200: _near(_vec(61)),      # near admitted 102
        201: _near(_near(existing[3])),  # near REJECTED 100 — 100 never
                                         # entered the store; only its
                                         # source 3 counts (it is near)
        202: _vec(70),             # unique
        203: _near(_vec(62)),      # near admitted 104
    }
    expect2 = _brute_admit(existing2, batch2)

    # path A: re-assign the grown corpus from docs under the SAME fit
    outA = A.incremental_semantic_merge(
        _df(spark, existing2), _df(spark, batch2), "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=4, n_probe=2, centers=centers,
    )
    # path B: store = initial assignment + batch1's delta (never re-reads
    # the original corpus docs — the persistent-state path)
    store = A.semantic_store_rows(e_df, "vec_id", "embedding", centers).unionByName(
        out1["new_assigned"]
    )
    outB = A.incremental_semantic_merge(
        _df(spark, existing2), _df(spark, batch2), "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=4, n_probe=2,
        centers=centers, existing_assigned=store,
    )
    accA = {r["vec_id"] for r in outA["accepted"].collect()}
    accB = {r["vec_id"] for r in outB["accepted"].collect()}
    assert accA == accB == expect2 == {202}


def test_semantic_replay_rejects_everything(spark):
    """Exactly-once replay contract: a re-delivered batch finds its
    admitted docs in the store under their own ids at cosine 1.0
    (self-pairs are NOT excluded) and re-rejects the whole batch."""
    existing = {i: _vec(i) for i in range(8)}
    batch = {100: _vec(50), 101: _vec(51), 102: _near(existing[2])}
    e_df, b_df = _df(spark, existing), _df(spark, batch)
    out = A.incremental_semantic_merge(
        e_df, b_df, "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=3, n_probe=2,
    )
    acc = {r["vec_id"] for r in out["accepted"].collect()}
    assert acc == {100, 101}
    store2 = A.semantic_store_rows(
        e_df, "vec_id", "embedding", out["centers"]
    ).unionByName(out["new_assigned"])
    replay = A.incremental_semantic_merge(
        e_df.unionByName(out["accepted"]), b_df, "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=3, n_probe=2,
        centers=out["centers"], existing_assigned=store2,
    )
    assert replay["accepted"].count() == 0
    # the replayed admitted docs match THEMSELVES at exactly 1.0
    self_hits = {
        (r["id_new"], r["id_matched"], r["cosine_sim"])
        for r in replay["dup_pairs"].filter(F.col("scope") == "existing").collect()
    }
    assert (100, 100, 1.0) in self_hits and (101, 101, 1.0) in self_hits


def test_semantic_distributed_cc_fallback_matches_driver_path(spark, monkeypatch):
    """Past the pair threshold the within-batch components run as
    distributed pointer-jumping CC; both paths must admit identically
    (admit_batch's hybrid seam, shared with the lexical tier)."""
    from dynamic_etl_spark.ops import graph as G

    existing = {1: _vec(7)}
    batch = {
        20: _vec(40),
        21: _near(_vec(40)),       # component {20,21} -> admit 20
        22: _near(_vec(7)),        # near existing -> reject
        23: _vec(50),              # unique -> admit
    }
    e_df, b_df = _df(spark, existing), _df(spark, batch)
    fast = A.incremental_semantic_merge(
        e_df, b_df, "vec_id", "embedding", threshold=THRESHOLD,
        n_cells=2, n_probe=2,
    )
    fast_ids = {r["vec_id"] for r in fast["accepted"].collect()}

    real_admit = G.admit_batch

    def forced_distributed(new_docs, id_col, dup_pairs, small_cc_threshold=0):
        return real_admit(new_docs, id_col, dup_pairs, small_cc_threshold=0)

    monkeypatch.setattr(G, "admit_batch", forced_distributed)
    slow = A.incremental_semantic_merge(
        e_df, b_df, "vec_id", "embedding", threshold=THRESHOLD,
        n_cells=2, n_probe=2,
    )
    slow_ids = {r["vec_id"] for r in slow["accepted"].collect()}
    assert fast_ids == slow_ids == _brute_admit(existing, batch) == {20, 23}


def test_semantic_within_pair_shared_cells_emits_once(spark):
    """The r14 fused cogroup dedups within-batch pairs IN-CELL (emit
    only from min(shared probed cells)) instead of a distinct exchange:
    with n_cells == n_probe == 2 every doc probes BOTH cells, so every
    within pair meets twice — each must still surface exactly one
    dup_pairs row, with the sequential-fold cosine_sim."""
    existing = {1: _vec(5)}
    batch = {
        30: _vec(77),
        31: _near(_vec(77)),   # within pair (30, 31), shared probe sets
        32: _vec(78),          # singleton
    }
    out = A.incremental_semantic_merge(
        _df(spark, existing), _df(spark, batch), "vec_id", "embedding",
        threshold=THRESHOLD, n_cells=2, n_probe=2,
    )
    pairs = out["dup_pairs"].collect()
    assert [(r["id_new"], r["id_matched"], r["scope"]) for r in pairs] == [
        (31, 30, "batch")
    ]
    expected = round(_cos(batch[30], batch[31]), 6)
    assert pairs[0]["cosine_sim"] == pytest.approx(expected, abs=1e-9)
    assert {r["vec_id"] for r in out["accepted"].collect()} == {30, 32}


def test_semantic_cell_overflow_raises(spark):
    """Cells past max_cell_rows refuse loudly instead of OOMing (the
    SemDeDup guard, shared by every BLAS cogroup in the repo)."""
    existing = {i: _vec(i) for i in range(6)}
    batch = {100 + i: _vec(100 + i) for i in range(6)}
    # dup_pairs localCheckpoints eagerly inside the merge (stateful-
    # output lineage rule), so the overflow surfaces from the call itself
    with pytest.raises(Exception, match="cell holds"):
        A.incremental_semantic_merge(
            _df(spark, existing), _df(spark, batch), "vec_id", "embedding",
            threshold=THRESHOLD, n_cells=1, n_probe=1, max_cell_rows=3,
        )


def test_incremental_curation_tier_attribution(spark, monkeypatch):
    """The composed admission gate (registry/curation.
    incremental_curation_admission) on a hand-built corpus: each tier
    rejects exactly its planted artifact class and attribution names
    the FIRST tier that fired; a tier-2 survivor without an embedding
    passes the semantic tier through."""
    import dynamic_etl_spark.registry.curation as C

    def sentence(seed, n=12):
        return " ".join(f"w{(seed * 31 + p * 7) % 997}" for p in range(n))

    corpus_docs = spark.createDataFrame(
        [(i, sentence(i)) for i in range(0, 8, 2)], "doc_id long, text string"
    )
    corpus_emb = spark.createDataFrame(
        [(i, _vec(i)) for i in range(0, 8, 2)], "doc_id long, embedding array<double>"
    )
    batch_rows = {
        101: sentence(101),                      # fresh -> admitted
        102: "  " + sentence(2).upper() + " ",   # exact copy of corpus 2
        103: sentence(4) + " zz",                # lexical near corpus 4
        104: " ".join(reversed(sentence(6).split())),  # semantic vs corpus 6
        105: sentence(105),                      # fresh, NO embedding -> pass-through
        106: sentence(101) + " qq",              # within-batch lexical pair w/ 101
    }
    batch_docs = spark.createDataFrame(
        sorted(batch_rows.items()), "doc_id long, text string"
    )
    batch_emb = spark.createDataFrame(
        [
            (101, _vec(101)),
            (103, _vec(103)),
            (104, _near(_vec(6))),  # near store embedding of corpus 6
            (106, _vec(106)),
        ],
        "doc_id long, embedding array<double>",
    )

    monkeypatch.setattr(
        C,
        "_incremental_curation_fixture",
        lambda spark_, sf_dir: (corpus_docs, corpus_emb, batch_docs, batch_emb),
    )
    rows = {
        r["doc_id"]: (r["admitted"], r["rejected_by"])
        for r in C.incremental_curation_admission(spark, "unused").collect()
    }
    assert rows == {
        101: (True, "none"),
        102: (False, "exact"),
        103: (False, "lexical"),
        104: (False, "semantic"),
        105: (True, "none"),      # no embedding: semantic tier passes through
        106: (False, "lexical"),  # within-batch pair keeps min id 101
    }
