"""Every registry query must hash-match its DuckDB oracle — this is a local
replica of the driver's t2 correctness gate (run at sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import os

import pytest

from dynamic_etl_spark.registry import all_queries
from tests.conftest import SF_SMALL
from tests.parity import compare, run_oracle

SF_DIR = os.environ.get("PARITY_SF_DIR", SF_SMALL)
REGISTRY = all_queries()
ORACLE_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, name):
    query = REGISTRY[name]
    result = compare(name, query.fn(spark, SF_DIR), run_oracle(query.oracle, SF_DIR))
    assert result.ok, str(result)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_driver_window_holds_the_r9_rotation():
    """The driver hash-checks only the first DRIVER_WINDOW registered
    queries. The r9 window (VERDICT r8 #1): every query that ships or
    changes code this round takes a hard-signal slot first, then 45 of
    the 46 queries whose latest driver confirmation is r5-era (rotation
    hygiene: no confirmation older than 3 rounds; generator_stores
    defers to r10); every windowed query is oracle-backed; everything
    rotated out stays hash-checked by this local harness."""
    from dynamic_etl_spark.registry import DRIVER_WINDOW, _ROTATED_OUT

    window = list(REGISTRY)[:DRIVER_WINDOW]
    for name in (
        # new r9, never driver-confirmed
        "incremental_semantic_dedup",
        "incremental_curation_admission",
        # converted in place r9 (12dp log-prob quantization pre-sum)
        "bigram_perplexity_profile",
        # changed code/surface this round: must re-earn the hash
        "url_filter_profile",                      # scrub boundary fix
        "approx_distinct_exacthash",               # hll_p in state
        "distinct_sketch_maintenance_exacthash",   # hll_p in state
        "incremental_near_dup_exacthash",          # admit_batch factored
        # representatives of the 45 freshened r5-era confirmations
        "benchmark_decontamination_bloom",
        "events_funnel_conversion",
        "embedding_int8_quant",
        "corpus_mixture_sample",
        "document_chunking",
        "events_rolling_user_value",
        "semantic_dedup_survivors",
        "tfidf_top_terms",
        "vocabulary_build",
    ):
        assert name in window, f"{name} fell outside the driver correctness window"
    # a rows-only query in the window would waste a hash slot
    assert all(REGISTRY[n].oracle is not None for n in window)
    stale = set(window) & set(_ROTATED_OUT)
    assert not stale, f"rotated-out queries occupy window slots: {sorted(stale)}"


def test_driver_window_is_fully_oracle_backed():
    """A rows-only query inside the window wastes a hard-signal slot."""
    from dynamic_etl_spark.registry import DRIVER_WINDOW

    window = list(REGISTRY.items())[:DRIVER_WINDOW]
    missing = [n for n, q in window if q.oracle is None]
    assert not missing, f"windowed queries without oracles: {missing}"


#: The r8 policy: a rows-only query exists ONLY as the cheaper
#: engine-hash/float PRODUCTION twin of an oracle-backed sibling, or
#: because its accumulation is genuinely cross-engine-irreproducible
#: (libm transcendentals; merge-tree-dependent sketch content). A new
#: rows-only query must either name its oracle-backed twin here or
#: document why no twin can exist — "rows-only because oracles are
#: hard" stopped being a reason this round.
_ROWS_ONLY_TWINS = {
    "minhash_near_dup": "minhash_near_dup_exacthash",
    "incremental_near_dup": "incremental_near_dup_exacthash",
    "simhash_near_dup": "simhash_near_dup_exacthash",
    "embedding_ann_lsh": "embedding_ann_lsh_exacthash",
    "embedding_ann_ivf": "embedding_ann_ivf_exacthash",
    "embedding_knn_join": "embedding_knn_join_exacthash",
    "embedding_density_profile": "embedding_density_exacthash",
    "approx_distinct_profile": "approx_distinct_exacthash",
    "distinct_sketch_maintenance": "distinct_sketch_maintenance_exacthash",
    "events_type_pagerank": "events_type_pagerank_exacthash",
    # the KLL content is merge-tree-dependent by design, but its
    # deterministic finalize arithmetic is carved out and oracle-backed
    "rank_sketch_maintenance": "rank_sketch_finalize_exact",
}
_ROWS_ONLY_BLOCKED = {
    # A-ES priorities are u^(1/w): pow() in the accumulation itself —
    # and unlike the perplexity case (converted in place r9: its 12dp
    # quantization happens BEFORE the sum), the pow feeds a per-row
    # ORDERING, so quantizing it would change which rows are sampled
    "corpus_weighted_sample",
}


def test_every_rows_only_query_has_a_twin_or_a_documented_block():
    """Pin the exacthash policy: the rows-only set must exactly equal
    the declared production twins + the documented libm blocks, and
    every named twin must itself be oracle-backed."""
    assert set(ROWS_ONLY) == set(_ROWS_ONLY_TWINS) | _ROWS_ONLY_BLOCKED, (
        "rows-only set drifted — a new rows-only query needs an "
        "oracle-backed twin or a documented cross-engine blocker"
    )
    for prod, twin in _ROWS_ONLY_TWINS.items():
        assert REGISTRY[twin].oracle is not None, (prod, twin)
