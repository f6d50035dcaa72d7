"""Plan-shape regressions: the SCALE.md claims asserted against
executedPlan strings, so a refactor that silently degrades a plan (lost
pushdown, surprise cartesian, broadcast of a fact table) fails CI, not a
100 TB run."""

from __future__ import annotations

import pytest

from dynamic_etl_spark.registry import all_queries
from tests.conftest import SF_SMALL

REGISTRY = all_queries()


def _plan(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()


def test_scan_pushes_filters_and_prunes_columns(spark):
    plan = _plan(spark, "scan_projection_filter")
    assert "PushedFilters: [" in plan and "IsNotNull(l_extendedprice)" in plan
    # projection pruning: the untouched wide columns never reach the scan
    assert "l_comment" not in plan and "l_returnflag" not in plan


def test_flagship_broadcasts_constant_dims_only(spark):
    plan = _plan(spark, "flagship_star_join")
    # nation/region arrive via broadcast exchange
    assert "BroadcastHashJoin" in plan
    # fact-to-fact edge must never be a cartesian/nested-loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_date_lookup_broadcasts_the_calendar(spark):
    plan = _plan(spark, "date_key_lookup")
    assert "BroadcastHashJoin" in plan


def test_minhash_has_partial_aggregation_and_no_cartesian(spark):
    plan = _plan(spark, "minhash_near_dup")
    assert "partial_min" in plan  # map-side combine of signature slots
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["embedding_near_dup", "embedding_ann_lsh"])
def test_srp_signature_is_codegen_aggregated(spark, name):
    # SRP signatures must stay on the explode + sum-aggregate path
    # (map-side combine); a refactor back to interpreted array lambdas
    # loses partial aggregation and was measured 4x slower at sf0.1
    plan = _plan(spark, name)
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_scd1_merge_shuffles_on_natural_key(spark):
    plan = _plan(spark, "scd1_merge_orders")
    assert "FullOuter" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "embedding_topk_bruteforce")
    # the deliberate nested-loop builds on the (small) query side
    assert "BroadcastNestedLoopJoin BuildRight" in plan


#: The CLAUDE.md cross-join rule's full whitelist: the deliberate
#: brute-force-ANN broadcast NLJ plus documented 1-row broadcast anchors.
#: Everything else must plan with neither CartesianProduct NOR
#: BroadcastNestedLoopJoin (a condition-less broadcast join evades the
#: CartesianProduct grep — review r4 continuation).
_CROSS_JOIN_WHITELIST = (
    "embedding_topk_bruteforce",        # deliberate broadcast NLJ (small queries)
    "embedding_topk_vectorized",        # mapInPandas path
    "freshness_watermark",              # 1x1 crossJoin of two scalar aggs
    "simhash_near_dup",                 # 1-row broadcast anchor
    "benchmark_decontamination_bloom",  # 1-row bloom-words broadcast anchor
    "bigram_perplexity_profile",        # 1-row vocab-size broadcast anchor
    "semantic_decontamination",         # 1-row eval-set broadcast anchor
    "curation_pipeline_accounting",     # tier 5 IS semantic_decontamination's
                                        # 1-row eval-set broadcast anchor
    "curation_pipeline_lsh",            # same tier-5 anchor (the pair-source
                                        # swap lives behind the s3 checkpoint)
    "simhash_near_dup_exacthash",       # 1-row fingerprint anchor broadcast
    "embedding_margin_alignment",       # two brute cosine_topk passes =
                                        # the same deliberate broadcast NLJ
                                        # as embedding_topk_bruteforce (the
                                        # r11 _ivf sibling IS the bucketed
                                        # corpus-scale path, and its plan is
                                        # asserted NLJ-free in
                                        # test_retrieval.py; margins are
                                        # column algebra over any source)
    "hybrid_rrf_retrieval",             # the dense side is the same
                                        # deliberate brute cosine_topk NLJ
                                        # (8 pinned exemplar probes); the
                                        # fusion itself joins top-k lists
                                        # only
    "curated_corpus_retrieval",         # r12 fused pipeline: the same
                                        # 8-probe brute cosine_topk NLJ
                                        # as hybrid_rrf_retrieval, over
                                        # the (smaller) curated corpus
)


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in _CROSS_JOIN_WHITELIST)
)
def test_no_cartesian_anywhere(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_cascade_lsh_pair_source_has_no_all_pairs_join(spark):
    """VERDICT r7 #1 done-condition: the LSH-configured cascade's tier-3
    pair source compiles with ZERO all-pairs joins — every join is keyed
    on ids or (band_idx, band_hash), never on the (lang, source) block
    keys alone (the O(block²) shape). The exact source must still show
    that shape (it is the ground-truth twin and the detector's positive
    control). Asserted on the pair-source plans directly because the
    cascade's tiers run eagerly behind localCheckpoints and vanish from
    the composed query's final plan."""
    from dynamic_etl_spark.catalog import load_table
    from dynamic_etl_spark.registry.curation import (
        exact_blocked_pair_source,
        lsh_pair_source,
    )

    frame = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "source", "text"
    )

    def join_lines(src):
        plan = src(frame)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        return plan, [
            line
            for line in plan.splitlines()
            if any(
                j in line
                for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
            )
        ]

    lsh_plan, lsh_joins = join_lines(lsh_pair_source)
    assert "band_hash" in lsh_plan  # candidates meet on band buckets
    # block keys may appear WITH an id key (Catalyst folding the
    # same-block filter into an id-keyed join is fine); what must never
    # appear is a join keyed on the block columns alone
    for line in lsh_joins:
        assert not (
            ("lang#" in line or "__la#" in line) and "id_" not in line
        ), f"all-pairs block join in LSH pair source: {line.strip()}"

    _, exact_joins = join_lines(exact_blocked_pair_source)
    assert any(
        "lang#" in line and "id_" not in line.split("],")[0] for line in exact_joins
    ), "positive control: the exact source's block join should be visible"


def test_line_dedup_counts_partial_aggregate_and_quota_rank_pushdown(spark):
    """SCALE.md r3 claims: (a) the line-hash document count partial-
    aggregates map-side, so boilerplate hot hashes collapse BEFORE the
    shuffle; (b) the literal-quota window compiles with the
    WindowGroupLimit rank pushdown."""
    plan = _plan(spark, "line_dedup_profile")
    # two-phase aggregation on the line hash: the distinct-doc count must
    # compile with a partial_count below an exchange (not just any
    # partial aggregate somewhere in the plan)
    assert "partial_count" in plan and "Exchange" in plan
    assert "CartesianProduct" not in plan

    qplan = _plan(spark, "source_quota_cap")
    assert "WindowGroupLimit" in qplan


def test_rank_sketch_folds_once_per_state_op(spark):
    """The KLL query plans exactly 3 build pre-sketches (MapInPandas)
    and 5 per-key folds (3 builds + 2 merges, FlatMapGroupsInPandas).
    More means the finalize stage replicated the build/merge subtree
    per quantile — the regression the r5 one-pass conditional-agg
    finalize exists to prevent (it tripled the exchange count when each
    q filtered its own copy of the cumulative frame)."""
    plan = _plan(spark, "rank_sketch_maintenance")
    assert plan.count("MapInPandas") == 3, plan.count("MapInPandas")
    assert plan.count("FlatMapGroupsInPandas") == 5, plan.count("FlatMapGroupsInPandas")
    # the wide->long quantile stack stays a codegen generator, not a union
    assert "Generate stack" in plan or "stack(" in plan


def test_knn_join_cogroups_once_and_probes_without_shuffle(spark):
    """knn_join: ONE distributed probe pass (MapInPandas), ONE cogroup
    (FlatMapCoGroupsInPandas) — a second cogroup or a join-back of
    vectors would double the corpus traffic."""
    plan = _plan(spark, "embedding_knn_join")
    assert plan.count("FlatMapCoGroupsInPandas") == 1
    assert plan.count("MapInPandas") == 1
    assert "CartesianProduct" not in plan


def test_multimodal_decode_chain_is_two_arrow_stages(spark):
    """synthetic_media + extract_media_features: exactly two MapInPandas
    stages and no shuffle between them — the decode pipeline is
    partition-preserving end to end."""
    plan = _plan(spark, "multimodal_feature_extract")
    assert plan.count("MapInPandas") == 2
    assert "Exchange hashpartitioning" not in plan


def test_bpe_encode_segments_distinct_words_only(spark):
    """The corpus side of the encode must stay codegen: exactly one
    Arrow stage (distinct-word segmentation); a second one means the
    corpus rows started flowing through Python."""
    plan = _plan(spark, "bpe_encode_stats")
    assert plan.count("MapInPandas") == 1
