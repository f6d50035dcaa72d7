"""Benchmark decontamination: flag corpus documents that overlap an
evaluation set's n-grams (train/test contamination is the classic failure
mode of web-scale training corpora; the standard defence is n-gram
overlap against the benchmark suite).

100 TB design: the benchmark side is an eval set — thousands of documents
against a 100 TB corpus — so its distinct-gram set is tiny and is
BROADCAST. Corpus grams are exploded map-side and matched against the
broadcast set with a left join that never shuffles the corpus; the single
shuffle is the per-document aggregate, which partial-combines map-side.
A corpus-vs-benchmark join on raw text or a gram-to-gram shuffle join
would both be 1000x more expensive at scale — deliberately avoided.

Beyond the reference surface — part of the LLM-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.lsh import word_shingles


def benchmark_gram_set(benchmark: DataFrame, text_col: str = "text",
                       k: int = 5) -> DataFrame:
    """Distinct word k-grams across the whole benchmark set (column ``g``)."""
    return benchmark.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("g")
    ).distinct()


def contamination_profile(corpus: DataFrame, benchmark: DataFrame, *,
                          id_col: str = "doc_id", text_col: str = "text",
                          k: int = 5, min_shared: int = 5) -> DataFrame:
    """Per-corpus-document overlap with the benchmark gram set.

    Returns (id_col, n_grams, n_shared_grams, contamination_ratio,
    is_contaminated). ``n_grams`` counts the document's DISTINCT k-grams
    (word_shingles is set-semantics), so the ratio is the fraction of the
    document's distinct grams that appear anywhere in the benchmark.
    Empty documents still surface one row (their single empty gram).
    """
    bench = benchmark_gram_set(benchmark, text_col, k)
    grams = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("g")
    )
    marked = grams.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "g", "left"
    )
    prof = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__hit").alias("n_shared_grams"),  # count skips the null misses
    )
    return prof.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_shared_grams"),
        F.round(
            F.col("n_shared_grams").cast("double") / F.col("n_grams"), 6
        ).alias("contamination_ratio"),
        (F.col("n_shared_grams") >= min_shared).cast("int").alias("is_contaminated"),
    )
