"""Document-quality operators: Gopher-style repetition gates and TF-IDF.

Re-expresses the repetition / quality-filter heuristics published for the
Gopher corpus (Rae et al. 2021, "Scaling Language Models", appendix A1.1)
and classic TF-IDF term weighting as native Spark plans over the
``documents`` table. The reference repo has no document layer; these
extend the engine's LLM-training-data surface (text analysis is a
first-class component of the driver brief).

Scale design (SCALE.md): n-gram and term statistics run explode ->
codegen partial aggregation — never interpreted loops over large arrays.
The only higher-order call is the n-gram *construction* over one
document's token array (bounded by the word-count gate itself); counting,
distinct and top-frequency all happen post-explode where Tungsten does
map-side partial aggregation. Skew per (doc_id, gram) key is bounded by
document length. TF-IDF's document-frequency join shuffles on the term —
the natural key — and the corpus size N is the one bounded driver-side
scalar (high-water-mark pattern, allowed by repo convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.text import tokens

#: Gopher A1.1 thresholds (published). Word-count and mean-word-length
#: bounds are verbatim; the n-gram fractions are adapted from
#: "fraction of characters" to "fraction of n-gram occurrences" (cheaper
#: at scale — no char-weighted recount — and monotonically related).
GATE_MIN_WORDS = 50
GATE_MAX_WORDS = 100_000
GATE_MIN_MEAN_WORD_LEN = 3.0
GATE_MAX_MEAN_WORD_LEN = 10.0
GATE_MAX_SYMBOL_WORD_RATIO = 0.1
GATE_MAX_TOP_2GRAM_FRAC = 0.20
GATE_MAX_DUP_3GRAM_FRAC = 0.18


def ngram_stats(df: DataFrame, n: int, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document word n-gram statistics.

    Returns one row per input row (docs with < n tokens get zeros):
    ``total_{n}grams``, ``distinct_{n}grams``, ``top_{n}gram_count``.

    Plan: build the n-gram array per row (small, interpreted transform —
    the one place CLAUDE.md's explode-first rule doesn't pay, because the
    gram STRING must exist before it can be a shuffle key), explode, then
    two codegen aggregations: count per (id, gram), then
    sum/count/max per id. Both shuffles are on keys the data itself
    bounds: one document's grams land in one group.
    """
    toks = tokens(F.col(text_col))
    gram = F.when(
        F.size(toks) >= n,
        F.transform(
            # sequence(1, size-n+1) is ascending only when size >= n —
            # guarded by the WHEN (sequence defaults to step -1 otherwise).
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            _gram_at(toks, n),
        ),
    ).otherwise(F.array().cast("array<string>"))

    exploded = df.select(F.col(id_col), F.explode(gram).alias("__gram"))
    per_gram = exploded.groupBy(id_col, "__gram").agg(F.count("*").alias("__c"))
    stats = per_gram.groupBy(id_col).agg(
        F.sum("__c").alias(f"total_{n}grams"),
        F.count("*").alias(f"distinct_{n}grams"),
        F.max("__c").alias(f"top_{n}gram_count"),
    )
    base = df.select(id_col)
    out = base.join(stats, on=id_col, how="left")
    return out.select(
        id_col,
        F.coalesce(f"total_{n}grams", F.lit(0)).alias(f"total_{n}grams"),
        F.coalesce(f"distinct_{n}grams", F.lit(0)).alias(f"distinct_{n}grams"),
        F.coalesce(f"top_{n}gram_count", F.lit(0)).alias(f"top_{n}gram_count"),
    )


def _gram_at(toks, n: int):
    """Closure helper: CLAUDE.md lambda trap — F.transform's 2-arg lambda
    receives the element INDEX as arg 2, so ``n`` must be closed over
    here, never passed as a lambda default."""

    def build(i):
        parts = [F.element_at(toks, i + j) for j in range(n)]
        return F.concat_ws(" ", *parts)

    return build


def repetition_profile(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style per-document quality profile + boolean gates.

    Columns: token/char stats, repetition fractions (rounded 6dp), one
    boolean per published gate, and ``passes_gopher`` (AND of all).
    Emits flags rather than filtering so downstream curation can count,
    stratify, or drop per policy (same contract as ops/pii.py).
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    # total non-whitespace chars / tokens: exact mean word length without
    # an interpreted per-token length pass.
    nonws = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"))

    base = df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        F.round(
            F.when(n_tokens > 0, nonws.cast("double") / n_tokens).otherwise(0.0), 6
        ).alias("mean_word_len"),
        F.round(
            F.when(n_tokens > 0, n_symbols.cast("double") / n_tokens).otherwise(0.0), 6
        ).alias("symbol_word_ratio"),
    )
    g2 = ngram_stats(df, 2, id_col=id_col, text_col=text_col)
    g3 = ngram_stats(df, 3, id_col=id_col, text_col=text_col)
    prof = (
        base.join(g2, on=id_col)
        .join(g3, on=id_col)
        .select(
            id_col,
            "n_tokens",
            "mean_word_len",
            "symbol_word_ratio",
            _frac("top_2gram_count", "total_2grams").alias("top_2gram_frac"),
            _dup_frac("total_3grams", "distinct_3grams").alias("dup_3gram_frac"),
        )
    )
    c = F.col
    return prof.select(
        "*",
        c("n_tokens").between(GATE_MIN_WORDS, GATE_MAX_WORDS).alias("gate_word_count"),
        c("mean_word_len")
        .between(GATE_MIN_MEAN_WORD_LEN, GATE_MAX_MEAN_WORD_LEN)
        .alias("gate_mean_word_len"),
        (c("symbol_word_ratio") <= GATE_MAX_SYMBOL_WORD_RATIO).alias("gate_symbol_ratio"),
        (c("top_2gram_frac") <= GATE_MAX_TOP_2GRAM_FRAC).alias("gate_top_2gram"),
        (c("dup_3gram_frac") <= GATE_MAX_DUP_3GRAM_FRAC).alias("gate_dup_3gram"),
    ).select(
        "*",
        (
            c("gate_word_count")
            & c("gate_mean_word_len")
            & c("gate_symbol_ratio")
            & c("gate_top_2gram")
            & c("gate_dup_3gram")
        ).alias("passes_gopher"),
    )


def _frac(num: str, den: str):
    return F.round(
        F.when(F.col(den) > 0, F.col(num).cast("double") / F.col(den)).otherwise(0.0), 6
    )


def _dup_frac(total: str, distinct: str):
    return F.round(
        F.when(
            F.col(total) > 0,
            (F.col(total) - F.col(distinct)).cast("double") / F.col(total),
        ).otherwise(0.0),
        6,
    )


def tfidf_topk(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
               k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (smoothed idf: ln((N+1)/(df+1))+1,
    the scikit-learn 'smooth_idf' formulation — public knowledge).

    Plan: explode tokens -> tf per (doc, term) [codegen partial agg] ->
    document frequency per term [second agg on the term key — already
    co-partitioned with the df-join that follows, so AQE coalesces the
    exchange] -> window top-k per doc. N is a bounded driver-side scalar.
    Ranking is total-ordered (score desc, term asc) per repo convention.
    """
    n_docs = df.count()  # bounded scalar (high-water-mark pattern)
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(docfreq, on="term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        (
            F.col("tf")
            * (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0)
        ).alias("__score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", F.round("__score", 6).alias("tfidf"))
    )
