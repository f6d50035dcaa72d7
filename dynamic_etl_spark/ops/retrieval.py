"""Lexical retrieval ranking — BM25 top-k over a document corpus.

The training-data curation loop this serves is targeted retrieval:
"find the documents most relevant to these probe queries" (quality
auditing a mixture, pulling domain exemplars, spot-checking a dedup
survivor set). The reference engine has no retrieval ranker; this is a
beyond-reference LLM-pipeline operator in the ops/quality.tfidf_topk
family (same tokenizer, same ln-at-12dp parity discipline, same
total-ordered ranks).

Scale shape (100 TB): the query set is a bounded mini-dim (broadcast —
it never shuffles the corpus on anything but its natural keys); tf is
one explode + codegen partial agg; document frequency is computed on
the QUERY-MATCHED slice only (a broadcast semi join prunes the corpus
vocabulary to |query terms| before the term-key agg); per-(query, doc)
scores aggregate exact decimals so the ranking is partition- and
engine-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.text import token_count, tokens

#: Okapi BM25 defaults (Robertson & Zaragoza 2009, the canonical values).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` documents per query under Okapi BM25 with the
    Lucene-style always-positive idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (public knowledge; Robertson & Zaragoza 2009 §3.3). Query-term
    multiplicity is ignored (DISTINCT query terms — the common
    short-query simplification; the optional k3 saturation term is a
    no-op for the probe-query use case this serves).

    Surface: ``(query_id, rank, doc_id, n_hit_terms, bm25)`` — ranks
    total-ordered by (score DESC, doc_id ASC), score rounded to 6dp.

    Determinism/parity (repo float rules): each per-term contribution is
    one double product of idf (libm ln, quantized at 12dp BEFORE the sum
    — the bigram_perplexity_profile discipline) and a tf factor that is
    pure IEEE arithmetic on integers and one shared double (avgdl); the
    per-pair score sums those decimal(38,12) terms exactly, so ordering
    by the decimal sum is partition- and engine-invariant. ``avgdl`` is
    total tokens / N — two exact bigints, one correctly-rounded IEEE
    division, identical in Python and SQL.

    Plan: tf (ONE explode + codegen partial agg — the only corpus-sized
    shuffle) -> broadcast prune to query terms -> document frequency as
    a COUNT window over the pruned slice (tf_q rows are unique per
    (doc, term), so the per-term window count IS df — no second
    corpus-vocabulary aggregation, no join-back) -> join doc lengths
    (a plain projection of the corpus, never an aggregate) -> (query,
    doc) exact-decimal agg -> per-query window top-k. Every subtree has
    ONE consumer, so nothing is recomputed and nothing needs an eager
    checkpoint (Spark cannot reuse exchanges under higher-order-function
    lambdas — their variable ids defeat plan canonicalization — so a
    shared tf would silently double the corpus pass; measured r10).
    """
    # bounded scalars (high-water-mark convention): corpus size + total
    # token count in ONE pass; avgdl is their IEEE quotient, embedded as
    # a literal so both engines share the exact double
    n_docs, total_tokens = docs.select(
        F.count(F.lit(1)), F.coalesce(F.sum(token_count(F.col(text_col))), F.lit(0))
    ).first()
    if n_docs == 0 or total_tokens == 0:
        raise ValueError("bm25_topk: empty corpus (no documents or no tokens)")
    avgdl = total_tokens / n_docs

    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # doc length is a projection of the corpus, NOT an aggregate of tf —
    # tf then has exactly one consumer and the corpus tokenizes into a
    # shuffle once
    dl = docs.select(F.col(id_col), token_count(F.col(text_col)).alias("dl"))

    qterms = queries.select(
        F.col(query_id_col), F.explode(tokens(F.col(query_text_col))).alias("term")
    ).distinct()
    qvocab = qterms.select("term").distinct()

    tf_q = tf.join(F.broadcast(qvocab), on="term")
    # tf_q rows are unique per (doc, term), so this window count IS the
    # document frequency — over the query-pruned slice, never the corpus
    # vocabulary
    tf_qd = tf_q.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )

    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_factor = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.lit(avgdl)))
    )
    contrib = F.round(idf * tf_factor, 12).cast("decimal(38,12)")

    scored = (
        tf_qd.join(dl, on=id_col)
        .join(F.broadcast(qterms), on="term")
        .select(query_id_col, id_col, contrib.alias("__c"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__c").alias("__s"), F.count(F.lit(1)).alias("n_hit_terms"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__s"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            query_id_col,
            "rank",
            id_col,
            "n_hit_terms",
            F.round(F.col("__s").cast("double"), 6).alias("bm25"),
        )
    )
