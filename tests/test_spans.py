"""ExactSubstr duplicated-span removal: planted-fixture semantics.

The oracle-parity harness hash-checks `duplicated_span_removal` against
DuckDB at both SFs; these tests pin the SEMANTICS on a hand-built corpus
where the correct spans are known by construction — cross-document runs,
within-document repeats (ExactSubstr counts those), the overlap-merge
boundary (starts exactly k apart do NOT merge), and the short-doc guard.
"""

from __future__ import annotations

from dynamic_etl_spark.ops.spans import duplicated_span_stats

K = 5


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicated_span_stats(df, k=K)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_cross_document_shared_run(spark):
    # A and B share the 8-token run a..h; with k=5 the duplicated
    # 5-gram starts are 0..3 in A and 2..5 in B -> one merged span of
    # 8 tokens in each; everything else is unique vocabulary.
    got = _run(
        spark,
        [
            ("A", "a b c d e f g h x1 x2"),
            ("B", "z1 z2 a b c d e f g h"),
        ],
    )
    assert got["A"] == {
        "doc_id": "A",
        "n_tokens": 10,
        "n_dup_spans": 1,
        "n_dup_tokens": 8,
        "dup_token_frac": 0.8,
        "cleaned_text": "x1 x2",
    }
    assert got["B"]["n_dup_tokens"] == 8
    assert got["B"]["cleaned_text"] == "z1 z2"


def test_within_document_repeat_and_merge_boundary(spark):
    # "p q r s t u" repeated back-to-back: duplicated starts {0,1,6,7}.
    # 6 > 1 + (k-1) = 5, so the islands [0,5] and [6,11] do NOT merge —
    # two spans covering the whole document.
    got = _run(spark, [("C", "p q r s t u p q r s t u")])
    c = got["C"]
    assert c["n_dup_spans"] == 2
    assert c["n_dup_tokens"] == 12
    assert c["dup_token_frac"] == 1.0
    assert c["cleaned_text"] == ""


def test_unique_and_short_docs_pass_through(spark):
    got = _run(
        spark,
        [
            ("D", "w1 w2 w3 w4 w5 w6 w7"),
            ("E", "t1 t2 t3"),  # < k tokens: no windows at all
        ],
    )
    for doc, text in (("D", "w1 w2 w3 w4 w5 w6 w7"), ("E", "t1 t2 t3")):
        assert got[doc]["n_dup_spans"] == 0
        assert got[doc]["n_dup_tokens"] == 0
        assert got[doc]["dup_token_frac"] == 0.0
        assert got[doc]["cleaned_text"] == text


def test_normalization_is_the_token_stream(spark):
    # cleaned_text is the lowercased single-space token reconstruction —
    # the same normalization every token statistic uses.
    got = _run(spark, [("F", "  Mixed\tCase   words\nhere now ")])
    assert got["F"]["cleaned_text"] == "mixed case words here now"
    assert got["F"]["n_tokens"] == 5
