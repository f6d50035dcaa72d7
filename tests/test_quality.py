"""Unit tests for the document-quality layer (ops/quality.py) and the
funnel operator: crafted fixtures with hand-computed truths. The sf0.01
oracle parity for the registry twins lives in test_oracle_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from dynamic_etl_spark.ops import quality as Q
from dynamic_etl_spark.registry.events import funnel_conversion


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_ngram_stats_counts_duplicates(spark):
    # "a b a b a": 2-grams = [a b, b a, a b, b a] -> total 4, distinct 2, top 2
    df = _docs(spark, ["a b a b a"])
    row = Q.ngram_stats(df, 2).collect()[0]
    assert (row.total_2grams, row.distinct_2grams, row.top_2gram_count) == (4, 2, 2)


def test_ngram_stats_short_doc_zeros(spark):
    # 1 token < n=2: the WHEN guard must yield an empty array (unguarded
    # sequence(1, 0) would run DESCENDING and fabricate grams)
    df = _docs(spark, ["solo"])
    row = Q.ngram_stats(df, 2).collect()[0]
    assert (row.total_2grams, row.distinct_2grams, row.top_2gram_count) == (0, 0, 0)


def test_repetition_profile_gates(spark):
    loop = "spam ham " * 40          # 80 tokens, one 2-gram dominates
    clean = " ".join(f"tokn{i:03d}" for i in range(60))  # 60 distinct 8-char tokens
    rows = {
        r.doc_id: r for r in Q.repetition_profile(_docs(spark, [loop, clean])).collect()
    }
    assert rows[0].gate_word_count and not rows[0].gate_top_2gram
    assert rows[0].dup_3gram_frac > Q.GATE_MAX_DUP_3GRAM_FRAC
    assert not rows[0].passes_gopher
    # "spam ham spam ham ...": 79 2-grams, 40x "spam ham" -> 40/79
    assert rows[0].top_2gram_frac == round(40 / 79, 6)
    assert rows[1].passes_gopher
    assert rows[1].mean_word_len == 7.0 and rows[1].dup_3gram_frac == 0.0


def test_tfidf_topk_hand_computed(spark):
    df = _docs(spark, ["apple apple banana", "banana cherry", "cherry cherry date"])
    out = {
        (r.doc_id, r.rank): r for r in Q.tfidf_topk(df, k=2).collect()
    }
    # doc 0: apple tf=2 df=1, banana tf=1 df=2
    idf = lambda d: math.log(4.0 / (d + 1.0)) + 1.0  # noqa: E731
    assert out[(0, 1)].term == "apple"
    assert out[(0, 1)].tfidf == round(2 * idf(1), 6)
    assert out[(0, 2)].term == "banana"
    assert out[(0, 2)].tfidf == round(1 * idf(2), 6)
    # doc 2: cherry tf=2 beats date tf=1 (same df=1 would tie on term asc)
    assert out[(2, 1)].term == "cherry" and out[(2, 2)].term == "date"


def test_tfidf_rank_tiebreak_is_term_order(spark):
    # both terms tf=1, df=1 -> identical score; rank must break by term asc
    out = Q.tfidf_topk(_docs(spark, ["zeta alpha"]), k=2).collect()
    ranked = sorted((r.rank, r.term) for r in out)
    assert ranked == [(1, "alpha"), (2, "zeta")]


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=f"2024-01-01 00:0{s}:00", event_type=e) for u, s, e in rows]
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")


def test_funnel_orders_stages_strictly(spark):
    rows = [
        # user 1: full funnel in order
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # user 2: click BEFORE first view -> not clicked_after_view
        (2, 1, "click"), (2, 2, "view"),
        # user 3: purchase before click -> viewed+clicked but no funnel purchase
        (3, 1, "view"), (3, 2, "purchase"), (3, 3, "click"),
        # user 4: never viewed
        (4, 1, "signup"),
    ]
    got = funnel_conversion(_ev(spark, rows)).collect()[0]
    assert got.n_users == 4
    assert got.n_viewed == 3
    assert got.n_clicked_after_view == 2          # users 1 and 3
    assert got.n_purchased_after_funnel == 1      # user 1 only
    assert got.view_to_click_rate == round(2 / 3, 6)
    assert got.click_to_purchase_rate == 0.5
