"""text/lm.py — char n-gram LM training + micro-nat scoring."""

import math

from pyspark.sql import functions as F

from osm_spark.text.lm import score_docs, train_char_lm


def test_model_closed_form(spark):
    # corpus "ababa": grams aba, bab, aba → c(aba)=2, c(bab)=1
    ref = spark.createDataFrame([(1, "ababa")], "doc_id long, text string")
    m = {r["gram"]: r for r in train_char_lm(ref, order=3).collect()}
    assert set(m) == {"aba", "bab"}
    N, V = 3, 2  # retained occurrences / vocab
    assert m["aba"]["N"] == N and m["aba"]["V"] == V
    assert m["aba"]["logp_micro"] == round(math.log((2 + 1) / (N + V + 1)) * 1e6)
    assert m["bab"]["logp_micro"] == round(math.log((1 + 1) / (N + V + 1)) * 1e6)


def test_score_closed_form_with_oov(spark):
    ref = spark.createDataFrame([(1, "ababa")], "doc_id long, text string")
    model = train_char_lm(ref, order=3)
    docs = spark.createDataFrame(
        [(10, "abaz"), (11, "ab")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in score_docs(docs, model, order=3).collect()}
    # "abaz": grams aba (in-vocab), baz (OOV)
    N, V = 3, 2
    lp_aba = round(math.log(3 / (N + V + 1)) * 1e6)
    lp_oov = round(math.log(1 / (N + V + 1)) * 1e6)
    r = rows[10]
    assert (r["n_grams"], r["n_oov"]) == (2, 1)
    assert abs(r["avg_logp"] - (lp_aba + lp_oov) / 2e6) < 1e-12
    # doc shorter than the order: zero grams, null score
    assert rows[11]["n_grams"] == 0 and rows[11]["avg_logp"] is None


def test_top_v_truncation_deterministic(spark):
    ref = spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd")], "doc_id long, text string"
    )
    m4 = train_char_lm(ref, order=3, top_v=4)
    assert m4.count() == 4
    # tie-break is (count DESC, gram ASC): 'aa ' ties with many
    # 1-count grams; lexicographically smallest grams survive
    grams = sorted(r["gram"] for r in m4.collect())
    m4b = sorted(r["gram"] for r in train_char_lm(ref, order=3, top_v=4).collect())
    assert grams == m4b  # rerun-stable


def test_in_distribution_scores_higher(spark):
    en = "the quick brown fox jumps over the lazy dog and runs away "
    ref = spark.createDataFrame(
        [(i, en * 3) for i in range(10)], "doc_id long, text string"
    )
    model = train_char_lm(ref, order=3)
    docs = spark.createDataFrame(
        [(1, "the brown dog jumps over the fox "), (2, "zxqj vwkp ffgh qqzx mmnb ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["avg_logp"] for r in score_docs(docs, model).collect()}
    assert rows[1] > rows[2]  # reference-like text is likelier
