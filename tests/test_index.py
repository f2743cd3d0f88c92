"""Inverted index + conjunctive retrieval tests."""

import pytest

from osm_spark.text.index import conjunctive_search, inverted_index


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog ate the cat food"),
    (3, "a mat. A MAT!"),
]


def test_inverted_index_postings(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index(df).collect()
    }
    assert got["the"] == (2, "1:2,2:2")
    assert got["mat"] == (2, "1:1,3:2")  # case/punct folded, tf exact
    assert got["cat"] == (2, "1:1,2:1")
    assert got["a"] == (1, "3:2")


def test_inverted_index_max_df_cut(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    toks = {r["token"] for r in inverted_index(df, max_df=1).collect()}
    assert "the" not in toks and "cat" not in toks and "mat" not in toks
    assert "dog" in toks and "a" in toks


def test_conjunctive_search_all_terms_required(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["total_tf"]
        for r in conjunctive_search(df, ["the", "cat"]).collect()
    }
    assert got == {1: 3, 2: 3}
    assert conjunctive_search(df, ["the", "zebra"]).count() == 0


def test_conjunctive_search_case_and_duplicate_terms(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, conjunctive_search(df, ["CAT", "cat"]).collect()))
    b = sorted(map(tuple, conjunctive_search(df, ["cat"]).collect()))
    assert a == b == [(1, 1), (2, 1)]


def test_postings_partitioning_invariant(spark):
    docs = [(i, f"tok{i % 5} tok{i % 3} x") for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = sorted(map(tuple, inverted_index(df.repartition(1)).collect()))
    b = sorted(map(tuple, inverted_index(df.repartition(16)).collect()))
    assert a == b


def _bm25_twin(docs, terms, k1=1.2, b=0.75):
    """Pure-python BM25 twin (same formula, same rounding)."""
    import math
    import re

    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for d, s in docs
    }
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dft = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        s, hit = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hit += 1
            idf = math.log(1.0 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            s += (
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl))
            )
        if hit:
            out[d] = (round(s, 6), hit)
    return out


def test_bm25_search_matches_python_twin(spark):
    from osm_spark.text.index import bm25_search

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["score"], r["n_terms"])
        for r in bm25_search(df, ["cat", "mat"], k=10).collect()
    }
    assert got == _bm25_twin(DOCS, ["cat", "mat"])
    # rare term beats common term; a doc holding BOTH tops the list
    ranked = [
        r["doc_id"]
        for r in bm25_search(df, ["cat", "mat"], k=10).collect()
    ]
    assert ranked[0] == 1  # the only doc with both query terms


def test_bm25_search_top_k_cut_is_deterministic(spark):
    from osm_spark.text.index import bm25_search

    docs = [(i, f"common tok{i % 4}") for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = bm25_search(df, ["common"], k=7).collect()
    assert len(rows) == 7
    # all 30 docs tie on score -> the cut must fall back to doc_id ASC
    assert [r["doc_id"] for r in rows] == list(range(7))
