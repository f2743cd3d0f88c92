"""Exact Jaccard join: brute differential across thresholds,
boundary inclusion, multiset→set semantics, prefix prune coverage."""

from __future__ import annotations

import random
from fractions import Fraction

from osm_spark.text.setjoin import jaccard_join


def _brute(rows, t):
    sets = {i: set(toks) for i, toks in rows if toks}
    out = []
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and Fraction(inter, union) >= t:
                out.append((a, b, len(sets[a]), len(sets[b]), inter))
    return sorted(out)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )


def test_matches_brute_across_thresholds(spark):
    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(60)]
    rows = [
        (i, rng.sample(vocab, rng.randrange(3, 16))) for i in range(80)
    ]
    df = _df(spark, rows)
    for num, den in ((1, 2), (3, 10), (4, 5)):
        got = sorted(
            map(tuple, jaccard_join(df, num, den).collect())
        )
        assert got == _brute(rows, Fraction(num, den)), (num, den)


def test_boundary_inclusive(spark):
    """jac exactly t must be KEPT (≥, integer cross-multiply —
    a float comparison could drop it)."""
    rows = [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c", "e"])]
    # inter 3, union 5 → exactly 3/5
    got = jaccard_join(_df(spark, rows), 3, 5).collect()
    assert len(got) == 1 and got[0]["n_inter"] == 3
    assert jaccard_join(_df(spark, rows), 61, 100).count() == 0


def test_multiset_input_uses_set_semantics(spark):
    rows = [(1, ["a", "a", "a", "b"]), (2, ["a", "b", "b"])]
    got = jaccard_join(_df(spark, rows), 1, 1).collect()
    assert len(got) == 1
    assert (got[0]["n_a"], got[0]["n_b"], got[0]["n_inter"]) == (2, 2, 2)


def test_identical_and_empty(spark):
    rows = [(1, ["x", "y"]), (2, ["x", "y"]), (3, []), (4, ["z"])]
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in jaccard_join(_df(spark, rows), 1, 1).collect()
    )
    assert got == [(1, 2)]


def test_prefix_prune_is_lossless_on_skew(spark):
    """A stopword shared by everything must not break completeness:
    rare-first ordering pushes it out of prefixes, but every true
    pair still surfaces (brute equality on a skewed corpus)."""
    rng = random.Random(4)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        toks = rng.sample(vocab, rng.randrange(4, 10)) + ["the"]
        rows.append((i, toks))
    df = _df(spark, rows)
    got = sorted(map(tuple, jaccard_join(df, 1, 2).collect()))
    assert got == _brute(rows, Fraction(1, 2))
