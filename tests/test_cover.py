"""Greedy max-coverage: python twin, tie rule, early stop, guarantees."""

from __future__ import annotations

import random

from osm_spark.text.cover import greedy_max_coverage


def _twin(rows, k):
    sets = {i: set(t) for i, t in rows}
    covered: set = set()
    out = []
    remaining = dict(sets)
    for _ in range(k):
        best = None
        for i in sorted(remaining):
            gain = len(sets[i] - covered)
            if best is None or gain > best[1]:
                best = (i, gain)
        if best is None or best[1] == 0:
            break
        covered |= sets[best[0]]
        out.append((best[0], best[1], len(covered)))
        del remaining[best[0]]
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>"
    )


def test_matches_twin_random(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(50)]
    rows = [
        (i, rng.sample(vocab, rng.randrange(2, 12))) for i in range(40)
    ]
    got = greedy_max_coverage(_df(spark, rows), 8)
    assert got == _twin(rows, 8)


def test_tie_to_lowest_id_and_early_stop(spark):
    rows = [
        (3, ["a", "b"]),
        (1, ["c", "d"]),   # same gain as 3 → picked first (lower id)
        (2, ["c", "d"]),   # fully redundant after 1
        (4, ["a"]),
    ]
    got = greedy_max_coverage(_df(spark, rows), 10)
    assert got == [(1, 2, 2), (3, 2, 4), (4, 0, 4)] or got == _twin(rows, 10)
    assert got == _twin(rows, 10)


def test_first_pick_is_largest_set(spark):
    rows = [(1, ["a"]), (2, ["a", "b", "c"]), (3, ["b"])]
    got = greedy_max_coverage(_df(spark, rows), 1)
    assert got == [(2, 3, 3)]
