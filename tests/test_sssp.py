"""Bounded SSSP: python twin, bound semantics, cycles, weight-vs-hop."""

from __future__ import annotations

import random

from osm_spark.text.sssp import sssp


def _twin(edges, seeds, rounds):
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in edges:
            if u in dist:
                c = dist[u] + w
                if v not in nxt or c < nxt[v]:
                    nxt[v] = c
        dist = nxt
    return dist


def _run(spark, edges, seeds, rounds):
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: r["dist"] for r in sssp(e, s, rounds).collect()
    }


def test_matches_twin_random(spark):
    rng = random.Random(31)
    edges = [
        (f"n{rng.randrange(20)}", f"n{rng.randrange(20)}", rng.randrange(1, 9))
        for _ in range(60)
    ]
    for rounds in (0, 1, 3, 6):
        got = _run(spark, edges, ["n0", "n7"], rounds)
        assert got == {
            str(k): v for k, v in _twin(edges, ["n0", "n7"], rounds).items()
        }, rounds


def test_cheap_long_path_beats_expensive_short(spark):
    edges = [("s", "a", 10), ("s", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    got = _run(spark, edges, ["s"], 3)
    assert got["a"] == 3  # s→b→c→a beats the direct weight-10 edge
    # under a 1-round bound only the expensive edge is reachable
    assert _run(spark, edges, ["s"], 1)["a"] == 10


def test_cycle_terminates_exactly(spark):
    edges = [("a", "b", 1), ("b", "a", 1)]
    got = _run(spark, edges, ["a"], 7)
    assert got == {"a": 0, "b": 1}
