"""k-core: python-twin fixpoint, classic shapes, order independence."""

from __future__ import annotations

import random

from osm_spark.text.kcore import k_core, k_core_nodes


def _twin(pairs, k):
    und = {tuple(sorted(map(str, p))) for p in pairs if p[0] != p[1]}
    while True:
        deg: dict[str, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        weak = {n for n, d in deg.items() if d < k}
        if not weak:
            return sorted(und)
        nxt = {e for e in und if e[0] not in weak and e[1] not in weak}
        if nxt == und:
            return sorted(und)
        und = nxt


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def test_classic_shapes(spark):
    import itertools

    k5 = list(itertools.combinations(range(5), 2))
    tail = [(0, 100), (100, 101), (101, 102)]
    got = sorted(map(tuple, k_core(_df(spark, k5 + tail), 3).collect()))
    assert got == _twin(k5 + tail, 3)  # the K5 survives, the tail peels
    assert len(got) == 10
    # a tree has no 2-core
    tree = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]
    assert k_core(_df(spark, tree), 2).count() == 0


def test_cascade_peel(spark):
    """A chain hanging off a triangle peels over MULTIPLE rounds —
    the fixpoint, not one round, is the contract."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)]
    got = sorted(map(tuple, k_core(_df(spark, pairs), 2).collect()))
    assert got == [("0", "1"), ("0", "2"), ("1", "2")]


def test_random_matches_twin_and_nodes(spark):
    rng = random.Random(23)
    pairs = {(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(90)}
    df = _df(spark, sorted(pairs))
    for k in (2, 3, 4):
        got = sorted(map(tuple, k_core(df, k).collect()))
        assert got == _twin(sorted(pairs), k), k
    nodes = {r["node"]: r["core_deg"] for r in k_core_nodes(df, 3).collect()}
    assert all(d >= 3 for d in nodes.values())
