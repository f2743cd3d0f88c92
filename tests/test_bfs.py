"""Bounded-depth BFS (osm_spark/text/bfs.py) vs a python twin on a
cyclic deterministic graph."""

from __future__ import annotations

import hashlib
from collections import deque

import pytest

from osm_spark.text.bfs import bfs_depths


def _graph(n=60):
    """Deterministic sparse digraph WITH cycles (md5 fan-out)."""
    edges = []
    for i in range(n):
        h = hashlib.md5(f"bfs-{i}".encode()).hexdigest()
        for j in range(2):
            dst = int(h[j * 6:(j + 1) * 6], 16) % n
            if dst != i:
                edges.append((f"n{i}", f"n{dst}"))
    return sorted(set(edges))


def _twin(seeds, edges, max_depth):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_depth:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.mark.parametrize("max_depth", [0, 2, 8])
def test_matches_python_bfs(spark, max_depth):
    edges = _graph()
    seeds = ["n0", "n7", "n13"]
    edf = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "url string")
    got = {
        r["url"]: r["depth"]
        for r in bfs_depths(sdf, edf, max_depth).collect()
    }
    assert got == _twin(seeds, edges, max_depth)


def test_cycle_terminates_and_min_depth(spark):
    # a -> b -> c -> a cycle plus a longer alternative route a -> d -> c
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "c")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([("a",)], "url string")
    got = {
        r["url"]: r["depth"] for r in bfs_depths(sdf, edf, 8).collect()
    }
    assert got == {"a": 0, "b": 1, "d": 1, "c": 2}


def test_early_exit_and_guard(spark):
    edf = spark.createDataFrame([("x", "y")], "src string, dst string")
    sdf = spark.createDataFrame([("z",)], "url string")  # isolated seed
    got = bfs_depths(sdf, edf, 8).collect()
    assert [(r["url"], r["depth"]) for r in got] == [("z", 0)]
    with pytest.raises(ValueError):
        bfs_depths(sdf, edf, -1)
