"""Skyline: brute twin, tie-group survival, orientation, partition
invariance, lossless local prune."""

from __future__ import annotations

import itertools
import random

import numpy as np

from osm_spark.operators.skyline import skyline, skyline_np


def _brute(rows, signs):
    out = []
    for a in rows:
        av = [s * x for s, x in zip(signs, a)]
        dominated = False
        for b in rows:
            bv = [s * x for s, x in zip(signs, b)]
            if all(y >= x for x, y in zip(av, bv)) and any(
                y > x for x, y in zip(av, bv)
            ):
                dominated = True
                break
        if not dominated:
            out.append(a)
    return sorted(out)


def test_kernel_matches_brute():
    rng = random.Random(5)
    for d in (1, 2, 3):
        rows = [
            tuple(rng.randrange(0, 12) for _ in range(d)) for _ in range(200)
        ]
        X = np.asarray(rows, dtype=np.int64)
        got = sorted(map(tuple, X[skyline_np(X)]))
        assert got == _brute(rows, [1] * d)


def test_ties_survive_together():
    X = np.asarray([[5, 5], [5, 5], [4, 6], [4, 4]], dtype=np.int64)
    keep = skyline_np(X)
    assert keep.tolist() == [True, True, True, False]


def test_spark_matches_brute_and_partitioning(spark):
    rng = random.Random(17)
    rows = [
        (i, rng.randrange(0, 30), rng.randrange(0, 30))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    want = sorted(
        r[0]
        for r in rows
        if (r[1], -r[2]) in {(a, -b) for (a, b) in _brute(
            [(a, -b) for _, a, b in rows], [1, 1]
        )}
    )
    for parts in (1, 7, 32):
        got = sorted(
            r["id"]
            for r in skyline(
                df.repartition(parts), {"a": "max", "b": "min"}
            ).collect()
        )
        assert got == want


def test_local_prune_lossless(spark):
    """Correlated data: the local pass must keep every global-skyline
    row regardless of which partition it lands in (dominance
    transitivity) — checked by equality with the single-partition
    run, plus the front is tiny on correlated data."""
    rows = [(i, i, i % 97) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    one = sorted(
        r["id"] for r in skyline(df.coalesce(1), {"a": "max", "b": "max"}).collect()
    )
    many = sorted(
        r["id"] for r in skyline(df.repartition(32), {"a": "max", "b": "max"}).collect()
    )
    assert one == many
    assert len(one) < 100
