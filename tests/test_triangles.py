"""Triangle counting: brute-force twin, hub-emits-no-wedges shape,
complete/star/cycle golden cases."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from osm_spark.text.triangles import (
    oriented_edges,
    triangle_counts,
    triangles,
    undirected_simple,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _brute(pairs):
    und = {tuple(sorted((str(a), str(b)))) for a, b in pairs if a != b}
    nodes = sorted({n for e in und for n in e})
    cnt: dict[str, int] = {}
    total = 0
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in und
            and tuple(sorted((y, z))) in und
            and tuple(sorted((x, z))) in und
        ):
            total += 1
            for n in (x, y, z):
                cnt[n] = cnt.get(n, 0) + 1
    return total, cnt


def test_complete_k5(spark):
    pairs = list(itertools.combinations(range(5), 2))
    got = {r["node"]: r["n_tri"] for r in triangle_counts(_edges_df(spark, pairs)).collect()}
    assert got == {str(i): 6 for i in range(5)}
    assert triangles(_edges_df(spark, pairs)).count() == 10


def test_star_has_none(spark):
    pairs = [("hub", f"leaf{i}") for i in range(20)]
    assert triangle_counts(_edges_df(spark, pairs)).count() == 0


def test_cycle4_has_none_then_chord(spark):
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert triangles(_edges_df(spark, cyc)).count() == 0
    assert triangles(_edges_df(spark, cyc + [(0, 2)])).count() == 2


def test_random_matches_brute(spark):
    rng = random.Random(11)
    pairs = {
        (rng.randrange(0, 25), rng.randrange(0, 25)) for _ in range(120)
    }
    total, cnt = _brute(pairs)
    df = triangle_counts(_edges_df(spark, sorted(pairs)))
    got = {r["node"]: r["n_tri"] for r in df.collect()}
    assert got == cnt
    assert sum(got.values()) == 3 * total
    # direction/duplication noise must not change the undirected result
    noisy = sorted(pairs) + [(b, a) for a, b in sorted(pairs)][:40]
    got2 = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(_edges_df(spark, noisy)).collect()
    }
    assert got2 == cnt


def test_hub_emits_no_wedges(spark):
    """The scale claim: after degree orientation a mega-hub has
    out-degree 0 among its leaves — its wedge fan-out is gone."""
    pairs = [("hub", f"l{i}") for i in range(30)] + [("l0", "l1")]
    o = oriented_edges(undirected_simple(_edges_df(spark, pairs)))
    hub_out = o.where(F.col("u") == "hub").count()
    assert hub_out == 0
