"""Per-group convex hull (osm_spark/spatial/hull.py).

Differential against an independent O(n³) edge-characterization twin
(the same rule the q135 SQL oracle uses — maximal edges with every
other point strictly left or strictly between), plus degenerate-path
and pre-reduction pins.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from osm_spark.spatial.hull import (
    chain_hull,
    convex_hull,
    hull_area2,
    hull_summary,
)


def _twin_hull(pts):
    """Hull vertices in CCW order from the lexicographic min, by the
    maximal-edge rule (independent of the monotone chain)."""
    pts = sorted(set(pts))
    edges = {}
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for p in pts:
                if p in (a, b):
                    continue
                cr = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (
                    p[0] - a[0]
                )
                if cr < 0:
                    ok = False
                    break
                if cr == 0:
                    dot = (p[0] - a[0]) * (b[0] - a[0]) + (p[1] - a[1]) * (
                        b[1] - a[1]
                    )
                    ab2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                    if not (0 < dot < ab2):
                        ok = False
                        break
            if ok:
                edges[a] = b
    if not edges:
        return None
    start = min(edges)
    out, cur = [start], edges[start]
    while cur != start:
        out.append(cur)
        cur = edges[cur]
    return out


def _cloud(n=40):
    pts = []
    for i in range(n):
        h = hashlib.md5(f"hull-{i}".encode()).hexdigest()
        pts.append((int(h[:6], 16) % 2001 - 1000, int(h[6:12], 16) % 2001 - 1000))
    # duplicates + a collinear run on the far-right edge
    pts += pts[:5] + [(1500, -300), (1500, 0), (1500, 300)]
    return pts


def test_chain_matches_edge_twin():
    pts = _cloud()
    assert chain_hull(pts) == _twin_hull(pts)


def test_chain_degenerate():
    assert chain_hull([(0, 0), (1, 1)]) is None
    assert chain_hull([(0, 0), (1, 1), (2, 2), (5, 5)]) is None  # collinear
    assert chain_hull([(0, 0), (0, 0), (0, 0)]) is None  # duplicates


def test_square_with_interior():
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (3, 7), (5, 0)]
    hull = chain_hull(pts)
    # strict hull drops (5,0) (collinear on the bottom edge)
    assert hull == [(0, 0), (10, 0), (10, 10), (0, 10)]
    assert hull_area2(hull) == 200


def test_spark_hull_matches_twin_and_prereduce(spark):
    pts = _cloud()
    rows = [("a", x, y) for x, y in pts] + [
        ("b", x, y) for x, y in [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2)]
    ] + [("c", x, y) for x, y in [(0, 0), (1, 1), (2, 2)]]  # collinear -> absent
    df = spark.createDataFrame(rows, "lang string, x_u long, y_u long")
    for pre in (True, False):
        out = convex_hull(df.repartition(5), ["lang"], pre_reduce=pre)
        got = {}
        for r in out.collect():
            got.setdefault(r["lang"], []).append((r["pos"], r["x_u"], r["y_u"]))
        assert set(got) == {"a", "b"}
        for g, want_pts in (("a", pts), ("b", [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2)])):
            want = _twin_hull(want_pts)
            assert [(x, y) for _, x, y in sorted(got[g])] == want


def test_summary_census(spark):
    sq = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5)]
    df = spark.createDataFrame(
        [("b", x, y) for x, y in sq], "lang string, x_u long, y_u long"
    )
    r = hull_summary(df, ["lang"]).collect()[0]
    assert (r["lang"], r["n_vertices"], r["area2_u"]) == ("b", 4, 200)
    want = hashlib.md5(b"0:0;10:0;10:10;0:10").hexdigest()
    assert r["hull_digest"] == want


def test_local_extremes_keep_collinear_endpoints(spark):
    # All points of one partition collinear: the pre-reduction must
    # keep the endpoints so the global hull still sees them.
    rows = [("a", i, i) for i in range(20)] + [("a", 0, 19), ("a", 19, 0)]
    df = spark.createDataFrame(rows, "lang string, x_u long, y_u long")
    out = convex_hull(df.repartition(4), ["lang"]).collect()
    pts = sorted((r["x_u"], r["y_u"]) for r in out)
    assert pts == [(0, 0), (0, 19), (19, 0), (19, 19)]


def test_no_eval_python_after_kernel(spark):
    # summary aggregation stays Catalyst (the kernels are the sanctioned
    # Arrow geometry path; everything downstream is JVM)
    df = spark.createDataFrame(
        [("a", 0, 0), ("a", 4, 0), ("a", 0, 4)],
        "lang string, x_u long, y_u long",
    )
    plan = (
        hull_summary(df, ["lang"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BatchEvalPython" not in plan
