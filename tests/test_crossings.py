"""Segment-crossing join (osm_spark/spatial/crossings.py).

Brute-force differential on random-walk trajectories plus closed-form
proper/touch/collinear pins and grid-shift invariance.
"""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.spatial.crossings import (
    crossing_join,
    segments_from_points,
)


def _orient(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def _proper(a, b, c, d):
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    return ((o1 > 0 and o2 < 0) or (o1 < 0 and o2 > 0)) and (
        (o3 > 0 and o4 < 0) or (o3 < 0 and o4 > 0)
    )


def _walks(n_traj=6, n_pts=12):
    """Deterministic random walks sharing one arena so paths cross."""
    rows = []
    for t in range(n_traj):
        x, y = 0, 0
        for i in range(n_pts):
            h = hashlib.md5(f"cross-{t}-{i}".encode()).hexdigest()
            x += int(h[:6], 16) % 2_000_001 - 1_000_000
            y += int(h[6:12], 16) % 2_000_001 - 1_000_000
            rows.append((t, i, x, y))
    return rows


def _brute(rows):
    segs = {}
    for t, i, x, y in rows:
        segs.setdefault(t, []).append((i, x, y))
    seglist = []
    for t, pts in segs.items():
        pts.sort()
        for k in range(len(pts) - 1):
            seglist.append((t, k, (pts[k][1], pts[k][2]), (pts[k + 1][1], pts[k + 1][2])))
    out = set()
    for ta, sa, a1, a2 in seglist:
        for tb, sb, b1, b2 in seglist:
            if ta < tb and _proper(a1, a2, b1, b2):
                out.add((ta, sa, tb, sb))
    return out


@pytest.fixture(scope="module")
def walk_df(spark):
    rows = _walks()
    df = spark.createDataFrame(
        [(t, i, x / 1e6, y / 1e6) for t, i, x, y in rows],
        "traj_id long, ts long, lon double, lat double",
    )
    return rows, df


def test_matches_brute_force(walk_df):
    rows, df = walk_df
    want = _brute(rows)
    segs = segments_from_points(df, order_cols=("ts",))
    got = {
        (r["traj_a"], r["seg_a"], r["traj_b"], r["seg_b"])
        for r in crossing_join(segs).collect()
    }
    assert got == want and len(want) > 0


def test_shift_invariance(walk_df):
    rows, df = walk_df
    segs = segments_from_points(df, order_cols=("ts",))
    base = sorted(map(tuple, crossing_join(segs).collect()))
    for shift in (12, 18, 22):
        assert sorted(map(tuple, crossing_join(segs, shift=shift).collect())) == base


def _two_traj(spark, a_pts, b_pts):
    rows = [(1, i, x / 1e6, y / 1e6) for i, (x, y) in enumerate(a_pts)]
    rows += [(2, i, x / 1e6, y / 1e6) for i, (x, y) in enumerate(b_pts)]
    df = spark.createDataFrame(
        rows, "traj_id long, ts long, lon double, lat double"
    )
    return segments_from_points(df, order_cols=("ts",))


def test_x_crossing(spark):
    segs = _two_traj(
        spark, [(0, 0), (1000, 1000)], [(0, 1000), (1000, 0)]
    )
    out = crossing_join(segs, shift=9).collect()
    assert [(r["traj_a"], r["seg_a"], r["traj_b"], r["seg_b"]) for r in out] == [
        (1, 0, 2, 0)
    ]


def test_touch_and_collinear_excluded(spark):
    # T-touch: B ends exactly ON A's interior — not a proper crossing.
    segs = _two_traj(spark, [(0, 0), (2000, 0)], [(1000, 1000), (1000, 0)])
    assert crossing_join(segs, shift=9).collect() == []
    # collinear overlap
    segs = _two_traj(spark, [(0, 0), (3000, 0)], [(1000, 0), (4000, 0)])
    assert crossing_join(segs, shift=9).collect() == []
    # shared endpoint
    segs = _two_traj(spark, [(0, 0), (1000, 1000)], [(1000, 1000), (2000, 0)])
    assert crossing_join(segs, shift=9).collect() == []


def test_segments_indexing(spark):
    segs = _two_traj(
        spark, [(0, 0), (10, 0), (20, 0)], [(5, 5)]
    ).collect()
    got = sorted(
        (r["traj"], r["seg_idx"], r["ax"], r["bx"]) for r in segs
    )
    # traj 2 has a single point -> no segments; traj 1 has 0->1, 1->2
    assert got == [(1, 0, 0, 10), (1, 1, 10, 20)]


def test_salt_invariance(walk_df):
    """The expansion-skew salt (a-side sharded, b-side replicated R
    ways) must leave the crossing pair set untouched."""
    rows, df = walk_df
    segs = segments_from_points(df, order_cols=("ts",))
    base = sorted(map(tuple, crossing_join(segs).collect()))
    for salt in (3, 8):
        assert (
            sorted(map(tuple, crossing_join(segs, salt=salt).collect()))
            == base
        )
