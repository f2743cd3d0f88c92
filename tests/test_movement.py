"""Circular movement stats: goldens (straight east, right-angle turn,
closed loop), twin on random walks, wrap-around headings."""

from __future__ import annotations

import math
import random

from osm_spark.spatial.trajectories import movement_stats


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "traj string, ts long, lon double, lat double"
    )


def test_goldens(spark):
    rows = []
    # straight east: heading 0, resultant = path length
    for i in range(5):
        rows.append(("east", i, 0.000001 * i, 0.0))
    # closed square loop: resultant 0 → NULL heading
    sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    for i, (x, y) in enumerate(sq):
        rows.append(("loop", i, 0.000001 * x, 0.000001 * y))
    # straight north: heading pi/2
    for i in range(3):
        rows.append(("north", i, 0.0, 0.000001 * i))
    got = {r["traj"]: r for r in movement_stats(
        _df(spark, rows), traj_col="traj", order_cols=("ts",)
    ).collect()}
    assert got["east"]["mean_heading_rad"] == 0.0
    assert got["east"]["resultant_len"] == 4.0
    assert got["east"]["n_steps"] == 4
    assert got["loop"]["mean_heading_rad"] is None
    assert got["loop"]["resultant_len"] == 0.0
    assert abs(got["north"]["mean_heading_rad"] - math.pi / 2) < 1e-12


def test_wraparound_average(spark):
    """Steps at 350° and 10° average to 0° (east), NOT 180° — the
    failure the circular mean exists to avoid."""
    a = math.radians(350)
    b = math.radians(10)
    rows = [
        ("t", 0, 0.0, 0.0),
        ("t", 1, 0.00001 * math.cos(a), 0.00001 * math.sin(a)),
        (
            "t",
            2,
            0.00001 * (math.cos(a) + math.cos(b)),
            0.00001 * (math.sin(a) + math.sin(b)),
        ),
    ]
    got = movement_stats(_df(spark, rows), traj_col="traj", order_cols=("ts",)).first()
    assert abs(got["mean_heading_rad"]) < 0.02  # ≈ 0 (east), not π


def test_matches_twin_random(spark):
    rng = random.Random(3)
    rows = []
    pos = {}
    for t in ("a", "b"):
        x = y = 0
        for i in range(20):
            x += rng.randrange(-5, 6)
            y += rng.randrange(-5, 6)
            rows.append((t, i, x * 1e-6, y * 1e-6))
        pos[t] = None
    got = {r["traj"]: r for r in movement_stats(
        _df(spark, rows), traj_col="traj", order_cols=("ts",)
    ).collect()}
    for t in ("a", "b"):
        pts = [(round(r[2] * 1e6), round(r[3] * 1e6)) for r in rows if r[0] == t]
        dxs = [b[0] - a[0] for a, b in zip(pts, pts[1:])]
        dys = [b[1] - a[1] for a, b in zip(pts, pts[1:])]
        sd2 = sum(dx * dx + dy * dy for dx, dy in zip(dxs, dys))
        g = got[t]
        assert g["n_steps"] == 19
        assert g["mean_step_d2"] == sd2 / 19
        sx, sy = sum(dxs), sum(dys)
        if sx == 0 and sy == 0:
            assert g["mean_heading_rad"] is None
        else:
            assert abs(g["mean_heading_rad"] - math.atan2(sy, sx)) < 1e-12
        assert abs(g["resultant_len"] - math.hypot(sx, sy)) < 1e-9
