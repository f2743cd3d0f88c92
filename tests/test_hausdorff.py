"""Hausdorff similarity join (osm_spark/spatial/hausdorff.py).

Brute-force differential (full cross product, independent python) on
clustered trajectories, plus the covered-count exclusion path and
invariance pins.
"""

from __future__ import annotations

import hashlib

import pytest

from osm_spark.spatial.hausdorff import hausdorff_join


def _trajs():
    """6 trajectories in two far-apart clusters, ~8 points each,
    deterministic md5 jitter. Cross-cluster Hausdorff is huge (the
    candidate pruning must drop those pairs without evaluating them).
    """
    out = []
    for t in range(6):
        cx = 10_000_000 if t < 3 else 60_000_000
        cy = -5_000_000 if t < 3 else 20_000_000
        for i in range(8):
            h = hashlib.md5(f"hs-{t}-{i}".encode()).hexdigest()
            out.append(
                (
                    t,
                    cx + int(h[:6], 16) % 2_000_001 - 1_000_000,
                    cy + int(h[6:12], 16) % 2_000_001 - 1_000_000,
                )
            )
    # exact duplicate points (dedup path)
    out += out[:3]
    return out


def _brute(rows, d_u):
    pts = {}
    for t, x, y in rows:
        pts.setdefault(t, set()).add((x, y))
    def directed(a, b):
        return max(
            min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in pts[b])
            for ax, ay in pts[a]
        )
    out = {}
    ks = sorted(pts)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            h2 = max(directed(a, b), directed(b, a))
            if h2 <= d_u * d_u:
                out[(a, b)] = h2
    return out


@pytest.fixture(scope="module")
def traj_df(spark):
    rows = _trajs()
    df = spark.createDataFrame(
        [(t, x / 1e6, y / 1e6) for t, x, y in rows],
        "traj_id long, lon double, lat double",
    )
    return rows, df


@pytest.mark.parametrize("max_d", [0.9, 1.6, 3.0])
def test_matches_brute_force(traj_df, max_d):
    rows, df = traj_df
    want = _brute(rows, int(round(max_d * 1e6)))
    got = {
        (r["traj_a"], r["traj_b"]): r["hausdorff_d2"]
        for r in hausdorff_join(df, max_d).collect()
    }
    assert got == want


def test_uncovered_point_excludes_pair(spark):
    # B matches A everywhere except one far outlier in A: the pair
    # must drop via the covered-count test, not a wrong small H.
    rows = [(1, 0, 0), (1, 1000, 0), (1, 50_000_000, 0),
            (2, 0, 0), (2, 1000, 0)]
    df = spark.createDataFrame(
        [(t, x / 1e6, y / 1e6) for t, x, y in rows],
        "traj_id long, lon double, lat double",
    )
    assert hausdorff_join(df, 1.0).collect() == []
    # raising the radius past the outlier admits the pair with the
    # outlier's exact distance as H²
    out = hausdorff_join(df, 51.0).collect()
    assert len(out) == 1
    assert out[0]["hausdorff_d2"] == (50_000_000 - 1000) ** 2


def test_broadcast_equals_shuffle(traj_df):
    rows, df = traj_df
    a = sorted(map(tuple, hausdorff_join(df, 1.6, broadcast_data=True).collect()))
    b = sorted(map(tuple, hausdorff_join(df, 1.6, broadcast_data=False).collect()))
    assert a == b and len(a) > 0


def test_identical_trajectories_zero(spark):
    rows = [(7, 5, 5), (7, 9, 1), (8, 5, 5), (8, 9, 1)]
    df = spark.createDataFrame(
        [(t, x / 1e6, y / 1e6) for t, x, y in rows],
        "traj_id long, lon double, lat double",
    )
    out = hausdorff_join(df, 0.5).collect()
    assert [(r["traj_a"], r["traj_b"], r["hausdorff_d2"]) for r in out] == [
        (7, 8, 0)
    ]


def _brute_geo(rows, d_u):
    import math

    pts = {}
    for t, x, y in rows:
        pts.setdefault(t, set()).add((x, y))

    def d2(a, b):
        cq = int(round(math.cos(math.radians(a[1] / 1e6)) * 1024))
        lx = (abs(a[0] - b[0]) * cq) >> 10
        return lx * lx + (a[1] - b[1]) ** 2

    def directed(a, b):
        return max(min(d2(p, q) for q in pts[b]) for p in pts[a])

    out = {}
    ks = sorted(pts)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            h2 = max(directed(a, b), directed(b, a))
            if h2 <= d_u * d_u:
                out[(a, b)] = h2
    return out


def test_geodesic_matches_brute_and_differs_from_planar(spark):
    # high latitude (lat ~ 80°, cos ~ 0.17): lon-offset trajectories
    # are geodesically close but planar-far
    rows = []
    for t in range(4):
        for i in range(6):
            h = hashlib.md5(f"hg-{t}-{i}".encode()).hexdigest()
            rows.append(
                (
                    t,
                    t * 400_000 + int(h[:5], 16) % 200_001 - 100_000,
                    80_000_000 + int(h[5:10], 16) % 200_001 - 100_000,
                )
            )
    df = spark.createDataFrame(
        [(t, x / 1e6, y / 1e6) for t, x, y in rows],
        "traj_id long, lon double, lat double",
    )
    max_d = 0.35
    want = _brute_geo(rows, int(round(max_d * 1e6)))
    got = {
        (r["traj_a"], r["traj_b"]): r["hausdorff_d2"]
        for r in hausdorff_join(
            df, max_d, metric="equirectangular"
        ).collect()
    }
    assert got == want and len(want) > 0
    planar = {
        (r["traj_a"], r["traj_b"])
        for r in hausdorff_join(df, max_d).collect()
    }
    assert set(got) != planar  # cos scaling changes the qualifying set


def test_string_traj_ids_work(spark):
    # the struct-packed join identity carries any id type
    rows = [("x", 0, 0), ("x", 1000, 0), ("y", 100, 0), ("y", 900, 0)]
    df = spark.createDataFrame(
        [(t, x / 1e6, y / 1e6) for t, x, y in rows],
        "traj_id string, lon double, lat double",
    )
    out = hausdorff_join(df, 0.01, traj_col="traj_id").collect()
    assert [(r["traj_a"], r["traj_b"]) for r in out] == [("x", "y")]
    assert out[0]["hausdorff_d2"] == 100**2  # max over the 4 point-mins


def _brute_hav(rows, max_d):
    import math

    s = 1e7

    def sphere(x_u, y_u):
        rl, rp = math.radians(x_u / 1e6), math.radians(y_u / 1e6)
        return (
            int(round(math.cos(rp) * math.cos(rl) * s)),
            int(round(math.cos(rp) * math.sin(rl) * s)),
            int(round(math.sin(rp) * s)),
        )

    pts = {}
    for t, x, y in rows:
        pts.setdefault(t, set()).add(sphere(x, y))

    def d2(a, b):
        return sum((u - v) ** 2 for u, v in zip(a, b))

    def directed(a, b):
        return max(min(d2(p, q) for q in pts[b]) for p in pts[a])

    d_rad = math.radians(max_d)
    t_ = 2.0 * s * math.sin(min(d_rad, math.pi) / 2.0) + 4.0
    t_u = int(math.floor(t_ * t_))
    out = {}
    ks = sorted(pts)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            h2 = max(directed(a, b), directed(b, a))
            if h2 <= t_u:
                out[(a, b)] = h2
    return out


def test_haversine_matches_brute_and_symmetric(spark):
    """True-geodesic Hausdorff: matches the brute chord² twin on a
    high-latitude corpus, and (unlike equirectangular's per-source
    scaling) the metric is symmetric by construction — chord²(a,b)
    never depends on which side is the source."""
    rows = []
    for t in range(4):
        for i in range(6):
            h = hashlib.md5(f"hh-{t}-{i}".encode()).hexdigest()
            rows.append(
                (
                    t,
                    t * 400_000 + int(h[:5], 16) % 200_001 - 100_000,
                    80_000_000 + int(h[5:10], 16) % 200_001 - 100_000,
                )
            )
    df = spark.createDataFrame(
        [(t, x / 1e6, y / 1e6) for t, x, y in rows],
        "traj_id long, lon double, lat double",
    )
    max_d = 0.35
    want = _brute_hav(rows, max_d)
    got = {
        (r["traj_a"], r["traj_b"]): r["hausdorff_d2"]
        for r in hausdorff_join(df, max_d, metric="haversine").collect()
    }
    assert got == want and len(want) > 0
