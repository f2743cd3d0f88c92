"""Scale-robustness of the exact PIP kernels (VERDICT r2 #1):
memory-bounded tiling + bbox segment slicing must be bit-identical to
the unbounded dense kernel, and a high-vertex (coastline-class) polygon
must refine under a fixed memory budget instead of materializing
(points × all-segments) matrices.
"""

import tracemalloc

import numpy as np
import pytest

from osm_spark.spatial import pip_index as P


def _star_ring(n, r0, r1, cx=0.0, cy=0.0):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = np.where(np.arange(n) % 2 == 0, r1, r0)
    xs = np.append(cx + r * np.cos(th), cx + r[0] * np.cos(th[0]))
    ys = np.append(cy + r * np.sin(th), cy + r[0] * np.sin(th[0]))
    return xs, ys


def _brute_contains(rings, lons, lats):
    """The round-1 unbounded dense kernel, kept verbatim as the oracle."""
    inside = np.zeros(len(lons), dtype=bool)
    on_edge = np.zeros(len(lons), dtype=bool)
    px, py = lons[:, None], lats[:, None]
    for ring_idx, (xs, ys) in enumerate(rings):
        x1, y1, x2, y2 = xs[:-1], ys[:-1], xs[1:], ys[1:]
        dx, dy = x2 - x1, y2 - y1
        cross = dx[None, :] * (py - y1[None, :]) - dy[None, :] * (px - x1[None, :])
        on = (
            (cross == 0.0)
            & (np.minimum(x1, x2)[None, :] <= px)
            & (px <= np.maximum(x1, x2)[None, :])
            & (np.minimum(y1, y2)[None, :] <= py)
            & (py <= np.maximum(y1, y2)[None, :])
        )
        on_edge |= on.any(axis=1)
        straddle = (y1[None, :] > py) != (y2[None, :] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (py - y1[None, :]) * dx[None, :] / dy[None, :]
        crossings = (straddle & (px < xint)).sum(axis=1)
        ring_inside = (crossings & 1).astype(bool)
        inside = ring_inside if ring_idx == 0 else inside & ~ring_inside
    return inside & ~on_edge


def _brute_dist(rings, lons, lats):
    best = np.full(len(lons), np.inf)
    px, py = lons[:, None], lats[:, None]
    for xs, ys in rings:
        x1, y1, x2, y2 = xs[:-1], ys[:-1], xs[1:], ys[1:]
        dx, dy = x2 - x1, y2 - y1
        seg2 = dx * dx + dy * dy
        seg2 = np.where(seg2 == 0.0, 1e-300, seg2)
        t = ((px - x1[None, :]) * dx[None, :] + (py - y1[None, :]) * dy[None, :]) / seg2[None, :]
        t = np.clip(t, 0.0, 1.0)
        cx = x1[None, :] + t * dx[None, :]
        cy = y1[None, :] + t * dy[None, :]
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        best = np.minimum(best, np.sqrt(d2.min(axis=1)))
    return best


@pytest.fixture()
def star_index():
    rings = [_star_ring(401, 8.0, 10.0), _star_ring(101, 2.0, 3.0)]
    return P.PipIndex([], {}, {(1, 0): rings}), rings


def test_contains_and_distance_bit_identical(star_index):
    idx, rings = star_index
    rng = np.random.default_rng(7)
    lons = rng.uniform(-12, 12, 4000)
    lats = rng.uniform(-12, 12, 4000)
    np.testing.assert_array_equal(
        idx.contains(1, 0, lons, lats), _brute_contains(rings, lons, lats)
    )
    np.testing.assert_array_equal(
        idx.edge_distance(1, 0, lons, lats), _brute_dist(rings, lons, lats)
    )


def test_tiny_tile_budget_identical(star_index, monkeypatch):
    """Shrinking the element budget changes the tiling, never the rows."""
    idx, rings = star_index
    rng = np.random.default_rng(11)
    lons = rng.uniform(-12, 12, 1500)
    lats = rng.uniform(-12, 12, 1500)
    base_c = idx.contains(1, 0, lons, lats)
    base_d = idx.edge_distance(1, 0, lons, lats)
    monkeypatch.setattr(P, "TILE_ELEMS", 997)  # prime: ragged tiles
    idx2 = P.PipIndex([], {}, idx.geom)
    np.testing.assert_array_equal(idx2.contains(1, 0, lons, lats), base_c)
    np.testing.assert_array_equal(idx2.edge_distance(1, 0, lons, lats), base_d)


def test_high_vertex_polygon_memory_bound():
    """Coastline-class polygon (6×10^4 segments) × thousands of points:
    peak allocation stays ~TILE_ELEMS-scale, nowhere near the
    points×segments dense matrix (~1 GB per temporary here).
    """
    big = [_star_ring(60001, 9.0, 10.0)]
    idx = P.PipIndex([], {}, {(2, 0): big})
    rng = np.random.default_rng(3)
    lons = rng.uniform(-11, 11, 2000)
    lats = rng.uniform(-11, 11, 2000)
    idx._ring_segs(2, 0)  # build the cache outside the measurement
    tracemalloc.start()
    got = idx.contains(2, 0, lons, lats)
    d = idx.edge_distance(2, 0, lons[:200], lats[:200])
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # The dense kernel's first temporary alone would be
    # 60000*2000*8 ≈ 960 MB; the tiled kernel stays ~TILE_ELEMS-sized.
    assert peak < 300e6, f"peak {peak/1e6:.0f} MB"
    # Spot-check correctness against the dense oracle on a slice.
    sel = np.arange(0, 2000, 10)
    np.testing.assert_array_equal(got[sel], _brute_contains(big, lons[sel], lats[sel]))
    np.testing.assert_array_equal(d, _brute_dist(big, lons[:200], lats[:200]))
    # The banded path (per covering cell grouping) is the hot-path
    # shape: a tight group must not touch most segments.
    band = np.abs(lats) < 0.02
    np.testing.assert_array_equal(got[band], _brute_contains(big, lons[band], lats[band]))


def test_missing_geometry_is_dropped_not_fatal(star_index):
    """Broadcast refinement mirrors the cogroup path's silent-drop
    semantics for candidates with no geometry entry (ADVICE r2)."""
    idx, _ = star_index
    lons = np.array([0.0, 1.0])
    lats = np.array([0.0, 1.0])
    assert not idx.contains(99, 7, lons, lats).any()
    assert np.isinf(idx.edge_distance(99, 7, lons, lats)).all()


def test_index_pickle_drops_segment_cache(star_index):
    import pickle

    idx, _ = star_index
    idx._ring_segs(1, 0)
    assert idx._segs
    clone = pickle.loads(pickle.dumps(idx))
    assert clone._segs == {}
    lons = np.array([0.0, 5.0, 11.0])
    lats = np.array([0.0, 5.0, 11.0])
    np.testing.assert_array_equal(
        clone.contains(1, 0, lons, lats), idx.contains(1, 0, lons, lats)
    )
