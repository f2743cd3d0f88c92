"""Grid-density hotspot clustering (spatial/hotspots.py) vs a pure
python twin (grid counts + BFS over dense cells)."""

from __future__ import annotations

import numpy as np
import pytest

from osm_spark.kernels.cells import point_to_cell
from osm_spark.spatial.hotspots import cluster_points, grid_clusters


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
        "point_id long, lon double, lat double",
    )


def _twin(pts, level, min_pts, wrap=True):
    """Pure-python clusters: dict cell -> (min-cell-of-component,
    n_points) via BFS over 8-adjacent dense cells."""
    n = 1 << level
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    cells = point_to_cell(lon, lat, level)
    counts = {}
    for c, xi, yi in zip(cells.tolist(), x.tolist(), y.tolist()):
        counts.setdefault((c, xi, yi), 0)
        counts[(c, xi, yi)] += 1
    dense = {k: v for k, v in counts.items() if v >= min_pts}
    by_xy = {(xi, yi): c for (c, xi, yi) in dense}
    # BFS components
    comp = {}
    for key in sorted(dense, key=lambda k: k[0]):
        c0 = key[0]
        if c0 in comp:
            continue
        stack = [key]
        members = []
        seen = {c0}
        while stack:
            c, xi, yi = stack.pop()
            members.append((c, xi, yi))
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    nx = (xi + dx) % n if wrap else xi + dx
                    ny = yi + dy
                    if not wrap and not (0 <= nx < n):
                        continue
                    if not (0 <= ny < n):
                        continue
                    nc = by_xy.get((nx, ny))
                    if nc is not None and nc not in seen and nc not in comp:
                        seen.add(nc)
                        stack.append((nc, nx, ny))
        label = min(m[0] for m in members)
        for m in members:
            comp[m[0]] = label
    out = {}
    for (c, xi, yi), npts in dense.items():
        out[c] = (comp[c], npts)
    return out


def _check(spark, pts, level, min_pts, wrap=True):
    got = {
        r["cell"]: (
            r["cluster"],
            r["n_points"],
            r["cluster_n_cells"],
            r["cluster_n_points"],
        )
        for r in grid_clusters(
            _df(spark, pts), level, min_pts, wrap=wrap
        ).collect()
    }
    twin = _twin(pts, level, min_pts, wrap=wrap)
    assert set(got) == set(twin)
    # component sizes from the twin
    n_cells = {}
    n_pts = {}
    for c, (label, npts) in twin.items():
        n_cells[label] = n_cells.get(label, 0) + 1
        n_pts[label] = n_pts.get(label, 0) + npts
    for c, (label, npts) in twin.items():
        assert got[c] == (label, npts, n_cells[label], n_pts[label]), (
            c,
            got[c],
            (label, npts, n_cells[label], n_pts[label]),
        )
    return got


def test_two_blobs_and_noise(spark):
    blob_a = [(10.0 + 0.001 * i, 45.0) for i in range(5)]
    blob_b = [(-60.0 + 0.001 * i, -20.0) for i in range(4)]
    noise = [(100.0, 10.0), (120.0, -40.0)]
    got = _check(spark, blob_a + blob_b + noise, level=6, min_pts=2)
    assert len(set(v[0] for v in got.values())) == 2
    # noise cells (1 point each) are not in the output at all
    assert all(v[1] >= 2 for v in got.values())


def test_min_pts_boundary_inclusive(spark):
    pts = [(10.0, 45.0)] * 3
    got = _check(spark, pts, level=6, min_pts=3)
    assert len(got) == 1
    got = grid_clusters(_df(spark, pts), 6, 4).collect()
    assert got == []


def test_diagonal_adjacency_merges(spark):
    # Two dense cells touching only at a corner form ONE cluster.
    n = 1 << 4
    # cell (x, y) and (x+1, y+1) centers at level 4
    def center(xi, yi):
        return (
            (xi + 0.5) / n * 360.0 - 180.0,
            (yi + 0.5) / n * 180.0 - 90.0,
        )

    pts = [center(5, 7)] * 2 + [center(6, 8)] * 2
    got = _check(spark, pts, level=4, min_pts=2)
    assert len(got) == 2
    assert len(set(v[0] for v in got.values())) == 1


def test_antimeridian_wrap(spark):
    n = 1 << 5
    west = ((0 + 0.5) / n * 360.0 - 180.0, 0.0)   # x = 0
    east = ((n - 1 + 0.5) / n * 360.0 - 180.0, 0.0)  # x = n-1, same y
    pts = [west] * 2 + [east] * 2
    wrapped = _check(spark, pts, level=5, min_pts=2, wrap=True)
    assert len(set(v[0] for v in wrapped.values())) == 1
    unwrapped = _check(spark, pts, level=5, min_pts=2, wrap=False)
    assert len(set(v[0] for v in unwrapped.values())) == 2


def test_random_clustered_differential(spark):
    rng = np.random.default_rng(7)
    pts = []
    for cx, cy in [(12.0, 47.0), (12.4, 47.2), (-71.0, 42.3), (139.7, 35.7)]:
        pts += [
            (cx + float(a), cy + float(b))
            for a, b in rng.normal(0, 0.5, size=(60, 2))
        ]
    pts += [
        (float(a), float(b))
        for a, b in zip(
            rng.uniform(-180, 180, 40), rng.uniform(-90, 90, 40)
        )
    ]
    _check(spark, pts, level=7, min_pts=3)


def test_broadcast_and_shuffle_paths_identical(spark):
    rng = np.random.default_rng(17)
    pts = [
        (float(a), float(b))
        for a, b in zip(
            10.0 + rng.normal(0, 0.3, 150), 45.0 + rng.normal(0, 0.3, 150)
        )
    ]
    a = sorted(
        map(tuple, grid_clusters(_df(spark, pts), 8, 2).collect())
    )
    b = sorted(
        map(
            tuple,
            grid_clusters(
                _df(spark, pts), 8, 2, broadcast_cells=False
            ).collect(),
        )
    )
    assert a == b and a
    pa = sorted(
        map(
            tuple,
            cluster_points(_df(spark, pts), 8, 2, id_col="point_id").collect(),
        )
    )
    pb = sorted(
        map(
            tuple,
            cluster_points(
                _df(spark, pts), 8, 2, id_col="point_id",
                broadcast_cells=False,
            ).collect(),
        )
    )
    assert pa == pb


def test_cluster_points_labels_and_noise(spark):
    blob = [(10.0 + 0.0001 * i, 45.0) for i in range(4)]
    noise = [(100.0, 10.0)]
    pts = blob + noise
    labels = {
        r["point_id"]: r["cluster"]
        for r in cluster_points(
            _df(spark, pts), 6, min_pts=2, id_col="point_id"
        ).collect()
    }
    assert len(labels) == len(pts)  # every point labeled exactly once
    assert labels[len(pts) - 1] is None  # the noise point
    blob_labels = {labels[i] for i in range(4)}
    assert len(blob_labels) == 1 and None not in blob_labels
