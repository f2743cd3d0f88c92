"""Cell-index kernel tests: Morton round-trips, hierarchy, covering."""

from __future__ import annotations

import numpy as np

from osm_spark.kernels.cells import (
    cell_bounds,
    cell_children,
    cell_disk,
    cell_level,
    cell_neighbors,
    cell_parent,
    cell_xy,
    cover_polygon,
    point_ancestors,
    point_to_cell,
    xy_to_cell,
)


def test_morton_roundtrip():
    rng = np.random.default_rng(42)
    for level in (1, 5, 12, 20, 28):
        n = 1 << level
        xs = rng.integers(0, n, 200)
        ys = rng.integers(0, n, 200)
        cells = xy_to_cell(xs, ys, level)
        assert (cell_level(cells) == level).all()
        for c, x, y in zip(cells.tolist(), xs.tolist(), ys.tolist()):
            assert cell_xy(c) == (x, y, level)


def test_point_cell_bounds():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    cells = point_to_cell(lon, lat, 10)
    for c, lo, la in zip(cells.tolist(), lon.tolist(), lat.tolist()):
        lon0, lat0, lon1, lat1 = cell_bounds(c)
        assert lon0 <= lo <= lon1
        assert lat0 <= la <= lat1


def test_parent_child_consistency():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-90, 90, 100)
    fine = point_to_cell(lon, lat, 15)
    coarse = point_to_cell(lon, lat, 9)
    assert (cell_parent(fine, 9) == coarse).all()
    # children of a parent include the original fine-at-level+1 cell
    c10 = point_to_cell(lon[:5], lat[:5], 10)
    c9 = point_to_cell(lon[:5], lat[:5], 9)
    for f, p in zip(c10.tolist(), c9.tolist()):
        assert f in cell_children(p)


def test_ancestors_matrix():
    lon = np.array([2.35, -74.0])
    lat = np.array([48.85, 40.7])
    anc = point_ancestors(lon, lat, 4, 8)
    assert anc.shape == (2, 5)
    assert (cell_level(anc[:, 0]) == 4).all()
    assert (cell_level(anc[:, -1]) == 8).all()
    assert (anc[:, -1] == point_to_cell(lon, lat, 8)).all()


def test_neighbors_and_disk():
    c = int(point_to_cell(np.array([2.0]), np.array([48.0]), 8)[0])
    n1 = cell_neighbors(c, 1)
    assert len(n1) == 8
    assert len(set(n1)) == 8
    assert c not in n1
    d2 = cell_disk(c, 2)
    assert len(d2) == 25
    # All neighbors share the parent's vicinity: bounds adjacency check.
    x, y, lv = cell_xy(c)
    for nb in n1:
        nx, ny, nlv = cell_xy(nb)
        assert nlv == lv
        assert max(abs(nx - x), abs(ny - y)) == 1


def test_cover_square():
    # Square polygon ~ (0..45, 0..45): covering must contain the cells of
    # interior points and not the cells of far-outside points.
    sq = [[[0.0, 0.0], [45.0, 0.0], [45.0, 45.0], [0.0, 45.0], [0.0, 0.0]]]
    cells, interior = cover_polygon(sq, min_level=2, max_level=6)
    assert cells
    cellset = set(cells)
    inside_pts = [(10.0, 10.0), (40.0, 40.0), (22.5, 1.0)]
    for lon, lat in inside_pts:
        anc = point_ancestors(np.array([lon]), np.array([lat]), 2, 6)[0]
        assert any(int(a) in cellset for a in anc), (lon, lat)
    outside_pts = [(-60.0, 10.0), (10.0, -60.0), (120.0, 80.0)]
    for lon, lat in outside_pts:
        anc = point_ancestors(np.array([lon]), np.array([lat]), 2, 6)[0]
        assert not any(int(a) in cellset for a in anc), (lon, lat)
    # Interior flags: a cell marked interior must be fully inside the bbox.
    for c, flag in zip(cells, interior):
        lon0, lat0, lon1, lat1 = cell_bounds(c)
        if flag:
            assert lon0 >= -1e-9 and lat0 >= -1e-9 and lon1 <= 45 + 1e-9 and lat1 <= 45 + 1e-9


def test_cover_polygon_with_hole():
    # Donut: outer (0..40)², hole (10..30)². Points in the hole must not
    # land in interior cells (they may hit boundary cells pending exact PIP).
    coords = [
        [[0.0, 0.0], [40.0, 0.0], [40.0, 40.0], [0.0, 40.0], [0.0, 0.0]],
        [[10.0, 10.0], [30.0, 10.0], [30.0, 30.0], [10.0, 30.0], [10.0, 10.0]],
    ]
    cells, interior = cover_polygon(coords, min_level=2, max_level=7)
    inter = {c for c, f in zip(cells, interior) if f}
    anc = point_ancestors(np.array([20.0]), np.array([20.0]), 2, 7)[0]
    assert not any(int(a) in inter for a in anc)
    anc = point_ancestors(np.array([5.0]), np.array([5.0]), 2, 7)[0]
    assert any(int(a) in set(cells) for a in anc)
