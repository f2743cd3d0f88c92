"""Areal interpolation (spatial/areal.py) vs a brute-force sub-cell
center enumeration twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.spatial.areal import areal_interpolate


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _rect(x0, y0, x1, y1):
    return [
        [float(x0), float(y0)],
        [float(x1), float(y0)],
        [float(x1), float(y1)],
        [float(x0), float(y1)],
        [float(x0), float(y0)],
    ]


# rel 1: big square; rel 2: square with a hole; rel 3: two touching
# parts (the union/metro shape). Values are per-rel payloads.
SHAPES = {
    1: [[_rect(2, 2, 30, 30)]],
    2: [[_rect(34, 2, 60, 28), _rect(40, 8, 52, 20)]],
    3: [[_rect(5, 34, 20, 46)], [_rect(20, 34, 33, 46)]],
}
VALUES = {1: 700, 2: 310, 3: 55}


def _point_in(shape, x, y):
    """Strict interior on the outer rect, weak exclusion on holes —
    the PIP membership contract (rect-specialized)."""
    for poly in shape:
        (x0, y0), (x1, y1) = poly[0][0], poly[0][2]
        if not (x0 < x < x1 and y0 < y < y1):
            continue
        in_hole = False
        for hole in poly[1:]:
            (hx0, hy0), (hx1, hy1) = hole[0], hole[2]
            if hx0 <= x <= hx1 and hy0 <= y <= hy1:
                in_hole = True
                break
        if not in_hole:
            return True
    return False


def _twin(L, S):
    n = 1 << S
    d = S - L
    counts = {}
    # enumerate every S-center in the shapes' bbox
    for i in range(n):
        x = -180.0 + (i + 0.5) * 360.0 / n
        if not -180 <= x <= 70:
            continue
        for j in range(n):
            y = -90.0 + (j + 0.5) * 180.0 / n
            if not -90 <= y <= 60:
                continue
            for rel, shape in SHAPES.items():
                if _point_in(shape, x, y):
                    key = (i >> d, j >> d, rel)
                    counts[key] = counts.get(key, 0) + 1
    out = {}
    for (gx, gy, rel), c in counts.items():
        nr, num = out.get((gx, gy), (0, 0))
        out[(gx, gy)] = (nr + 1, num + VALUES[rel] * c)
    return {
        k: (nr, num, num / 4**d) for k, (nr, num) in out.items()
    }


def _build(spark, S, min_level=2):
    from osm_spark.spatial.covering import build_polygon_cells, polygon_geometry
    from osm_spark.spatial.pip_index import build_pip_index

    rows = [(rel, shape) for rel, shape in SHAPES.items()]
    locs = spark.createDataFrame(
        rows, "rel_id long, shape array<array<array<array<double>>>>"
    )
    pcells = build_polygon_cells(locs, min_level=min_level, max_level=S)
    index_bc = spark.sparkContext.broadcast(
        build_pip_index(pcells, polygon_geometry(locs))
    )
    vals = spark.createDataFrame(
        [(r, v) for r, v in VALUES.items()], "rel_id long, value long"
    )
    return pcells, vals, index_bc


def _got(spark, pcells, vals, index_bc, L, S):
    res = areal_interpolate(pcells, vals, index_bc, L, S).collect()
    return {
        (r.gx, r.gy): (r.n_rels, r.num, r.areal_value) for r in res
    }


def test_areal_matches_center_enumeration(spark):
    L, S = 4, 7
    pcells, vals, index_bc = _build(spark, S)
    got = _got(spark, pcells, vals, index_bc, L, S)
    exp = _twin(L, S)
    assert got == exp and len(exp) > 10


def test_areal_finer_grid_and_partition_invariance(spark):
    L, S = 5, 8
    pcells, vals, index_bc = _build(spark, S)
    got = _got(spark, pcells, vals, index_bc, L, S)
    exp = _twin(L, S)
    assert got == exp
    got16 = _got(spark, pcells.repartition(16), vals, index_bc, L, S)
    assert got16 == exp


def test_areal_conservation(spark):
    # Σ num over all cells == value · total inside-center count per rel
    # (every inside center lands in exactly one L-cell).
    L, S = 4, 7
    pcells, vals, index_bc = _build(spark, S)
    out = areal_interpolate(pcells, vals, index_bc, L, S)
    total = out.agg(F.sum("num")).collect()[0][0]
    n = 1 << S
    per_rel_centers = {}
    for rel, shape in SHAPES.items():
        c = 0
        for i in range(n):
            x = -180.0 + (i + 0.5) * 360.0 / n
            if not 0 <= x <= 65:
                continue
            for j in range(n):
                y = -90.0 + (j + 0.5) * 180.0 / n
                if not 0 <= y <= 50:
                    continue
                if _point_in(shape, x, y):
                    c += 1
        per_rel_centers[rel] = c
    assert total == sum(VALUES[r] * c for r, c in per_rel_centers.items())


def test_areal_guards(spark):
    L, S = 4, 7
    pcells, vals, index_bc = _build(spark, S)
    with pytest.raises(ValueError):
        areal_interpolate(pcells, vals, index_bc, 7, 7)
    # covering built for S=7 but declared sub_level=9: the in-plan
    # raise_error guard fails the JOB (the builder itself stays lazy).
    bad = areal_interpolate(pcells, vals, index_bc, 4, 9)
    with pytest.raises(Exception, match="sub_level"):
        bad.collect()
