"""Zonal statistics (spatial/zonal.py) vs a brute-force center
enumeration twin — the raster→polygon transfer on the same shape set
the areal (polygon→raster) tests use, so the two transfers are pinned
against one membership rule."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_spark.spatial.zonal import zonal_stats
from tests.test_areal import SHAPES, _build, _point_in


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _grid(L):
    """Deterministic sparse value grid over the shapes' bbox."""
    n = 1 << L
    rows = []
    for i in range(n):
        x = -180.0 + (i + 0.5) * 360.0 / n
        if not -5 <= x <= 70:
            continue
        for j in range(n):
            y = -90.0 + (j + 0.5) * 180.0 / n
            if not -5 <= y <= 60:
                continue
            h = int(hashlib.md5(f"z-{i}-{j}".encode()).hexdigest()[:6], 16)
            if h % 3 == 0:
                continue  # sparse: some cells absent entirely
            rows.append((i, j, h % 1000))
    return rows


def _twin(L, rows):
    n = 1 << L
    agg = {}
    for i, j, v in rows:
        x = -180.0 + (i + 0.5) * 360.0 / n
        y = -90.0 + (j + 0.5) * 180.0 / n
        for rel, shape in SHAPES.items():
            if _point_in(shape, x, y):
                c, t, mx = agg.get(rel, (0, 0, 0))
                agg[rel] = (c + 1, t + v, max(mx, v))
    return {
        rel: (c, t, mx, t / c) for rel, (c, t, mx) in agg.items()
    }


@pytest.mark.parametrize("L,S", [(4, 7), (6, 6)])
def test_zonal_matches_center_enumeration(spark, L, S):
    # (6, 6): covering max_level == grid level — boundary cells ARE
    # grid cells (the shift-0 candidate path).
    pcells, _vals, index_bc = _build(spark, S)
    rows = _grid(L)
    grid = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {
        r["rel_id"]: (r["n_cells"], r["total"], r["vmax"], r["zonal_mean"])
        for r in zonal_stats(grid, pcells, index_bc, L, S).collect()
    }
    exp = _twin(L, rows)
    # at L=4 the sparse grid leaves rel 1 with no inside centers at
    # all — absent from BOTH sides is the agreement being tested
    assert got == exp and len(exp) >= 2


def test_partition_invariance(spark):
    L, S = 5, 8
    pcells, _vals, index_bc = _build(spark, S)
    rows = _grid(L)
    grid = spark.createDataFrame(rows, "gx long, gy long, n long")
    a = sorted(map(tuple, zonal_stats(grid, pcells, index_bc, L, S).collect()))
    b = sorted(
        map(
            tuple,
            zonal_stats(
                grid.repartition(7, "gy"), pcells, index_bc, L, S
            ).collect(),
        )
    )
    assert a == b and len(a) == 3


def test_level_guard(spark):
    pcells, _vals, index_bc = _build(spark, 6)
    grid = spark.createDataFrame([(0, 0, 1)], "gx long, gy long, n long")
    with pytest.raises(ValueError):
        zonal_stats(grid, pcells, index_bc, 7, 6)
