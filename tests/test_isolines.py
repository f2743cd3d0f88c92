"""Marching squares: single-cell diamond, python-twin equivalence on a
random grid, closed-loop topology, and multi-threshold nesting."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm_spark.spatial.isolines import MS_TABLE, isolines, isolines_py


def _grid(spark, cells, n=5):
    return spark.createDataFrame(
        [(gx, gy, n) for gx, gy in cells], "gx long, gy long, n long"
    )


def _collect(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "bx", "by", "mcase", "seg", "x1h", "y1h", "x2h", "y2h"
        ).collect()
    )


def test_single_cell_diamond(spark):
    """One occupied cell → four segments closing a diamond around it."""
    got = _collect(isolines(_grid(spark, [(0, 0)]), [1]))
    assert got == isolines_py({(0, 0)})
    assert len(got) == 4
    # closed loop: every endpoint appears exactly twice
    ends: dict[tuple, int] = {}
    for *_, x1, y1, x2, y2 in got:
        for p in ((x1, y1), (x2, y2)):
            ends[p] = ends.get(p, 0) + 1
    assert set(ends.values()) == {2}


def test_matches_python_twin_random(spark):
    rng = random.Random(42)
    cells = {
        (rng.randrange(0, 12), rng.randrange(0, 12)) for _ in range(60)
    }
    got = _collect(isolines(_grid(spark, sorted(cells)), [1]))
    assert got == isolines_py(cells)


def test_saddle_center_low_rule(spark):
    """Two diagonal cells: the shared block is case 5 — two segments
    (disconnected corners), per the documented center-low rule."""
    got = isolines(_grid(spark, [(0, 0), (1, 1)]), [1])
    saddle = got.where((F.col("bx") == 0) & (F.col("by") == 0)).collect()
    assert {r["mcase"] for r in saddle} == {5}
    assert len(saddle) == 2 == len(MS_TABLE[5])


def test_multi_threshold_one_pass(spark):
    df = spark.createDataFrame(
        [(0, 0, 10), (1, 0, 3)], "gx long, gy long, n long"
    )
    out = isolines(df, [1, 5])
    lo = _collect(out.where(F.col("thr") == 1))
    hi = _collect(out.where(F.col("thr") == 5))
    assert lo == isolines_py({(0, 0), (1, 0)})
    assert hi == isolines_py({(0, 0)})


def test_uniform_blocks_emit_nothing(spark):
    """A filled 3×3 patch: interior block (cells all set) emits no
    segments; total segments form one closed ring."""
    cells = {(x, y) for x in range(3) for y in range(3)}
    out = isolines(_grid(spark, sorted(cells)), [1])
    rows = _collect(out)
    assert rows == isolines_py(cells)
    assert all(r[2] not in (0, 15) for r in rows)
    ends: dict[tuple, int] = {}
    for *_, x1, y1, x2, y2 in rows:
        for p in ((x1, y1), (x2, y2)):
            ends[p] = ends.get(p, 0) + 1
    assert set(ends.values()) == {2}
