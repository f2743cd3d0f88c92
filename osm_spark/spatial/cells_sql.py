"""JVM-side (Catalyst) cell-id expressions for the S2-style Morton grid.

The point→cell assignment runs on every page row — the 100 TB hot path —
so it must stay inside whole-stage codegen, not Python. These helpers
build the same cell ids as ``osm_spark.kernels.cells`` (shared scheme:
id = morton(x, y) << 6 | level) out of pure Spark column expressions:
5 shift-and-mask steps per axis, all long arithmetic.

``point_to_cell`` in kernels/cells.py is the numpy twin used inside
pandas UDFs; ``tests/test_cells_sql.py`` pins their equality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits_col(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0x0FFFFFFF))
    for shift, mask in _MASKS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def cell_expr(lon: Column, lat: Column, level: int) -> Column:
    """Cell id at ``level`` for degree coordinates (double columns)."""
    n = 1 << level
    x = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    y = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    m = _spread_bits_col(x).bitwiseOR(F.shiftleft(_spread_bits_col(y), 1))
    return F.shiftleft(m, 6).bitwiseOR(F.lit(level)).cast("long")


def cell_parent_expr(cell: Column, parent_level: int) -> Column:
    """Ancestor cell id at ``parent_level`` (Catalyst twin of
    kernels.cells.cell_parent)."""
    level = cell.bitwiseAND(F.lit(0x3F))
    m = F.shiftright(cell, 6)
    shifted = F.call_function(
        "shiftright", m, ((level - F.lit(parent_level)) * 2).cast("int")
    )
    return F.shiftleft(shifted, 6).bitwiseOR(F.lit(parent_level)).cast("long")


def point_cells_expr(lon: Column, lat: Column, levels: list[int]) -> Column:
    """Array of this point's cell ids at each level (for the multi-level
    covering join: explode + equi-join on cell id)."""
    return F.array(*[cell_expr(lon, lat, lv) for lv in levels])
