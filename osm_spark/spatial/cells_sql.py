"""JVM-side (Catalyst) cell-id expressions for the S2-style Morton grid.

The point→cell assignment runs on every page row — the 100 TB hot path —
so it must stay inside whole-stage codegen, not Python. These helpers
build the same cell ids as ``osm_spark.kernels.cells`` (shared scheme:
id = morton(x, y) << 6 | level) out of pure Spark column expressions.

IMPORTANT construction constraint: Catalyst does not let-bind column
expressions, so any formula that references a subexpression twice
doubles the tree. The classic shift-and-mask bit spread references its
input twice per step → 2^5 tree blow-up → codegen gives up and the
whole plan drops to interpreted mode (measured 30×+ slowdown). The
Morton code is therefore built as a LINEAR OR-chain of per-bit terms,
each referencing the x/y leaf exactly once:

    m = OR_i ( ((x >> i) & 1) << 2i  |  ((y >> i) & 1) << (2i+1) )

and multi-level ids derive from the single max-level morton by shifts
(quadtree ancestors are prefixes), so the floor()/morton work happens
once per row regardless of how many levels the covering join probes.

``kernels/cells.point_to_cell`` is the numpy twin used inside pandas
UDFs; tests pin their equality.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _xy_expr(lon: Column, lat: Column, level: int) -> tuple[Column, Column]:
    n = 1 << level
    x = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    y = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    return x, y


def _morton_expr(x: Column, y: Column, bits: int) -> Column:
    """Linear-size bit interleave: x bit i → 2i, y bit i → 2i+1.
    bits=0 (the level-0 single-cell grid) is the empty interleave: 0."""
    if bits == 0:
        return F.lit(0).cast("long")
    m = None
    for i in range(bits):
        tx = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        t = tx.bitwiseOR(ty)
        m = t if m is None else m.bitwiseOR(t)
    return m


def cell_expr(lon: Column, lat: Column, level: int) -> Column:
    """Cell id at ``level`` for degree coordinates (double columns)."""
    x, y = _xy_expr(lon, lat, level)
    m = _morton_expr(x, y, level) if level > 0 else F.lit(0)
    return F.shiftleft(m, 6).bitwiseOR(F.lit(level)).cast("long")


def cell_parent_expr(cell: Column, parent_level: int) -> Column:
    """Ancestor cell id at ``parent_level`` (Catalyst twin of
    kernels.cells.cell_parent). Requires cell level >= parent_level."""
    level = cell.bitwiseAND(F.lit(0x3F))
    m = F.shiftright(cell, 6)
    shifted = F.call_function(
        "shiftright", m, ((level - F.lit(parent_level)) * 2).cast("int")
    )
    return F.shiftleft(shifted, 6).bitwiseOR(F.lit(parent_level)).cast("long")


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_code_expr(lon: Column, lat: Column, precision: int) -> Column:
    """The 5·precision-bit geohash integer for degree coordinates —
    the standard public geohash bit layout (lon bit first from the
    MSB, bisection == floor sampling), built with the same linear
    morton OR-chain as cell_expr so it stays in whole-stage codegen.

    Encode via :func:`geohash_chars_expr` AFTER aliasing this code to
    a real column — referencing the code tree once per character would
    multiply the expression p-fold (the let-binding constraint above).
    """
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    total = 5 * precision
    xb = (total + 1) // 2
    yb = total // 2
    nx, ny = 1 << xb, 1 << yb
    gx = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * nx), F.lit(0)
        ),
        F.lit(nx - 1),
    ).cast("long")
    gy = F.least(
        F.greatest(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * ny), F.lit(0)
        ),
        F.lit(ny - 1),
    ).cast("long")
    if total % 2 == 0:
        # even bit count: MSB position is odd → lon rides the odd lanes
        return _morton_expr(gy, gx, yb)
    # odd bit count: MSB position is even → lon rides the even lanes
    return _morton_expr(gx, gy, xb)


def geohash_chars_expr(code: Column, precision: int) -> Column:
    """base32 geohash string from an aliased code column (5 bits per
    character, MSB first) — element_at over the literal alphabet, one
    cheap column reference per character."""
    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            alpha,
            (
                F.shiftright(code, 5 * (precision - 1 - i))
                .bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def point_cells_expr(lon: Column, lat: Column, levels: list[int]) -> Column:
    """Array of this point's cell ids at each level (for the multi-level
    covering join: explode + equi-join on cell id). One morton build at
    max(levels); other levels are prefix shifts of it."""
    levels = sorted(levels)
    top = levels[-1]
    x, y = _xy_expr(lon, lat, top)
    m = _morton_expr(x, y, top)
    cells = []
    for lv in levels:
        shifted = F.shiftright(m, 2 * (top - lv)) if lv < top else m
        cells.append(F.shiftleft(shifted, 6).bitwiseOR(F.lit(lv)).cast("long"))
    return F.array(*cells)
