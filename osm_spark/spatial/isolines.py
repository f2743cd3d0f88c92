"""Marching-squares isolines over a density raster — contour extraction.

Completes the raster→vector family (raster.py: run-length rectangles
via ``vectorize_grid``; this module: threshold CONTOURS — the classic
cartographic product over the page-density grid, e.g. "the coastline
of the crawl" at n ≥ t).

Algorithm: the binary field b(gx, gy) = [count ≥ t] sampled at cell
centers; every 2×2 block of centers gets a 4-bit case

    case = 1·b(bx,by) + 2·b(bx+1,by) + 4·b(bx+1,by+1) + 8·b(bx,by+1)

and emits the standard marching-squares segments for that case with
MIDPOINT (non-interpolated) vertices — every endpoint is an edge
midpoint of the block, so in HALF-UNIT integer grid coordinates
(``xh = 2·gx + {0,1,2}``) the geometry is exact int64 end to end: no
float enters, the output is bit-stable across engines and cluster
sizes, and the DuckDB oracle reproduces it from the same 16-case
table. (Linear interpolation of the crossing point is the cosmetic
upgrade; it introduces ratios and is deliberately left out of the
exactness contract.)

Saddle rule (cases 5 and 10 — two opposite corners set): resolved as
if the block CENTER were below threshold, i.e. the two occupied
corners are disconnected and each gets its own corner-cutting
segment. Deterministic by construction; documented here because the
other convention (center-high) flips which diagonal pair connects.

Scale shape: only blocks touching ≥1 occupied cell can emit segments,
so the plan explodes each occupied cell to its ≤4 touching blocks
(4 rows per occupied cell — NOT per grid cell: empty ocean costs
nothing) and runs ONE map-side-combinable groupBy(block) summing bit
weights; cases 0 and 15 (uniform blocks — the interior and exterior
bulk) are filtered before the segment fan-out, and the segment table
rides the plan as a literal array (zero joins, whole-stage codegen).
At 10^12 pages the grid itself is already the bounded artifact
(≤ 4^level cells); isolines add one shuffle over 4×occupied rows.

Multi-threshold: pass several thresholds — each occupied cell fans
out once per threshold that it clears, everything else is shared in
the same single pass (the q143 space-time-cube multi-grain pattern).

No reference counterpart (pmezard/osm rasterizes but never contours);
extension surface alongside raster.py (SURVEY §2.9 spatial ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Edge midpoints in half-units relative to block origin (bx, by):
# bottom (2bx+1, 2by), right (2bx+2, 2by+1), top (2bx+1, 2by+2),
# left (2bx, 2by+1).
_EDGE_XY = {0: (1, 0), 1: (2, 1), 2: (1, 2), 3: (0, 1)}

# case → list of (edge_a, edge_b) segments, edges 0=bottom 1=right
# 2=top 3=left. Saddles (5, 10) use the center-low rule. Segment
# endpoint order within a pair is part of the table (canonical — both
# engines read the same constant), so no runtime canonicalization.
MS_TABLE: dict[int, list[tuple[int, int]]] = {
    1: [(3, 0)],
    2: [(0, 1)],
    3: [(3, 1)],
    4: [(1, 2)],
    5: [(3, 0), (1, 2)],
    6: [(0, 2)],
    7: [(3, 2)],
    8: [(2, 3)],
    9: [(0, 2)],
    10: [(0, 1), (2, 3)],
    11: [(2, 1)],
    12: [(1, 3)],
    13: [(0, 1)],
    14: [(3, 0)],
}


def isolines_py(occupied: set[tuple[int, int]]) -> list[tuple]:
    """Pure-python twin (test oracle): brute-force every touched block.

    Returns sorted (bx, by, mcase, seg, x1h, y1h, x2h, y2h)."""
    blocks: dict[tuple[int, int], int] = {}
    for gx, gy in occupied:
        for dx, dy, w in ((0, 0, 1), (1, 0, 2), (1, 1, 4), (0, 1, 8)):
            key = (gx - dx, gy - dy)
            blocks[key] = blocks.get(key, 0) | w
    out = []
    for (bx, by), mcase in blocks.items():
        for seg, (ea, eb) in enumerate(MS_TABLE.get(mcase, [])):
            ax, ay = _EDGE_XY[ea]
            bx2, by2 = _EDGE_XY[eb]
            out.append(
                (bx, by, mcase, seg, 2 * bx + ax, 2 * by + ay,
                 2 * bx + bx2, 2 * by + by2)
            )
    return sorted(out)


def _seg_table_lit():
    """Literal array indexed by case (1..14): array of (e1, e2)
    structs — rides the plan, no join."""
    return F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.lit(a).cast("int").alias("e1"),
                        F.lit(b).cast("int").alias("e2"),
                    )
                    for a, b in MS_TABLE.get(c, [])
                ]
            )
            for c in range(1, 15)
        ]
    )


def _edge_coord(edge, axis: int, base):
    """half-unit coordinate of an edge midpoint along axis (0=x, 1=y)."""
    tbl = [F.lit(_EDGE_XY[e][axis]).cast("long") for e in range(4)]
    return 2 * base + F.element_at(F.array(*tbl), edge + 1)


def isolines(
    grid: DataFrame, thresholds: list[int], count_col: str = "n"
) -> DataFrame:
    """(thr, bx, by, mcase, seg, x1h, y1h, x2h, y2h) marching-squares
    segments of the ``count ≥ thr`` field for every threshold.

    ``grid``: (gx, gy, n) from ``raster.rasterize_points`` — absent
    cells are below every threshold (the sparse contract)."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    corners = F.array(
        *[
            F.struct(
                F.lit(dx).cast("long").alias("dx"),
                F.lit(dy).cast("long").alias("dy"),
                F.lit(w).cast("int").alias("w"),
            )
            for dx, dy, w in ((0, 0, 1), (1, 0, 2), (1, 1, 4), (0, 1, 8))
        ]
    )
    thr_arr = F.array(*[F.lit(int(t)).cast("long") for t in thresholds])
    occ = (
        grid.select("gx", "gy", F.col(count_col).alias("_n"))
        .select(
            "gx",
            "gy",
            F.explode(
                F.filter(thr_arr, lambda t: F.col("_n") >= t)
            ).alias("thr"),
        )
    )
    blocks = (
        occ.select(
            "thr",
            F.explode(corners).alias("c"),
            F.col("gx"),
            F.col("gy"),
        )
        .select(
            "thr",
            (F.col("gx") - F.col("c.dx")).alias("bx"),
            (F.col("gy") - F.col("c.dy")).alias("by"),
            F.col("c.w").alias("w"),
        )
        .groupBy("thr", "bx", "by")
        .agg(F.sum("w").cast("int").alias("mcase"))
        .where((F.col("mcase") > 0) & (F.col("mcase") < 15))
    )
    segs = blocks.select(
        "thr",
        "bx",
        "by",
        "mcase",
        F.posexplode(
            F.element_at(_seg_table_lit(), F.col("mcase"))
        ).alias("seg", "e"),
    )
    return segs.select(
        "thr",
        "bx",
        "by",
        "mcase",
        F.col("seg").cast("int").alias("seg"),
        _edge_coord(F.col("e.e1"), 0, F.col("bx")).alias("x1h"),
        _edge_coord(F.col("e.e1"), 1, F.col("by")).alias("y1h"),
        _edge_coord(F.col("e.e2"), 0, F.col("bx")).alias("x2h"),
        _edge_coord(F.col("e.e2"), 1, F.col("by")).alias("y2h"),
    )
