"""Polygon-coverage dissolve (union by key) via exact edge cancellation.

The classic admin-hierarchy operation the reference's data model implies
but never implements (communes share exact boundaries with their
département — pmezard/osm geojson.go models the hierarchy via
admin_level tags only): merge every polygon of a group into the union
multipolygon. For a polygon COVERAGE — non-overlapping faces that share
boundaries vertex-for-vertex, which is exactly what OSM admin areas,
grid tiles, and rasterized cells are — the union has a closed-form,
EXACT formulation with no geometry library and no floating-point
robustness questions:

    an undirected edge survives into the dissolved boundary
    iff its directed copies inside the group do not cancel.

Two faces of a coverage share an edge in opposite winding directions,
so interior edges cancel to net 0 and boundary edges keep net ±1.
Everything is integer arithmetic on fixed-point coordinates.

Distributed shape (the 100-TB plan):

1. ONE Catalyst projection explodes every ring into directed edges
   (flatten + transform + explode — JVM codegen, no Python);
2. ONE map-side-combinable groupBy(group, canonical_edge) sums winding
   signs — shuffle volume is O(edges), and interior edges (the vast
   majority of a fine-grained coverage) vanish right here;
3. the per-group SURVIVING boundary (tiny: O(perimeter), not O(faces))
   is stitched back into rings / nested polygons by the same
   backtracking-DFS + inclusion-tree kernels the reference's relation
   assembly uses (kernels/rings.py make_rings, kernels/poly.py
   make_polygons) inside one applyInPandas — the parallelism unit is
   the GROUP, same contract as assemble_locations (never salt it).

Coordinate contract: shape coordinates are integer-VALUED doubles in
any fixed-point unit (the q57 measures convention). Output keeps the
unit, winding-normalized (outer CCW, holes CW — winding.py convention)
and canonicalized (every ring starts at its lexicographically smallest
vertex, polygons sorted by outer-ring start) so the result is
engine- and parallelism-reproducible bit-for-bit.

Diagnostics: a coverage violation (two faces OVERLAPPING an edge in
the same direction) leaves |net| > 1; those edges are counted in
``invalid_edges`` and stitched with multiplicity so nothing is
silently dropped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_faces(
    cells: DataFrame, group_col: str, gx: str = "gx", gy: str = "gy"
) -> DataFrame:
    """(group, shape) unit-square faces from integer grid cells — the
    coverage input :func:`dissolve` consumes for rasterized footprints
    (occupied cells per admin area → merged multipolygons). Cell
    coordinates ARE the grid indices, so the dissolved geometry stays
    exact-integer. One shared builder so the pinned query (q122) and
    the bench leg provably dissolve the identical shape."""
    cgx = F.col(gx).cast("double")
    cgy = F.col(gy).cast("double")
    ring = F.array(
        F.array(cgx, cgy),
        F.array(cgx + 1, cgy),
        F.array(cgx + 1, cgy + 1),
        F.array(cgx, cgy + 1),
        F.array(cgx, cgy),
    )
    return cells.select(group_col, F.array(F.array(ring)).alias("shape"))


def _all_edges(shape_col: str) -> Column:
    """array<struct(a:array<double>, b:array<double>)> of every directed
    ring edge of the multipolygon (closed rings: first == last, so
    edges i -> i+1 for i in [0, n-2] cover the ring exactly once)."""
    rings = F.flatten(F.col(shape_col))
    ring_edges = lambda r: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.size(r) - 2),
        lambda i: F.struct(r[i].alias("a"), r[i + 1].alias("b")),
    )
    # Guard degenerate (<2 point) rings: sequence(0, -1) counts DOWN
    # (the measures.py lesson) — give them no edges instead.
    guarded = F.filter(rings, lambda r: F.size(r) >= 2)
    return F.flatten(F.transform(guarded, ring_edges))


def coverage_boundary_edges(
    df: DataFrame, group_col: str, shape_col: str = "shape"
) -> DataFrame:
    """Surviving (non-cancelling) boundary edges per group.

    Returns (``group_col``, ax, ay, bx, by, net): the undirected edge
    (a, b) with a < b lexicographically; ``net`` is the surviving
    winding sign (+n = the a->b direction won, -n = b->a; |net| = 1
    for a valid coverage, >1 marks an overlap violation). The sign
    preserves the coverage's interior-on-the-left orientation — the
    information the face-tracing stitcher needs to split pinch
    vertices correctly. Interior shared edges cancel inside ONE
    map-side-combinable aggregate, so the shuffle ships at most the
    distinct-edge set and the output is O(total boundary length) —
    independent of how many faces merged.
    """
    e = df.select(
        F.col(group_col), F.explode(_all_edges(shape_col)).alias("e")
    ).select(
        group_col,
        F.col("e.a")[0].cast("long").alias("ax"),
        F.col("e.a")[1].cast("long").alias("ay"),
        F.col("e.b")[0].cast("long").alias("bx"),
        F.col("e.b")[1].cast("long").alias("by"),
    )
    e = e.where((F.col("ax") != F.col("bx")) | (F.col("ay") != F.col("by")))
    swapped = (F.col("ax") > F.col("bx")) | (
        (F.col("ax") == F.col("bx")) & (F.col("ay") > F.col("by"))
    )
    pick = lambda yes, no: F.when(swapped, F.col(yes)).otherwise(F.col(no))  # noqa: E731
    canon = e.select(
        group_col,
        pick("bx", "ax").alias("ax"),
        pick("by", "ay").alias("ay"),
        pick("ax", "bx").alias("bx"),
        pick("ay", "by").alias("by"),
        F.when(swapped, F.lit(-1)).otherwise(F.lit(1)).alias("sign"),
    )
    return (
        canon.groupBy(group_col, "ax", "ay", "bx", "by")
        .agg(F.sum("sign").alias("net"))
        .where(F.col("net") != 0)
        .select(
            group_col,
            "ax",
            "ay",
            "bx",
            "by",
            F.col("net").cast("int").alias("net"),
        )
    )


def _canon_ring(points: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Rotate a closed ring so the lexicographically smallest vertex
    leads (orientation preserved) — the deterministic representative of
    the ring's rotation class."""
    core = points[:-1]
    k = min(range(len(core)), key=lambda i: core[i])
    rot = core[k:] + core[:k]
    return rot + [rot[0]]


def _polygons_to_canonical_coords(polygons) -> list:
    """Winding-normalized (outer CCW, holes CW — winding.py convention),
    rotation-canonicalized, deterministically ordered multipolygon
    coordinates in the INPUT's fixed-point unit (no /1e7 rescale)."""
    from osm_spark.kernels.winding import is_clockwise

    shapes = []
    for outer, holes in polygons:
        shell = [[float(x), float(y)] for (x, y) in outer.points]
        if is_clockwise(shell):
            shell.reverse()
        rings = [_canon_ring([tuple(map(int, p)) for p in shell])]
        hole_rings = []
        for hole in holes:
            hr = [[float(x), float(y)] for (x, y) in hole.points]
            if not is_clockwise(hr):
                hr.reverse()
            hole_rings.append(_canon_ring([tuple(map(int, p)) for p in hr]))
        rings.extend(sorted(hole_rings))
        shapes.append(rings)
    shapes.sort(key=lambda poly: poly[0])
    return [
        [[[float(x), float(y)] for (x, y) in ring] for ring in poly]
        for poly in shapes
    ]


def _rot_rank(d: tuple[int, int], e: tuple[int, int]) -> int:
    """Bucket of the CCW rotation from direction ``d`` to ``e``:
    0 = left turn (0°, 180°), 1 = u-turn (180°), 2 = right turn
    (180°, 360°), 3 = straight through (0°/360°). Exact integers."""
    cross = d[0] * e[1] - d[1] * e[0]
    dot = d[0] * e[0] + d[1] * e[1]
    if cross > 0:
        return 0
    if cross < 0:
        return 2
    return 1 if dot < 0 else 3


def _trace_rings(edges: list[tuple]) -> list[list[tuple[int, int]]]:
    """Decompose directed boundary edges into faces with the planar
    sharpest-left-turn rule.

    The surviving edges keep the coverage's winding (interior on the
    LEFT), and that orientation disambiguates the Eulerian
    decomposition at pinch vertices where an undirected ring DFS can
    legally — but wrongly — merge two corner-touching faces into an
    outer + a hole of identical area and edge set (4 unit faces around
    an excluded center cell is the minimal case). At each vertex the
    successor of an incoming edge is the unused outgoing edge with the
    SMALLEST positive CCW rotation (sharpest left turn; straight-
    through ranks last so corner-crossing boundaries never fuse).
    All comparisons are exact integer cross/dot products."""
    out_adj: dict[tuple[int, int], list[list]] = {}
    for a, b in edges:
        out_adj.setdefault(a, []).append([b, False])
    for lst in out_adj.values():
        lst.sort(key=lambda x: x[0])  # deterministic tie order
    rings = []
    for a0, b0 in edges:
        # find an unused copy of the starting edge
        slot0 = next(
            (s for s in out_adj[a0] if s[0] == b0 and not s[1]), None
        )
        if slot0 is None:
            continue
        slot0[1] = True
        ring = [a0, b0]
        prev, cur = a0, b0
        while True:
            d = (cur[0] - prev[0], cur[1] - prev[1])
            # candidate continuations: unused out-edges at cur, plus —
            # once back at the start vertex — closing onto the first
            # edge, which competes by the same turn rule (a face may
            # legitimately pass THROUGH its start vertex and close on
            # a later visit).
            cand: list = [s for s in out_adj.get(cur, ()) if not s[1]]
            if cur == a0:
                cand.append(None)  # None = close the ring here
            best, best_key = None, None
            chosen_close = False
            for s in cand:
                nxt = b0 if s is None else s[0]
                e = (nxt[0] - cur[0], nxt[1] - cur[1])
                key = (_rot_rank(d, e), e)
                if best_key is None or _turn_less(key, best_key):
                    best, best_key, chosen_close = s, key, s is None
            if best_key is None:
                break  # dead end: invalid input, defensive stop
            if chosen_close:
                break  # sharpest turn is the closing edge: face done
            best[1] = True
            ring.append(best[0])
            prev, cur = cur, best[0]
        if ring[-1] != a0:
            ring.append(a0)  # defensive close (invalid input)
        rings.append(ring)
    return rings


def _unclosed(rings: list[list[tuple[int, int]]], edges: list) -> int:
    """Edges the defensive close invented (0 for valid coverages)."""
    return sum(len(r) - 1 for r in rings) - len(edges)


def _turn_less(ka, kb) -> bool:
    """ka turns more sharply left than kb (exact integer compare)."""
    ra, ea = ka
    rb, eb = kb
    if ra != rb:
        return ra < rb
    if ra in (1, 3):
        return ea < eb  # parallel directions: deterministic tie
    # same open half-plane: smaller CCW rotation == CCW-before
    cross = ea[0] * eb[1] - ea[1] * eb[0]
    if cross != 0:
        return cross > 0
    return ea < eb


def _stitch_group(key, pdf):
    """Surviving DIRECTED boundary edges of ONE group -> nested
    multipolygon: sharpest-left-turn face tracing (exact, orientation-
    aware) + the reference-parity inclusion-tree hole nesting
    (kernels/poly.py make_polygons)."""
    from osm_spark.kernels.poly import make_polygons
    from osm_spark.kernels.rings import Linestring

    rows = sorted(
        (int(r.ax), int(r.ay), int(r.bx), int(r.by), int(r.net))
        for r in pdf.itertuples()
    )
    invalid = sum(abs(n) - 1 for *_edge, n in rows)
    edges = []
    for ax, ay, bx, by, net in rows:
        a, b = ((ax, ay), (bx, by)) if net > 0 else ((bx, by), (ax, ay))
        for _ in range(abs(net)):
            edges.append((a, b))
    try:
        traced = _trace_rings(edges)
        lines = [
            Linestring(i + 1, pts) for i, pts in enumerate(traced)
        ]
        polys = make_polygons(lines)
        coords = _polygons_to_canonical_coords(polys)
        warns: list[str] = []
        extra = _unclosed(traced, edges)
        if extra:
            warns.append(f"{extra} defensive closing edge(s) invented")
        return pd.DataFrame(
            {
                "g": [key[0]],
                "shape": [coords],
                "n_polygons": [len(coords)],
                "n_rings": [sum(len(p) for p in coords)],
                "invalid_edges": [invalid],
                "warning": ["; ".join(warns) if warns else None],
            }
        )
    except Exception as exc:  # per-group print-and-continue contract
        return pd.DataFrame(
            {
                "g": [key[0]],
                "shape": [None],
                "n_polygons": [0],
                "n_rings": [0],
                "invalid_edges": [invalid],
                "warning": [f"stitch failed: {exc}"],
            }
        )


def dissolve(
    df: DataFrame, group_col: str, shape_col: str = "shape"
) -> DataFrame:
    """Union every group's polygons into one canonical multipolygon.

    Input: any DataFrame with ``group_col`` and a 4-nested multipolygon
    ``shape_col`` of integer-valued fixed-point coordinates. Output:
    (``group_col``, shape, n_polygons, n_rings, invalid_edges,
    warning), one row per group.

    Cost model at 10^12 faces: stage 1-2 are one projection + one
    map-side-combinable groupBy over the edge multiset (interior edges
    — ~all of them — cancel in the combiner); stage 3's per-group work
    is O(surviving boundary), which for admin-style coverages is ~1e2
    to ~1e5 edges per group regardless of face count. The group is the
    parallelism unit (10^4-10^6 groups at planet scale) — same
    distribution contract as assemble_locations.
    """
    g_type = dict(df.dtypes)[group_col]
    schema = (
        f"g {g_type}, shape array<array<array<array<double>>>>, "
        "n_polygons int, n_rings int, invalid_edges int, warning string"
    )
    edges = coverage_boundary_edges(df, group_col, shape_col)
    out = edges.groupBy(group_col).applyInPandas(_stitch_group, schema)
    return out.withColumnRenamed("g", group_col)
