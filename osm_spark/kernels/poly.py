"""Polygon construction from rings: inclusion matrix → DAG → trees → holes.

Semantics parity with /root/reference/poly.go:
- ``compute_inclusion`` (poly.go:11-38): pairwise containment matrix with
  the equal-shape cancellation rule (mutually-containing rings cancel).
- ``make_inclusion_graph`` / ``make_inclusion_tree`` (poly.go:48-130):
  DAG of containment edges, pruned to a tree by keeping the parent on the
  longest chain from each root; cycles are an error.
- ``trees_to_polygons`` (poly.go:194-214): root=outer, children=holes,
  grandchildren recurse as new roots (islands-in-lakes).

GEOS is replaced by exact integer geometry: ``Contains`` becomes a
vertex-containment test (every vertex of the inner ring inside-or-on the
outer polygon, with at least one strictly inside unless the shapes are
equal), which matches GEOS on the admin-boundary domain where rings nest
or are disjoint but never partially overlap (the reference itself assumes
this — poly.go:237 "TODO: check polygons do not intersect").

``Buffer(0)`` repair (poly.go:160-177) has no pure-python equivalent; the
engine instead *validates* rings at assembly time (rings.is_valid_ring)
and passes valid rings through unchanged, which is behavior-identical for
valid inputs (buffer(0) is the identity on valid polygons up to ring
orientation/start-point normalization, which winding.py re-normalizes).
"""

from __future__ import annotations

import numpy as np

from osm_spark.kernels.rings import Linestring, Point


class Ring:
    """A closed ring with cached numpy arrays + shoelace area."""

    __slots__ = ("points", "role", "xs", "ys", "area2", "bbox", "_pset")

    def __init__(self, points: list[Point], role: str = "") -> None:
        if len(points) < 4 or points[0] != points[-1]:
            raise ValueError("not a closed ring")
        self.points = points
        self.role = role
        pts = np.asarray(points, dtype=np.int64)
        self.xs = pts[:, 0].astype(np.float64)
        self.ys = pts[:, 1].astype(np.float64)
        # Twice the signed shoelace area, in fixed-point units (float64 —
        # only used for comparisons/argmax, not output coordinates).
        x, y = self.xs, self.ys
        self.area2 = float(np.sum((x[:-1] - x[1:]) * (y[:-1] + y[1:])))
        self.bbox = (
            int(pts[:, 0].min()),
            int(pts[:, 1].min()),
            int(pts[:, 0].max()),
            int(pts[:, 1].max()),
        )
        self._pset: frozenset | None = None

    @property
    def point_set(self) -> frozenset:
        if self._pset is None:
            self._pset = frozenset(self.points)
        return self._pset

    def abs_area2(self) -> float:
        return abs(self.area2)


def point_in_ring(ring: Ring, px: int, py: int) -> int:
    """Exact crossing-number PIP: 1=inside, 0=on boundary, -1=outside.

    Vectorized bbox/coarse pass in float64 (differences are exact),
    falling back to exact integer orientation only on edges whose
    x-interval straddles the point (rare).
    """
    bx0, by0, bx1, by1 = ring.bbox
    if px < bx0 or px > bx1 or py < by0 or py > by1:
        return -1
    x1, y1 = ring.xs[:-1], ring.ys[:-1]
    x2, y2 = ring.xs[1:], ring.ys[1:]
    fx, fy = float(px), float(py)

    # Boundary check: collinear + within bbox of the segment.
    cross = (x2 - x1) * (fy - y1) - (y2 - y1) * (fx - x1)
    on = (
        (cross == 0.0)
        & (np.minimum(x1, x2) <= fx)
        & (fx <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= fy)
        & (fy <= np.maximum(y1, y2))
    )
    if bool(on.any()):
        return 0

    # Crossing number with the half-open rule [y1, y2): exact because all
    # quantities are integers representable in float64 and the products
    # below stay < 2^53 only for differences; for safety near-zero crosses
    # were already classified as boundary above, and sign(cross) is exact
    # whenever |cross| >= 1 in integer arithmetic. Differences are < 2^36
    # (coords < 2^31), so products < 2^72 CAN lose bits — but only the
    # SIGN matters and float64 sign of a±2^72 product is wrong only within
    # ulp of zero, which the exact boundary test above has excluded for
    # points ON edges; for robustness we re-check near-zero crosses
    # exactly.
    straddle = (y1 > fy) != (y2 > fy)
    if not bool(straddle.any()):
        return -1
    idx = np.nonzero(straddle)[0]
    count = 0
    for i in idx.tolist():
        ax, ay = ring.points[i]
        bx, by = ring.points[i + 1]
        # Exact integer orientation of (a,b,p).
        v = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        if (v > 0) == (by > ay):
            count += 1
    return 1 if (count & 1) else -1


def ring_contains(outer: Ring, inner: Ring) -> bool:
    """GEOS-Contains analog on nested-or-disjoint rings.

    True iff every inner vertex is inside-or-on outer AND at least one is
    strictly inside. Equal shapes (same point set) contain each other,
    matching GEOS Contains(g, g) == true, and are cancelled by the caller
    (poly.go:28-36).
    """
    obx0, oby0, obx1, oby1 = outer.bbox
    ibx0, iby0, ibx1, iby1 = inner.bbox
    if ibx0 < obx0 or iby0 < oby0 or ibx1 > obx1 or iby1 > oby1:
        return False
    if inner.point_set == outer.point_set:
        return True
    strict = False
    for p in inner.points[:-1]:
        r = point_in_ring(outer, p[0], p[1])
        if r < 0:
            return False
        if r > 0:
            strict = True
    return strict


def compute_inclusion(rings: list[Ring]) -> list[list[bool]]:
    """Inclusion matrix h[i][j] = rings[i] contains rings[j] (poly.go:11-38)."""
    n = len(rings)
    h = [[False] * n for _ in range(n)]
    for i, outer in enumerate(rings):
        for j, inner in enumerate(rings):
            if i != j and ring_contains(outer, inner):
                h[i][j] = True
    # Exact shapes do not contain themselves (mutual cancellation).
    for i in range(n):
        for j in range(n):
            if h[i][j] and h[j][i]:
                h[i][j] = False
                h[j][i] = False
    return h


class InclusionNode:
    __slots__ = ("id", "ring", "children")

    def __init__(self, id: int, ring: Ring) -> None:
        self.id = id
        self.ring = ring
        self.children: list["InclusionNode"] = []


def make_inclusion_graph(
    contains: list[list[bool]], rings: list[Ring]
) -> dict[int, InclusionNode]:
    """(id -> node) map of the inclusion DAG (poly.go:48-75)."""
    nodes: dict[int, InclusionNode] = {}
    for i, row in enumerate(contains):
        n = nodes.get(i)
        if n is None:
            n = InclusionNode(i, rings[i])
            nodes[i] = n
        for j, ok in enumerate(row):
            if not ok:
                continue
            c = nodes.get(j)
            if c is None:
                c = InclusionNode(j, rings[j])
                nodes[j] = c
            n.children.append(c)
    return nodes


class CycleError(ValueError):
    pass


def make_inclusion_tree(root: InclusionNode) -> None:
    """DAG → tree keeping longest chains; cycle = error (poly.go:78-130)."""
    parents: dict[int, tuple[int, int]] = {}  # child id -> (parent id, weight)
    seen: dict[int, bool] = {}

    def traverse(n: InclusionNode, weight: int) -> None:
        if n.id in seen:
            raise CycleError("cycle detected")
        seen[n.id] = True
        for c in n.children:
            p = parents.get(c.id)
            if p is None or p[1] < weight:
                parents[c.id] = (n.id, weight)
            traverse(c, weight + 1)
        del seen[n.id]

    traverse(root, 0)

    def filter_(n: InclusionNode) -> None:
        kept = []
        for c in n.children:
            if parents.get(c.id, (None,))[0] == n.id:
                kept.append(c)
            filter_(c)
        n.children = kept

    filter_(root)


def make_inclusion_trees(rings: list[Ring]) -> list[InclusionNode]:
    """Roots = rings that are nobody's child (poly.go:132-158)."""
    h = compute_inclusion(rings)
    graph = make_inclusion_graph(h, rings)
    children: set[int] = set()
    for n in graph.values():
        for c in n.children:
            children.add(c.id)
    roots: list[InclusionNode] = []
    for idx in range(len(h)):
        if idx in children:
            continue
        n = graph[idx]
        make_inclusion_tree(n)
        roots.append(n)
    return roots


Polygon = tuple[Ring, list[Ring]]  # (outer, holes)


def trees_to_polygons(roots: list[InclusionNode]) -> list[Polygon]:
    """Alternating-depth walk: outer, holes, islands recurse (poly.go:194-214).

    Unlike the reference we keep (outer, holes) ring structure instead of
    a GEOS Difference — hole subtraction is representational in GeoJSON
    (outer ring + inner rings), so no boolean op is needed; the rings are
    the reference's own Difference inputs.
    """
    polygons: list[Polygon] = []
    stack = list(roots)
    while stack:
        root = stack.pop()
        holes: list[Ring] = []
        for c in root.children:
            holes.append(c.ring)
            for cc in c.children:
                stack.append(cc)
        polygons.append((root.ring, holes))
    return polygons


def make_polygons(rings: list[Linestring]) -> list[Polygon]:
    """Rings → nested polygons (poly.go:223-239)."""
    rs = [Ring(r.points, r.role) for r in rings]
    trees = make_inclusion_trees(rs)
    return trees_to_polygons(trees)


def polygon_area2(poly: Polygon) -> float:
    """Twice the absolute area of outer minus holes (for argmax selection)."""
    outer, holes = poly
    return outer.abs_area2() - sum(h.abs_area2() for h in holes)


def point_in_polygon(poly: Polygon, px: int, py: int) -> bool:
    """Strict GEOS-Contains analog for a point: inside outer, outside all
    holes (boundary counts as not-contained, like GEOS Contains)."""
    outer, holes = poly
    if point_in_ring(outer, px, py) <= 0:
        return False
    for h in holes:
        if point_in_ring(h, px, py) >= 0:
            return False
    return True
