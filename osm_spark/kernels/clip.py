"""Polygon↔box clipping (Sutherland–Hodgman) for tile geometry emission.

Pure-numpy/python kernel (Spark-free) used by the tiling stage: each
admin multipolygon is clipped to every tile box its covering touches.
The clip region is an axis-aligned rectangle (convex), for which
Sutherland–Hodgman is exact; outer rings and holes are clipped
independently — valid for rectilinear-or-simple rings whose hole
nesting survives clipping (holes fully inside the outer remain inside
its clipped form within the tile box).

Output rings keep the input orientation (S-H preserves vertex order),
so winding stays outer-CCW / hole-CW as produced by the assembly stage.
"""

from __future__ import annotations

FloatRing = list[list[float]]


def _clip_ring_halfplane(ring: FloatRing, axis: int, bound: float, keep_less: bool) -> FloatRing:
    """Clip an (open, no closing dup) ring against one half-plane."""
    if not ring:
        return []

    def inside(p) -> bool:
        return p[axis] <= bound if keep_less else p[axis] >= bound

    def intersect(a, b):
        t = (bound - a[axis]) / (b[axis] - a[axis])
        q = [
            a[0] + t * (b[0] - a[0]),
            a[1] + t * (b[1] - a[1]),
        ]
        q[axis] = bound  # exact on the clip line
        return q

    out: FloatRing = []
    n = len(ring)
    for i in range(n):
        cur = ring[i]
        prev = ring[i - 1]
        cin, pin = inside(cur), inside(prev)
        if cin:
            if not pin:
                out.append(intersect(prev, cur))
            out.append([cur[0], cur[1]])
        elif pin:
            out.append(intersect(prev, cur))
    return out


def clip_ring_to_box(
    ring: FloatRing, lon0: float, lat0: float, lon1: float, lat1: float
) -> FloatRing:
    """Clip a CLOSED ring (first == last) to a box; returns a closed
    ring ([] if no overlap; degenerate slivers collapse to [])."""
    open_ring = ring[:-1] if ring and ring[0] == ring[-1] else list(ring)
    r = open_ring
    for axis, bound, keep_less in (
        (0, lon1, True),
        (0, lon0, False),
        (1, lat1, True),
        (1, lat0, False),
    ):
        r = _clip_ring_halfplane(r, axis, bound, keep_less)
        if len(r) < 3:
            return []
    # drop consecutive duplicates (touch-point artifacts)
    dedup: FloatRing = []
    for p in r:
        if not dedup or p != dedup[-1]:
            dedup.append(p)
    if len(dedup) >= 2 and dedup[0] == dedup[-1]:
        dedup.pop()
    if len(dedup) < 3:
        return []
    return dedup + [list(dedup[0])]


def clip_multipolygon_to_box(
    coords: list[list[FloatRing]], lon0: float, lat0: float, lon1: float, lat1: float
) -> list[list[FloatRing]]:
    """Clip a GeoJSON-style multipolygon; polygons whose outer vanishes
    are dropped, holes that vanish are dropped from their polygon."""
    out = []
    for poly in coords:
        shell = clip_ring_to_box(poly[0], lon0, lat0, lon1, lat1)
        if not shell:
            continue
        rings = [shell]
        for hole in poly[1:]:
            h = clip_ring_to_box(hole, lon0, lat0, lon1, lat1)
            if h:
                rings.append(h)
        out.append(rings)
    return out


def ring_area(ring: FloatRing) -> float:
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return abs(a) / 2.0


def multipolygon_area(coords: list[list[FloatRing]]) -> float:
    total = 0.0
    for poly in coords:
        total += ring_area(poly[0]) - sum(ring_area(h) for h in poly[1:])
    return total
