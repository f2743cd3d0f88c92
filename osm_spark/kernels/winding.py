"""Winding normalization + fixed-point→degrees conversion.

Semantics parity with /root/reference/geojson.go:150-225:
- ``is_clockwise``: shoelace with the reference's exact convention
  (area += (x2-x1)*(y2+y1); area > 0 ⇒ clockwise).
- ``polygons_to_coords``: outer ring forced counter-clockwise, holes
  forced clockwise, reversal in place; conversion float(c)/1e7 happens
  here, exactly at the JSON boundary (ring.go:184-189).

Output shape is the reference's ``Location.Coordinates``:
polygons → rings → points → [lon, lat] (geojson.go:122-125).
"""

from __future__ import annotations

from osm_spark.kernels.poly import Polygon, Ring

MultiPolygonCoords = list[list[list[list[float]]]]


def ring_to_float(ring: Ring) -> list[list[float]]:
    return [[x / 1e7, y / 1e7] for (x, y) in ring.points]


def is_clockwise(ring: list[list[float]]) -> bool:
    """Shoelace sign, reference convention (geojson.go:150-165)."""
    if len(ring) < 3:
        return False
    area = 0.0
    for i in range(1, len(ring)):
        p1 = ring[i - 1]
        p2 = ring[i]
        area += (p2[0] - p1[0]) * (p2[1] + p1[1])
    p1 = ring[-1]
    p2 = ring[0]
    area += (p2[0] - p1[0]) * (p2[1] + p1[1])
    return area > 0


def polygons_to_coords(polygons: list[Polygon]) -> MultiPolygonCoords:
    """Normalize winding and emit float coordinates (geojson.go:174-225)."""
    shapes: MultiPolygonCoords = []
    for outer, holes in polygons:
        rings: list[list[list[float]]] = []
        shell = ring_to_float(outer)
        if is_clockwise(shell):
            shell.reverse()
        rings.append(shell)
        for hole in holes:
            hr = ring_to_float(hole)
            if not is_clockwise(hr):
                hr.reverse()
            rings.append(hr)
        shapes.append(rings)
    return shapes
