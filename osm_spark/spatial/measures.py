"""Catalyst-native geometry measures over the locations shape column.

Per-polygon area / perimeter / bbox / vertex counts as PURE Spark SQL
expressions (transform/aggregate/zip_with over the nested ring arrays)
— zero Python, zero shuffle beyond the caller's own layout, fully
inside whole-stage codegen.  This is the boundary-statistics surface a
100-TB tile/assignment job wants next to the PIP join (e.g. density
normalization by admin area, perimeter-to-area compactness screens)
without ever leaving the JVM.

Semantics (matching the repo's kernel conventions):

- ring area: |shoelace|/2 over the CLOSED ring (first == last, so the
  wrap term is the explicit last edge — kernels/winding.py convention);
- polygon area: outer ring area MINUS the sum of hole areas;
- perimeter: sum of Euclidean edge lengths over ALL rings (outer +
  holes), the boundary length a rasterized density grid sees;
- bbox: min/max over every ring vertex (holes cannot extend it for
  valid geometry, but degenerate inputs stay well-defined);
- signed shoelace fold order is ring order — deterministic, and exact
  (order-independent) whenever coordinates are integer-valued doubles
  with products under 2^53, which is how the q57 oracle pins parity.

All expressions are LINEAR trees (transform + aggregate), not
unrolled shift-and-mask chains — the codegen-safety rule the Morton
encoder established (kernels/cells_sql.py note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ring_signed_area2(ring: Column) -> Column:
    """2× signed shoelace area of one closed ring (array<point>).

    Guarded for degenerate (<2 point) rings: Spark's sequence(0, -1)
    counts DOWN, which would index ring[-1] and poison the fold with
    nulls — such rings contribute 0 instead."""
    n = F.size(ring)
    terms = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1],
    )
    return F.when(
        n >= 2, F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    ).otherwise(F.lit(0.0))


def _ring_perimeter(ring: Column) -> Column:
    n = F.size(ring)
    terms = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.sqrt(
            (ring[i + 1][0] - ring[i][0]) * (ring[i + 1][0] - ring[i][0])
            + (ring[i + 1][1] - ring[i][1]) * (ring[i + 1][1] - ring[i][1])
        ),
    )
    return F.when(
        n >= 2, F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    ).otherwise(F.lit(0.0))


def polygon_measures(locations: DataFrame) -> DataFrame:
    """(rel_id, poly_idx, area, perimeter, n_rings, n_points,
    lon_min, lat_min, lon_max, lat_max) for every polygon of every
    relation's multipolygon — one narrow projection, no UDFs."""
    polys = locations.select(
        "rel_id", F.posexplode("shape").alias("poly_idx", "poly")
    )
    ring_areas = F.transform(F.col("poly"), _ring_signed_area2)
    area = F.abs(ring_areas[0]) / 2 - F.aggregate(
        F.slice(ring_areas, 2, F.greatest(F.size(ring_areas) - 1, F.lit(0))),
        F.lit(0.0),
        lambda acc, a2: acc + F.abs(a2) / 2,
    )
    perimeter = F.aggregate(
        F.transform(F.col("poly"), _ring_perimeter),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )
    flat = F.flatten(F.col("poly"))
    lons = F.transform(flat, lambda p: p[0])
    lats = F.transform(flat, lambda p: p[1])
    return polys.select(
        "rel_id",
        "poly_idx",
        area.alias("area"),
        perimeter.alias("perimeter"),
        F.size("poly").alias("n_rings"),
        F.size(flat).alias("n_points"),
        F.array_min(lons).alias("lon_min"),
        F.array_min(lats).alias("lat_min"),
        F.array_max(lons).alias("lon_max"),
        F.array_max(lats).alias("lat_max"),
    )
