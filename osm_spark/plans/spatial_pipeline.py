"""Extension pipeline: pages × admin polygons (the north rule).

    boundaries (from run_boundaries_pipeline)
      -> polygon covering (interior/boundary cells)
    pages -> geoparse -> (url, lon, lat)
      -> skew-aware cell join + exact PIP refinement (J8)
      -> per-admin-level tile assignments
      -> density rasters, kNN nearest-boundary

Everything here is shaped for 10^12 pages: the page side is touched by
pure Catalyst expressions + one equi-join; geometry only ever meets the
(small) boundary-cell candidate subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_spark.spatial.covering import build_polygon_cells, polygon_geometry
from osm_spark.spatial.geoparse import geoparse_pages
from osm_spark.spatial.pip_join import pip_join
from osm_spark.spatial.tiles import tile_assignments


def run_spatial_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    locations: DataFrame,
    kept: DataFrame,
    min_level: int = 4,
    max_level: int = 12,
    tile_level: int = 7,
    salt: int = 1,
    mode: str = "index",
) -> dict[str, DataFrame]:
    """``mode="index"`` (default): the page side streams through ONE
    mapInPandas pass against a broadcast covering+geometry index — no
    explode, no join, no shuffle on the 10^12-row side (see
    pip_index.py). ``mode="catalyst"``: explode-per-level + broadcast
    cell equi-join + refinement — the path for polygon sides too large
    to broadcast as one index. Both produce identical rows (pinned by
    tests and the q21/q22 oracles).
    """
    geo = geoparse_pages(pages).withColumn(
        "point_id", F.xxhash64("url")
    )
    # points feed both the PIP join and the tile assignment — persist so
    # geoparse runs once.
    points = geo.select("point_id", "url", "lon", "lat").persist()

    pcells = build_polygon_cells(locations, min_level, max_level).persist()
    pgeom = polygon_geometry(locations)

    # No distinct: pip output is unique per (point, rel) by
    # construction (disjoint multipolygon parts / disjoint quadtree
    # cells) — dropping the dedup saves a full shuffle of the largest
    # intermediate. tests assert exact set equality with the oracle.
    if mode == "index":
        from osm_spark.spatial.pip_index import build_pip_index, pip_join_index

        index_bc = spark.sparkContext.broadcast(build_pip_index(pcells, pgeom))
        pip = pip_join_index(
            points.select("point_id", "lon", "lat"), index_bc
        ).select("point_id", "rel_id")
    else:
        pip = pip_join(
            points.select("point_id", "lon", "lat"),
            pcells,
            pgeom,
            # Explicit levels: probing every level in the covering range
            # costs a few extra exploded rows but avoids a separate
            # collect-distinct job before the main action.
            levels=list(range(min_level, max_level + 1)),
            salt=salt,
        ).select("point_id", "rel_id")

    admin_levels = kept.select(
        F.col("id").alias("rel_id"), "admin_level"
    )
    tiles = tile_assignments(pip, points, admin_levels, tile_level)

    return {
        "points": points,
        "polygon_cells": pcells,
        "polygon_geometry": pgeom,
        "pip": pip,
        "tiles": tiles,
    }
