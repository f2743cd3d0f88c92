"""Polygon → cell covering (the scale path for spatial joins, J8).

Each assembled admin polygon is covered by quadtree cells: interior
cells stay coarse (points landing there are accepted without exact
geometry), boundary cells refine to ``max_level`` (points there go
through exact point-in-polygon). This is the standard S2ShapeIndex-style
decomposition; the quadtree kernel is osm_spark.kernels.cells
(pure numpy, no external libs).

Runs as mapInPandas over the locations checkpoint: one covering per
polygon, Arrow-batched. Output is the cell↔polygon table — the small,
explode-once side of the PIP join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.kernels.cells import cover_polygon

CELLS_SCHEMA = "rel_id long, poly_idx int, cell long, interior boolean"


def build_polygon_cells(
    locations: DataFrame, min_level: int = 4, max_level: int = 12
) -> DataFrame:
    """(rel_id, poly_idx, cell, interior) covering of every polygon of
    every relation's multipolygon."""

    # Spread polygons across tasks: the source table has few rows, and
    # covering cost varies per polygon — round-robin repartition keeps
    # every core busy instead of one task covering everything.
    sc = locations.sparkSession.sparkContext
    polys = locations.select(
        "rel_id", F.posexplode("shape").alias("poly_idx", "poly")
    ).repartition(sc.defaultParallelism)

    def cover(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rel, out_idx, out_cell, out_int = [], [], [], []
            for row in pdf.itertuples():
                cells, interior = cover_polygon(
                    row.poly, min_level=min_level, max_level=max_level
                )
                out_rel.extend([int(row.rel_id)] * len(cells))
                out_idx.extend([int(row.poly_idx)] * len(cells))
                out_cell.extend(cells)
                out_int.extend(interior)
            yield pd.DataFrame(
                {
                    "rel_id": out_rel,
                    "poly_idx": out_idx,
                    "cell": out_cell,
                    "interior": out_int,
                }
            )

    return polys.mapInPandas(cover, CELLS_SCHEMA)


def polygon_geometry(locations: DataFrame) -> DataFrame:
    """(rel_id, poly_idx, poly) exact float geometry for PIP refinement."""
    return locations.select(
        "rel_id", F.posexplode("shape").alias("poly_idx", "poly")
    )
