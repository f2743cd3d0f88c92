"""Raster ↔ vector paths.

rasterize_points: point density grid at a cell level — one groupBy
(pure Catalyst, map-side combinable) over the Morton cell id; the grid
coordinate (gx, gy) is decoded with the same bit ops.

rasterize_polygons: boundary-density grid — polygon covering cells
normalized to the grid level, counted per cell.

vectorize_grid: raster → vector via run-length vectorization: occupied
cells merge into maximal horizontal spans (gaps-and-islands over a
window), each span emitted as a rectangle polygon. Fully relational —
no UDF — and therefore also expressible as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.spatial.cells_sql import cell_expr, cell_parent_expr


def cell_xy_cols(cell: Column, level: int) -> tuple[Column, Column]:
    """Decode grid (gx, gy) from a cell id at a known level.

    Linear de-interleave (one reference to ``cell`` per bit term) — the
    shift-and-mask compaction would double the Catalyst tree per step
    and knock the plan out of whole-stage codegen (see cells_sql)."""
    m = F.shiftright(cell, 6)
    gx = None
    gy = None
    for i in range(max(level, 1)):
        bx = F.shiftleft(F.shiftright(m, 2 * i).bitwiseAND(F.lit(1)), i)
        by = F.shiftleft(F.shiftright(m, 2 * i + 1).bitwiseAND(F.lit(1)), i)
        gx = bx if gx is None else gx.bitwiseOR(bx)
        gy = by if gy is None else gy.bitwiseOR(by)
    return gx.cast("long"), gy.cast("long")


def rasterize_points(
    points: DataFrame, level: int, digest_cols: list | None = None
) -> DataFrame:
    """(gx, gy, n) density grid from (lon, lat) rows.

    ``digest_cols``: optional token columns — adds ``px_digest``, an
    md5 over the lexicographically-sorted multiset of colon-joined
    tokens per cell (the q53 fid_digest pattern), so an oracle checks
    WHICH points landed in each cell, not just how many. One extra
    map-side collect_list per cell; omit on the pure-density hot path."""
    cell = cell_expr(F.col("lon"), F.col("lat"), level)
    if digest_cols is None:
        df = points.select(cell.alias("cell")).groupBy("cell").agg(
            F.count("*").alias("n")
        )
    else:
        token = F.concat_ws(":", *[F.col(c).cast("string") for c in digest_cols])
        df = (
            points.select(cell.alias("cell"), token.alias("t"))
            .groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                F.md5(
                    F.concat_ws(",", F.array_sort(F.collect_list("t")))
                ).alias("px_digest"),
            )
        )
    gx, gy = cell_xy_cols(F.col("cell"), level)
    return df.select(
        gx.alias("gx"), gy.alias("gy"), "n",
        *(["px_digest"] if digest_cols is not None else []),
    )


def rasterize_polygons(polygon_cells: DataFrame, level: int) -> DataFrame:
    """(gx, gy, n_polygons) boundary-density grid from covering cells
    (boundary cells only — where geometry actually lives)."""
    df = (
        polygon_cells.where(~F.col("interior"))
        .select(cell_parent_expr(F.col("cell"), level).alias("cell"), "rel_id")
        .distinct()
        .groupBy("cell")
        .agg(F.count("*").alias("n_polygons"))
    )
    gx, gy = cell_xy_cols(F.col("cell"), level)
    return df.select(gx.alias("gx"), gy.alias("gy"), "n_polygons")


def vectorize_grid(grid: DataFrame, level: int, min_count: int = 1) -> DataFrame:
    """Raster → vector: merge occupied cells into maximal horizontal
    spans; emit each as a rectangle (lon0, lat0, lon1, lat1, ring).

    Gaps-and-islands: gx - row_number() is constant within a run."""
    n = 1 << level
    w = 360.0 / n
    h = 180.0 / n
    occ = grid.where(F.col("n") >= min_count) if "n" in grid.columns else grid
    win = Window.partitionBy("gy").orderBy("gx")
    spans = (
        occ.withColumn("grp", F.col("gx") - F.row_number().over(win))
        .groupBy("gy", "grp")
        .agg(F.min("gx").alias("x0"), F.max("gx").alias("x1"), F.sum("n").alias("n"))
    )
    lon0 = F.lit(-180.0) + F.col("x0") * F.lit(w)
    lon1 = F.lit(-180.0) + (F.col("x1") + 1) * F.lit(w)
    lat0 = F.lit(-90.0) + F.col("gy") * F.lit(h)
    lat1 = F.lit(-90.0) + (F.col("gy") + 1) * F.lit(h)
    return spans.select(
        lon0.alias("lon0"),
        lat0.alias("lat0"),
        lon1.alias("lon1"),
        lat1.alias("lat1"),
        "n",
        F.array(
            F.array(lon0, lat0),
            F.array(lon1, lat0),
            F.array(lon1, lat1),
            F.array(lon0, lat1),
            F.array(lon0, lat0),
        ).alias("ring"),
    )
