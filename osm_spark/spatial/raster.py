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


def focal_stats(
    grid: DataFrame,
    level: int,
    radius: int = 1,
    value: str = "n",
    wrap_lon: bool = True,
    kernel: str = "uniform",
) -> DataFrame:
    """Moving-window (focal) statistics over a density grid — the
    standard GIS raster-analytics step after rasterize_points (focal
    sum / mean / max smoothing of a heatmap).

    For every cell within Chebyshev distance ``radius`` of an occupied
    cell: (gx, gy, focal_sum, n_cells, focal_max, focal_mean) over the
    occupied cells in its (2r+1)² window. Sparse semantics: target
    cells with NO occupied neighbor don't exist (the empty ocean emits
    nothing), and ``n_cells`` counts occupied contributors, not window
    slots; ``focal_mean`` divides by the FULL window area (so it is
    the true smoothed density, zeros included) — one IEEE division of
    two exact integers.

    Scale shape: the input is already the CELLS-scale aggregate, so
    the fan-out is ≤ occupied_cells × (2r+1)² rows and the groupBy is
    map-side combinable — point count never matters. ``wrap_lon``
    wraps the x fan across the antimeridian (hotspots' adjacency
    convention); the y fan clips at the poles.

    ``kernel``: "uniform" (every window slot weighs 1 — the plain
    moving average) or "triangle" (w = radius+1 − Chebyshev distance —
    the KDE-style tent smoother; still exact INT64 weights, so the
    weighted sum stays order-free and engine-reproducible, and
    focal_mean divides by the kernel MASS over the full window).
    n_cells / focal_max are unweighted under either kernel.
    """
    n = 1 << level
    if 2 * radius + 1 > n:
        # a window wider than the grid would revisit wrapped cells
        # (pmod maps several dx to one residue) and break both the
        # count and the mean's window-area denominator
        raise ValueError(
            f"window (2*{radius}+1) exceeds the level-{level} grid width"
        )
    if kernel not in ("uniform", "triangle"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if kernel == "uniform":
        mass = (2 * radius + 1) ** 2
    else:
        mass = (radius + 1) + sum(
            8 * c * (radius + 1 - c) for c in range(1, radius + 1)
        )
    seq = F.sequence(F.lit(-radius), F.lit(radius))
    fan = grid.select(
        F.col("gx"), F.col("gy"), F.col(value).alias("_v")
    ).select(
        "*", F.explode(seq).alias("dx")
    ).select("*", F.explode(seq).alias("dy"))
    tx = (
        F.pmod(F.col("gx") + F.col("dx"), F.lit(n))
        if wrap_lon
        else F.col("gx") + F.col("dx")
    )
    ty = F.col("gy") + F.col("dy")
    w = (
        F.lit(1).cast("long")
        if kernel == "uniform"
        else (
            F.lit(radius + 1)
            - F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy")))
        ).cast("long")
    )
    fan = fan.select(
        tx.alias("tx"), ty.alias("ty"), "_v", w.alias("_w")
    ).where(F.col("ty").between(0, n - 1))
    if not wrap_lon:
        fan = fan.where(F.col("tx").between(0, n - 1))
    out = fan.groupBy("tx", "ty").agg(
        F.sum(F.col("_w") * F.col("_v")).alias("focal_sum"),
        F.count("*").cast("long").alias("n_cells"),
        F.max("_v").alias("focal_max"),
    )
    return out.select(
        F.col("tx").alias("gx"),
        F.col("ty").alias("gy"),
        "focal_sum",
        "n_cells",
        "focal_max",
        (F.col("focal_sum") / F.lit(mass)).alias("focal_mean"),
    )


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
