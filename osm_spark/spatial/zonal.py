"""Zonal statistics: raster grid → per-polygon aggregates.

The raster→vector transfer completing the matrix (rasterize_points:
points→raster; areal_interpolate: polygon values→raster; zonal: raster
values→polygon): per admin area, aggregate the cells of a density /
score grid. A grid cell belongs to an area iff its CENTER is inside —
the same center-inclusion semantics the areal operator and the PIP
join are pinned to, so the three transfers compose consistently.

Scale shape — center tests are paid ONLY near boundaries:

1. **Direct interior** — a covering INTERIOR cell at level ≤ L is an
   ancestor of grid cells that are fully inside; membership is prefix
   arithmetic (grid side fans to its L+1 ancestors — cells-scale —
   and equi-joins the coarse interior covering). No geometry touched.
2. **Candidates** — covering cells FINER than the grid (interior
   lv > L and boundary cells at sub level S) name the only grid cells
   whose center could go either way: their L-ancestors. Distinct
   (rel, cell) pairs, cells-scale.
3. **Center PIP** — candidate cell centers go through the broadcast
   PipIndex (the X3 zero-shuffle path); union with the direct set,
   distinct, join values, ONE map-side-combinable groupBy(rel).

Exactness: values are int64; per-rel total/count/max are order-free;
``zonal_mean`` is ONE IEEE division of two exact integers. Center
coordinates at level L are exact binary doubles (360/2^L halves), so
the inside test is bit-deterministic on both engines.

No reference counterpart; training-data extension surface
(SURVEY §2.9 X95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.cells_sql import _morton_expr
from osm_spark.spatial.raster import cell_xy_cols


def zonal_stats(
    grid: DataFrame,
    polygon_cells: DataFrame,
    index_bc,
    level: int,
    sub_level: int,
    value_col: str = "n",
) -> DataFrame:
    """(rel_id, n_cells, total, vmax, zonal_mean) per admin area from
    a (gx, gy, value) grid at ``level`` and a polygon covering built
    with ``max_level=sub_level`` (boundary cells live there — guarded
    in-plan like areal_interpolate). See module docstring."""
    L, S = level, sub_level
    if not 0 <= L <= S:
        raise ValueError("need 0 <= level <= sub_level")
    g = grid.select(
        _morton_expr(F.col("gx"), F.col("gy"), L).alias("mL"),
        F.col(value_col).cast("long").alias("v"),
    )
    lv = F.col("cell").bitwiseAND(F.lit(0x3F))
    m = F.shiftright(F.col("cell"), 6)
    cells = polygon_cells.select("rel_id", "cell", "interior").distinct()
    guarded_lv = F.when(
        F.col("interior") | (lv == F.lit(S)), lv
    ).otherwise(
        F.raise_error(
            F.lit(
                f"zonal_stats: boundary covering cell not at "
                f"sub_level={S} — rebuild covering with max_level=sub_level"
            )
        )
    )
    cells = cells.select("rel_id", "cell", "interior", guarded_lv.alias("lv"), m.alias("m"))

    coarse = cells.where(F.col("interior") & (F.col("lv") <= L)).select(
        "rel_id", F.col("lv").cast("int").alias("alv"), F.col("m").alias("am")
    )
    ganc = g.select(
        "mL",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(l).alias("alv"),
                        F.shiftright(F.col("mL"), 2 * (L - l)).alias("am"),
                    )
                    for l in range(L + 1)
                ]
            )
        ).alias("a"),
    ).select("mL", F.col("a.alv").alias("alv"), F.col("a.am").alias("am"))
    direct = ganc.join(coarse, ["alv", "am"]).select("rel_id", "mL")

    # Fine covering cells name candidate grid cells; at S == L the
    # boundary cells ARE grid cells (shift 0) and must still be tested.
    cand = cells.where(
        (F.col("lv") > L) | (~F.col("interior") & (F.col("lv") == L))
    ).select(
        "rel_id",
        F.call_function(
            "shiftright", F.col("m"), ((F.col("lv") - F.lit(L)) * 2).cast("int")
        ).alias("mL"),
    ).distinct()

    from osm_spark.spatial.pip_index import pip_join_index

    n = 1 << L
    cellL = F.shiftleft(F.col("mL"), 6).bitwiseOR(F.lit(L))
    gx, gy = cell_xy_cols(cellL, L)
    centers = cand.select("mL").distinct().select(
        F.col("mL").alias("point_id"),
        (F.lit(-180.0) + (gx.cast("double") + F.lit(0.5)) * F.lit(360.0 / n))
        .alias("lon"),
        (F.lit(-90.0) + (gy.cast("double") + F.lit(0.5)) * F.lit(180.0 / n))
        .alias("lat"),
    )
    inside_pip = pip_join_index(centers, index_bc).select(
        "rel_id", F.col("point_id").alias("mL")
    )

    inside = direct.unionByName(inside_pip).distinct()
    return (
        inside.join(g, "mL")
        .groupBy("rel_id")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum("v").alias("total"),
            F.max("v").alias("vmax"),
        )
        .select(
            "rel_id",
            "n_cells",
            "total",
            "vmax",
            (F.col("total") / F.col("n_cells")).alias("zonal_mean"),
        )
    )
