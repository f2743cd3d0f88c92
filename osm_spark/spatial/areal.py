"""Areal (area-weighted) interpolation: polygon values → raster grid.

The classic GIS transfer step (dasymetric mapping): a per-admin-area
value (population, doc counts, a quality score) is spread over the
cells of a raster proportional to how much of each cell the area
covers. Exact float polygon∩cell areas are not engine-reproducible,
so the operator DEFINES the weight on the quadtree itself:

    frac(cell_L, rel) = #(sub-cell centers at level S inside rel)
                        / 4^(S-L)

— the standard rasterization-based areal weighting, with the sub-cell
CENTER as the inclusion test (the same point-in-polygon semantics the
PIP join is already pinned to). All counts are exact integers, so the
output is bit-identical at any parallelism and a SQL oracle can
re-enumerate the centers independently (q128).

Scale plan — the work is proportional to covering size, never to 4^S
per polygon:

    interior covering cells at level ≤ L  → fan to their 4^(L-lv)
        descendant L-cells (explode(sequence)), each contributing the
        FULL 4^(S-L) centers — no center is ever enumerated;
    interior cells at level in (L, S]     → one row to the L-ancestor
        (prefix shift), contributing 4^(S-lv) centers;
    boundary cells (at S by construction) → their CENTER goes through
        the broadcast PIP index (the X3 zero-shuffle path), inside →
        1 center to the L-ancestor.

    Σ per (L-cell, rel) → one map-side-combinable groupBy; value join
    is broadcast (the rel-value table is metadata-scale); final per-
    cell aggregate is a second map-side-combinable groupBy.

Assumes a valid multipolygon set (per-rel polygon interiors disjoint
— the dissolve/overlap operators exist to verify that); inside-ness is
per (cell, rel) distinct, so shared boundary cells of adjacent parts
of the SAME rel count each center once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.raster import cell_xy_cols


def areal_interpolate(
    polygon_cells: DataFrame,
    values: DataFrame,
    index_bc,
    out_level: int,
    sub_level: int,
    value_col: str = "value",
) -> DataFrame:
    """(gx, gy, n_rels, num, areal_value) at ``out_level`` from a
    polygon covering, a broadcast PipIndex, and a per-rel value table
    (rel_id, value — cast to long; rels without a value row drop).

    ``num`` = Σ_rel value·centers_inside (exact int64);
    ``areal_value`` = num / 4^(sub_level-out_level) — one IEEE
    division of exact integers. Overflow contract: max|value| ·
    4^(S-L) · rels_per_cell < 2^63.
    """
    L, S = out_level, sub_level
    if not 0 <= L < S:
        raise ValueError("need 0 <= out_level < sub_level")
    lv = F.col("cell").bitwiseAND(F.lit(0x3F))
    m = F.shiftright(F.col("cell"), 6)

    cells = polygon_cells.select("rel_id", "cell", "interior").distinct()
    interior = cells.where("interior")
    # coarse interior (lv <= L): every descendant L-cell is fully in.
    db = (F.lit(2) * (F.lit(L) - lv)).cast("int")
    coarse = interior.where(lv <= L).select(
        "rel_id",
        F.call_function("shiftleft", m, db).alias("mb"),
        db.alias("db"),
    )
    coarse = coarse.select(
        "rel_id",
        "mb",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.col("db")
                )
                - F.lit(1),
            )
        ).alias("j"),
    ).select(
        "rel_id",
        F.col("mb").bitwiseOR(F.col("j")).alias("mL"),
        F.lit(4 ** (S - L)).cast("long").alias("w"),
    )
    # fine interior (L < lv <= S): one row to the L-ancestor.
    fine = interior.where(lv > L).select(
        "rel_id",
        F.call_function(
            "shiftright", m, ((lv - F.lit(L)) * 2).cast("int")
        ).alias("mL"),
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            ((F.lit(S) - lv) * 2).cast("int"),
        ).alias("w"),
    )
    # boundary (lv == S): PIP-test the sub-cell center.
    from osm_spark.spatial.pip_index import pip_join_index

    # In-plan contract check (no eager job — the builder stays lazy
    # like every other spatial operator): a boundary cell at any level
    # other than sub_level means the covering was built with a
    # different max_level, which would silently mis-weight — fail the
    # job with a clear message instead.
    bnd = cells.where(~F.col("interior")).select(
        "rel_id",
        F.when(lv == F.lit(S), F.col("cell"))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"areal_interpolate: boundary covering cell not at "
                    f"sub_level={S} — rebuild with max_level=sub_level"
                )
            )
        )
        .alias("cell"),
    )
    n = 1 << S
    gx, gy = cell_xy_cols(F.col("cell"), S)
    centers = (
        bnd.select("cell").distinct().select(
            F.col("cell").alias("point_id"),
            (F.lit(-180.0) + (gx.cast("double") + F.lit(0.5)) * F.lit(360.0 / n)).alias("lon"),
            (F.lit(-90.0) + (gy.cast("double") + F.lit(0.5)) * F.lit(180.0 / n)).alias("lat"),
        )
    )
    inside = (
        pip_join_index(centers, index_bc)
        .select(F.col("point_id").alias("cell"), "rel_id")
        .distinct()
        .join(bnd, ["cell", "rel_id"], "left_semi")
    )
    brows = inside.select(
        "rel_id",
        F.shiftright(F.shiftright(F.col("cell"), 6), 2 * (S - L)).alias("mL"),
        F.lit(1).cast("long").alias("w"),
    )

    per_rel = (
        coarse.unionByName(fine).unionByName(brows)
        .groupBy("mL", "rel_id")
        .agg(F.sum("w").alias("n_in"))
    )
    vals = values.select(
        "rel_id", F.col(value_col).cast("long").alias("_v")
    )
    cell_l = F.shiftleft(F.col("mL"), 6).bitwiseOR(F.lit(L))
    out = (
        per_rel.join(F.broadcast(vals), "rel_id")
        .groupBy("mL")
        .agg(
            F.count("*").cast("long").alias("n_rels"),
            F.sum(F.col("_v") * F.col("n_in")).alias("num"),
        )
    )
    ogx, ogy = cell_xy_cols(cell_l, L)
    return out.select(
        ogx.alias("gx"),
        ogy.alias("gy"),
        "n_rels",
        "num",
        (F.col("num") / F.lit(4 ** (S - L))).alias("areal_value"),
    )
