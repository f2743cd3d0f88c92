"""J8 — skew-aware distributed point-in-polygon join.

Shape (the heart of the extension, SURVEY.md §2.3 J8):

    points  --cells at the covering's levels (Catalyst bit ops)-->
            --explode--> (point, cell)
        ⋈ polygon_cells on cell            (equi-join; AQE skew split
                                            + optional explicit salting)
    interior-cell matches  -> accepted directly (no geometry touched)
    boundary-cell matches  -> cogrouped exact PIP refinement
                              (points per (rel, poly) × one geometry row)

Scale properties:
- the point side (10^12 rows) is touched exactly once per covering
  level (quadtree cells are disjoint across levels, so a point matches
  at most one covering cell per polygon — no dedup shuffle needed);
- the polygon-cell side is small (10^6-10^7 rows) — broadcastable;
- exact geometry is shipped once per (rel, poly) group via cogroup, not
  per candidate row;
- hot cells (city-dense pages) are handled in layers: with the default
  broadcast cell join there is NO reduce partitioning to skew — hot-cell
  points stay spread across input partitions; when the polygon-cell side
  is too large to broadcast (``broadcast_cells=False`` → shuffle join),
  AQE skew-join splitting applies, plus optional deterministic salting:
  polygon-cell rows are replicated ``salt`` times and points pick a
  replica by hash — bounding any single reduce task at
  points_in_hot_cell / salt.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.cells_sql import point_cells_expr


def _point_in_float_polygon_np(poly, lons: np.ndarray, lats: np.ndarray) -> np.ndarray:
    """Vectorized-over-points exact PIP (crossing number; boundary
    excluded, GEOS-Contains semantics — centroid.go:147-160 analog)."""
    inside = np.zeros(len(lons), dtype=bool)
    on_edge = np.zeros(len(lons), dtype=bool)
    for ring_idx, ring in enumerate(poly):
        xs = np.asarray([p[0] for p in ring], dtype=np.float64)
        ys = np.asarray([p[1] for p in ring], dtype=np.float64)
        x1, y1 = xs[:-1], ys[:-1]
        x2, y2 = xs[1:], ys[1:]
        dx = x2 - x1
        dy = y2 - y1
        px = lons[:, None]
        py = lats[:, None]
        cross = dx[None, :] * (py - y1[None, :]) - dy[None, :] * (px - x1[None, :])
        on = (
            (cross == 0.0)
            & (np.minimum(x1, x2)[None, :] <= px)
            & (px <= np.maximum(x1, x2)[None, :])
            & (np.minimum(y1, y2)[None, :] <= py)
            & (py <= np.maximum(y1, y2)[None, :])
        )
        on_edge |= on.any(axis=1)
        straddle = (y1[None, :] > py) != (y2[None, :] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (py - y1[None, :]) * dx[None, :] / dy[None, :]
        crossings = (straddle & (px < xint)).sum(axis=1)
        ring_inside = (crossings & 1).astype(bool)
        if ring_idx == 0:
            inside = ring_inside
        else:  # holes subtract
            inside &= ~ring_inside
    return inside & ~on_edge


REFINE_SCHEMA = "point_id long, rel_id long, poly_idx int"


def _refine_cogroup(key, pts: pd.DataFrame, poly: pd.DataFrame) -> pd.DataFrame:
    if len(pts) == 0 or len(poly) == 0:
        return pd.DataFrame({"point_id": [], "rel_id": [], "poly_idx": []}).astype(
            {"point_id": "int64", "rel_id": "int64", "poly_idx": "int32"}
        )
    shape = poly["poly"].iloc[0]
    lons = pts["lon"].to_numpy(dtype=np.float64)
    lats = pts["lat"].to_numpy(dtype=np.float64)
    ok = _point_in_float_polygon_np(shape, lons, lats)
    sel = pts.loc[ok, ["point_id"]].copy()
    sel["rel_id"] = key[0]
    sel["poly_idx"] = key[1]
    return sel[["point_id", "rel_id", "poly_idx"]]


def _refine_broadcast(boundary: DataFrame, polygons: DataFrame) -> DataFrame:
    """Exact refinement with broadcast geometry — ZERO shuffle.

    Replaces the (rel_id, poly_idx)-keyed cogroup (VERDICT r1 #1 scale
    flaw: parallelism capped at polygon count, coastline candidates
    concentrated in one task). Boundary candidates stay in their
    existing partitioning; each Arrow batch groups its rows by polygon
    and runs the vectorized crossing-number test against the broadcast
    geometry. Parallelism = input partitions; skew = input skew.
    """
    from osm_spark.spatial.pip_index import PipIndex, build_pip_index

    sc = boundary.sparkSession.sparkContext
    bc = sc.broadcast(build_pip_index(None, polygons))

    def run(it):
        idx: PipIndex = bc.value
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"point_id": [], "rel_id": [], "poly_idx": []}
                ).astype({"point_id": "int64", "rel_id": "int64", "poly_idx": "int32"})
                continue
            lons = pdf["lon"].to_numpy(np.float64)
            lats = pdf["lat"].to_numpy(np.float64)
            pids = pdf["point_id"].to_numpy(np.int64)
            rel = pdf["rel_id"].to_numpy(np.int64)
            poly = pdf["poly_idx"].to_numpy(np.int64)
            keep = np.zeros(len(pdf), dtype=bool)
            key = rel * np.int64(1 << 20) + poly
            order = np.argsort(key, kind="stable")
            key_s = key[order]
            bounds = np.flatnonzero(np.diff(key_s)) + 1
            for seg in np.split(order, bounds):
                r, p = int(rel[seg[0]]), int(poly[seg[0]])
                keep[seg] = idx.contains(r, p, lons[seg], lats[seg])
            yield pd.DataFrame(
                {
                    "point_id": pids[keep],
                    "rel_id": rel[keep],
                    "poly_idx": poly[keep].astype(np.int32),
                }
            )

    return boundary.select(
        "point_id", "rel_id", "poly_idx", "lon", "lat"
    ).mapInPandas(run, REFINE_SCHEMA)


def pip_join(
    points: DataFrame,
    polygon_cells: DataFrame,
    polygons: DataFrame,
    levels: list[int] | None = None,
    salt: int = 1,
    broadcast_cells: bool = True,
    refine: str = "broadcast",
    refine_salt: int = 1,
) -> DataFrame:
    """points(point_id, lon, lat) × polygons → (point_id, rel_id, poly_idx).

    Output rows are unique per (point_id, rel_id) by construction when
    the multipolygon parts of each relation are disjoint (always true
    for valid assembled admin boundaries): covering cells are disjoint
    across levels of one polygon, and a point lies in at most one
    polygon of a relation — so no dedup shuffle is needed downstream.

    ``levels``: covering levels to probe; default = distinct levels in
    polygon_cells (collected — small dimension).
    """
    if levels is None:
        levels = [
            int(r["lvl"])
            for r in polygon_cells.select(
                polygon_cells.cell.bitwiseAND(F.lit(0x3F)).alias("lvl")
            )
            .distinct()
            .collect()
        ]
        levels = sorted(levels)

    pc = polygon_cells
    p = points.select(
        "point_id",
        "lon",
        "lat",
        F.explode(point_cells_expr(F.col("lon"), F.col("lat"), levels)).alias("cell"),
    )
    if salt > 1:
        pc = pc.withColumn(
            "salt_id", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        p = p.withColumn("salt_id", F.pmod(F.xxhash64("point_id"), F.lit(salt)))
        join_keys = ["cell", "salt_id"]
    else:
        join_keys = ["cell"]

    pc_side = F.broadcast(pc) if broadcast_cells else pc
    cand = p.join(pc_side, join_keys)

    accepted = cand.where("interior").select("point_id", "rel_id", "poly_idx")
    boundary = cand.where(~F.col("interior")).select(
        "point_id", "lon", "lat", "rel_id", "poly_idx"
    )
    if refine == "broadcast":
        refined = _refine_broadcast(boundary, polygons)
    elif refine_salt > 1:
        # Sharded cogroup: candidates pick a deterministic shard, the
        # single geometry row is replicated per shard — refinement
        # parallelism becomes polygons × refine_salt and a coastline-
        # heavy polygon's candidates split across refine_salt tasks.
        b = boundary.withColumn(
            "shard", F.pmod(F.xxhash64("point_id"), F.lit(refine_salt)).cast("int")
        )
        pg = polygons.withColumn(
            "shard", F.explode(F.sequence(F.lit(0), F.lit(refine_salt - 1)))
        ).withColumn("shard", F.col("shard").cast("int"))
        refined = (
            b.groupBy("rel_id", "poly_idx", "shard")
            .cogroup(pg.groupBy("rel_id", "poly_idx", "shard"))
            .applyInPandas(
                lambda key, pts, poly: _refine_cogroup(key[:2], pts, poly),
                REFINE_SCHEMA,
            )
        )
    else:
        refined = (
            boundary.groupBy("rel_id", "poly_idx")
            .cogroup(polygons.groupBy("rel_id", "poly_idx"))
            .applyInPandas(_refine_cogroup, REFINE_SCHEMA)
        )
    return accepted.unionByName(refined)
