"""Multi-zoom tile-pyramid rollup (heatmap pyramid).

No reference analog (the reference emits one GeoJSON per relation,
geojson.go:169-257); this is the planet-heatmap shape: per-tile
aggregates at EVERY zoom level ``min_level..max_level`` in one pass.

Scale plan (the 10^12-point budget):

    points --cell at max_level (ONE Catalyst Morton build)-->
    groupBy(cell)              # the only point-scale shuffle; count and
                               # sums are all map-side combinable
    leaf rows x (L+1) levels   # explode over sequence — cells-scale,
                               # parent ids are PREFIX SHIFTS of the
                               # leaf morton (no re-floor, no re-morton)
    groupBy(level, cell)       # second shuffle: <= leaves x (L+1) rows,
                               # independent of the point count

The ancestor fan-out happens AFTER the leaf aggregation, so the big
side is touched exactly once. Binary grids make per-level recomputation
and prefix-shift derivation provably identical —
``floor(v * 2^a) >> (a-b) == floor(v * 2^b)`` for v >= 0, and the edge
clamp maps to the clamped parent — which is why the DuckDB oracle can
independently re-floor at every level and still hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.cells_sql import cell_expr


def tile_pyramid(
    points: DataFrame,
    max_level: int,
    min_level: int = 0,
    lon: str = "lon",
    lat: str = "lat",
    sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(level, cell, n_points[, sum_<c>...]) for every level in
    [min_level, max_level]: the count (and optional column sums) of
    points whose coordinate falls in each tile, at each zoom.

    ``sum_cols``: numeric point columns to roll up alongside the count
    (each emitted as ``sum_<name>``)."""
    if not 0 <= min_level <= max_level:
        raise ValueError(f"bad level range [{min_level}, {max_level}]")
    aggs = [F.count("*").alias("n_points")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    leaf = points.groupBy(
        cell_expr(F.col(lon), F.col(lat), max_level).alias("cell")
    ).agg(*aggs)

    measure_cols = ["n_points"] + [f"sum_{c}" for c in sum_cols]
    fan = leaf.select(
        F.explode(
            F.sequence(F.lit(min_level), F.lit(max_level))
        ).alias("level"),
        "cell",
        *measure_cols,
    )
    # Ancestor id at `level`: drop 2 morton bits per level step, re-tag.
    parent = (
        F.shiftleft(
            F.call_function(
                "shiftright",
                F.shiftright(F.col("cell"), 6),
                ((F.lit(max_level) - F.col("level")) * 2).cast("int"),
            ),
            6,
        )
        .bitwiseOR(F.col("level"))
        .cast("long")
    )
    return (
        fan.groupBy(
            F.col("level").cast("int").alias("level"), parent.alias("cell")
        )
        .agg(*[F.sum(c).alias(c) for c in measure_cols])
    )


def space_time_cube(
    points: DataFrame,
    ts_col: str,
    max_level: int,
    min_level: int = 0,
    lon: str = "lon",
    lat: str = "lat",
    bucket: str = "hour",
) -> DataFrame:
    """(level, cell, t_bucket, n_points): the multi-zoom ×
    multi-time-grain OLAP cube — every tile at every level in
    [min_level, max_level], per ``bucket``-truncated timestamp AND
    all-time (t_bucket NULL), in one pass.

    Scale shape (the X73 pyramid argument extended with time): the
    point corpus is touched by exactly ONE map-side-combinable
    groupBy at (leaf cell, bucket); the level fan-out (prefix shifts)
    and the all-time rollup both run on the CELLS×buckets aggregate —
    cube size ≤ leaves × levels × (buckets + 1) rows, independent of
    the point count. A dashboard zoom/scrub never rescans points.
    """
    if not 0 <= min_level <= max_level:
        raise ValueError(f"bad level range [{min_level}, {max_level}]")
    leaf = points.groupBy(
        cell_expr(F.col(lon), F.col(lat), max_level).alias("cell"),
        F.date_trunc(bucket, F.col(ts_col)).alias("t_bucket"),
    ).agg(F.count("*").alias("n_points"))
    fan = leaf.select(
        F.explode(
            F.sequence(F.lit(min_level), F.lit(max_level))
        ).alias("level"),
        "cell",
        "t_bucket",
        "n_points",
    )
    parent = (
        F.shiftleft(
            F.call_function(
                "shiftright",
                F.shiftright(F.col("cell"), 6),
                ((F.lit(max_level) - F.col("level")) * 2).cast("int"),
            ),
            6,
        )
        .bitwiseOR(F.col("level"))
        .cast("long")
    )
    per_bucket = fan.groupBy(
        F.col("level").cast("int").alias("level"),
        parent.alias("cell"),
        "t_bucket",
    ).agg(F.sum("n_points").alias("n_points"))
    all_time = per_bucket.groupBy("level", "cell").agg(
        F.sum("n_points").alias("n_points")
    ).select(
        "level",
        "cell",
        F.lit(None).cast("timestamp").alias("t_bucket"),
        "n_points",
    )
    return per_bucket.unionByName(all_time)
