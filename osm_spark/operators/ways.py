"""J1 — way→node resolution as a distributed join.

The reference resolves each way's ordered node ids against an in-RAM
sorted node array via binary search (geojson.go:24-32, ring.go:42-55).
Here it is the idiomatic Spark shape:

    ways --posexplode(nodes)--> (way_id, pos, node_id)
         ⋈ nodes on node_id                      (shuffle hash/SMJ; AQE
                                                  broadcasts at small SF)
         groupBy(way_id) + sort_array(collect_list(struct(pos, lon, lat)))

Scale notes (100 TB design):
- the join shuffles on node_id — both sides well-distributed (node ids
  are dense); no skew: each node joins to a handful of way positions.
- the aggregation shuffles on way_id; per-way point counts are bounded
  (~2k nodes/way in OSM), so groups always fit in memory.
- ordered collect uses ``sort_array`` over (pos, ...) structs — a
  deterministic map-side-combinable aggregate, NOT a window sort.
- geometry is carried as two primitive arrays (lons, lats) instead of
  array<struct>: Arrow transfers primitive lists an order of magnitude
  faster into the pandas-UDF assembly stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_ways_geom(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """(way_id, lons, lats, n_missing) — n_missing counts unresolvable
    node refs ("cannot resolve node", geojson.go:28-30); rows with
    n_missing > 0 become per-relation errors downstream."""
    exploded = ways.select(
        F.col("id").alias("way_id"), F.posexplode("nodes").alias("pos", "node_id")
    )
    pts = nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    joined = exploded.join(pts, "node_id", "left")
    return (
        joined.groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "lon", "lat"))
            ).alias("sp"),
            F.sum(F.when(F.col("lon").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
        .select(
            "way_id",
            F.expr("transform(sp, x -> x.lon)").alias("lons"),
            F.expr("transform(sp, x -> x.lat)").alias("lats"),
            F.col("n_missing").cast("int").alias("n_missing"),
        )
    )
