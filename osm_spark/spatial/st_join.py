"""Spatio-temporal co-occurrence join: event pairs close in space AND
time.

The event-correlation primitive (same place, same hour: crawl bursts,
duplicate coverage of a breaking story, co-located traffic): all pairs
of events within ``max_d`` degrees AND within ``max_dt_s`` seconds.

A time-windowed radius self-join composes the existing distance_join
grid machinery with a timestamp predicate. The timestamp rides the
QUERY side packed into the join id (the hausdorff.py trick) and the
DATA side via ``data_cols`` — so the spatial join's output carries
everything the temporal filter needs and NO second join against the
event table is ever made (at 10^12 events a join-back would be a
full-table shuffle; here the only shuffle beyond the grid join is
nothing at all).

Time is exact integer epoch seconds; distance is the exact int64
micro-degree metric (d2_u ≤ d_u²) — the distance_join contract — so
the pair set is engine/parallelism-exact.

A tighter co-binning would partition on (cell, time-bucket) to prune
temporally-distant pairs before the filter; that matters when the
same location stays hot across long spans. The composition keeps the
grid join's candidate volume purely spatial — documented trade-off,
``max_dt_s`` pruning happens in the filter.

No reference counterpart; training-data extension surface
(SURVEY §2.9 X96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.knn_points import distance_join


def st_cooccur_join(
    events: DataFrame,
    max_d: float,
    max_dt_s: int,
    id_col: str = "event_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_data: bool = True,
    level: int | None = None,
) -> DataFrame:
    """(id_a, id_b, d2_u, dt_s) for unordered event pairs with
    distance ≤ max_d and |Δt| ≤ max_dt_s (id_a < id_b; dt_s =
    ts_b − ts_a signed). Ids may be any orderable type (the identity
    rides the join as a struct)."""
    ts_s = F.col(ts_col).cast("timestamp").cast("long")
    src = events.select(
        F.col(id_col).alias("eid"),
        ts_s.alias("ts_s"),
        F.col(lon_col).alias("lon"),
        F.col(lat_col).alias("lat"),
        F.struct(F.col(id_col).alias("eid"), ts_s.alias("ts_s")).alias("pid"),
    )
    pairs = distance_join(
        src,
        src,
        max_d,
        level=level,
        broadcast_data=broadcast_data,
        query_id="pid",
        data_id="eid",
        data_cols=("ts_s",),
    ).select(
        F.col("query_id").getField("eid").alias("id_a"),
        F.col("query_id").getField("ts_s").alias("ts_a"),
        F.col("data_id").alias("id_b"),
        F.col("ts_s").alias("ts_b"),
        "d2_u",
    )
    return (
        pairs.where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "d2_u",
            (F.col("ts_b") - F.col("ts_a")).alias("dt_s"),
        )
        .where(F.abs(F.col("dt_s")) <= F.lit(int(max_dt_s)))
    )
