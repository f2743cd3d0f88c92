"""Spatio-temporal sessionization: per-key trajectories → sessions
with movement statistics.

The web×geo crossover query: a crawl (or a geotagged event stream)
carries (key, timestamp, position) rows — key being a host, a feed, a
device — and the analyst wants SESSIONS (maximal runs with inter-point
gaps ≤ a threshold) annotated with movement: how far did the key
travel inside the session, what was the largest single hop, what
bounding box did it cover. Classic telemetry/anti-abuse shape
("impossible travel": a max_step_u far above city scale inside one
session flags a proxy or a geocoding bug).

Scale shape (the 100-TB contract):
- ONE shuffle: the window partitionBy(key) sort. Every signal
  (session break, step distance) is a lag() in that same window, and
  the session aggregate groups by (key, session_no) — a refinement of
  the window partitioning, so the groupBy's exchange is map-side
  combinable partials over already-clustered data.
- No Python anywhere; the step metric is the shared int64 squared
  micro-degree contract, reported as path_len_u = Σ round(√d2) — an
  INTEGER per step, so the session sum is order-free exact (a double
  sum would be partial-order-dependent and not engine-reproducible).
- Skew: a hot key (one host = 10^7 rows) is one window partition —
  the standard mitigation is pre-splitting the key by a coarse time
  bucket (day) and stitching sessions across bucket edges; at the
  bench's key cardinalities the plain window is the right plan.

Session rule: a row starts a new session when it is the key's first
row in (ts, tiebreak) order or when ts - prev_ts > gap_s (gaps of
EXACTLY gap_s stay in the session). session_no is 1-based per key.

No reference analog (pmezard/osm has no temporal data); SURVEY §2-ext.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def geo_sessions(
    points: DataFrame,
    key: str,
    ts: str,
    gap_s: int,
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
    metric: str = "planar",
) -> DataFrame:
    """points(key, ts, lon, lat) → one row per (key, session):
    (key, session_no, n_points, t_start, t_end, path_len_u,
    max_step_u, min_lon_u, max_lon_u, min_lat_u, max_lat_u).

    ``ts`` must be a timestamp column; ordering inside a key is
    (ts, tiebreak) — pass ``tiebreak`` whenever ts can repeat, or the
    lag() order (hence steps and session ids) is not deterministic.

    ``metric="equirectangular"`` scales each step's lon delta by
    round(cos(lat)·1024) >> 10 — the segment START point's latitude
    (deterministic; the shared knn_points/distance_join contract) —
    so path lengths are geodesically meaningful across latitudes
    while staying int64-exact.
    ``metric="haversine"`` measures each step as the exact int64 CHORD
    length over SPHERE_SCALE-quantized unit-sphere coordinates (the
    knn_points haversine contract): true great-circle step ranking at
    any latitude — including trans-polar and antimeridian steps, where
    the equirectangular µdeg delta wildly overestimates. path_len_u /
    max_step_u are then in 1e-7-sphere-radius units (≈ 0.64 m each),
    not µdeg; per-step round(√chord²) keeps session sums order-free
    integer-exact, the same argument as the µdeg metrics.
    """
    if metric not in ("planar", "equirectangular", "haversine"):
        raise ValueError(f"unknown metric {metric!r}")
    from osm_spark.spatial.knn_points import _sphere_cols

    epoch = F.unix_timestamp(F.col(ts))
    lon_u = F.round(F.col(lon) * 1e6).cast("long")
    lat_u = F.round(F.col(lat) * 1e6).cast("long")

    base = points.select(
        F.col(key).alias("key"),
        F.col(ts).alias("ts"),
        epoch.alias("ts_s"),
        lon_u.alias("lon_u"),
        lat_u.alias("lat_u"),
        F.round(F.cos(F.radians(F.col(lat))) * 1024)
        .cast("long")
        .alias("cq"),
        *(
            _sphere_cols(F.col(lon), F.col(lat), "s")
            if metric == "haversine"
            else ()
        ),
        *([F.col(tiebreak).alias("tb")] if tiebreak else []),
    )
    worder = [F.col("ts")] + ([F.col("tb")] if tiebreak else [])
    w = Window.partitionBy("key").orderBy(*worder)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev_ts = F.lag("ts_s").over(w)
    prev_lon = F.lag("lon_u").over(w)
    prev_lat = F.lag("lat_u").over(w)
    new_session = (
        prev_ts.isNull() | (F.col("ts_s") - prev_ts > F.lit(gap_s))
    ).cast("int")
    if metric == "haversine":
        dsx = F.col("sx") - F.lag("sx").over(w)
        dsy = F.col("sy") - F.lag("sy").over(w)
        dsz = F.col("sz") - F.lag("sz").over(w)
        d2 = dsx * dsx + dsy * dsy + dsz * dsz
    else:
        if metric == "equirectangular":
            dlon = F.shiftright(
                F.abs(F.col("lon_u") - prev_lon) * F.lag("cq").over(w), 10
            )
        else:
            dlon = F.col("lon_u") - prev_lon
        d2 = dlon * dlon + (F.col("lat_u") - prev_lat) * (
            F.col("lat_u") - prev_lat
        )
    step_u: Column = F.when(
        new_session == 1, F.lit(0)
    ).otherwise(F.round(F.sqrt(d2.cast("double"))).cast("long"))

    marked = base.select(
        "key",
        "ts",
        "lon_u",
        "lat_u",
        new_session.alias("new_session"),
        step_u.alias("step_u"),
    ).withColumn(
        "session_no", F.sum("new_session").over(wrun).cast("long")
    )

    return marked.groupBy("key", "session_no").agg(
        F.count("*").cast("long").alias("n_points"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.sum("step_u").cast("long").alias("path_len_u"),
        F.max("step_u").cast("long").alias("max_step_u"),
        F.min("lon_u").alias("min_lon_u"),
        F.max("lon_u").alias("max_lon_u"),
        F.min("lat_u").alias("min_lat_u"),
        F.max("lat_u").alias("max_lat_u"),
    )


def movement_stats(
    points: DataFrame,
    traj_col: str = "traj_id",
    order_cols: tuple = ("ts",),
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-trajectory movement statistics with CIRCULAR heading math:
    (traj, n_steps, mean_step_d2, mean_heading_rad, resultant_len).

    Headings are directions, not numbers — averaging 359° and 1°
    arithmetically gives 180° (backwards); the circular mean is the
    atan2 of the summed unit step vectors. Exactness follows the
    house split: everything AGGREGATED is exact int64 (summed
    micro-degree step deltas Σdx, Σdy and squared lengths — order-free
    under any partitioning), and the only trig runs ONCE per output
    row on those exact sums. Degenerate all-zero steps (Σ = 0) yield
    NULL heading.

    resultant_len = |(Σdx, Σdy)| — the net-displacement magnitude in
    micro-degrees, the circular-statistics resultant of the
    displacement-WEIGHTED heading distribution (a straight tour's
    resultant equals its path length; a closed loop's is 0). Steps
    are weighted by their length — the vector-sum form; the
    unit-weighted variant would need a per-step sqrt inside the
    aggregate, kept out of the exact int64 fold by design.

    Scale: ONE window pass (the segments shape) + ONE map-side-
    combinable groupBy; no Python."""
    from osm_spark.spatial.crossings import segments_from_points

    segs = segments_from_points(
        points, traj_col=traj_col, order_cols=order_cols,
        lon_col=lon_col, lat_col=lat_col,
    )
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    agg = (
        segs.select(
            "traj",
            dx.alias("dx"),
            dy.alias("dy"),
            (dx * dx + dy * dy).alias("d2"),
        )
        .groupBy("traj")
        .agg(
            F.count("*").alias("n_steps"),
            F.sum("dx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum("d2").alias("sd2"),
        )
    )
    res2 = F.col("sx") * F.col("sx") + F.col("sy") * F.col("sy")
    return agg.select(
        "traj",
        F.col("n_steps").cast("long").alias("n_steps"),
        (F.col("sd2").cast("double") / F.col("n_steps")).alias(
            "mean_step_d2"
        ),
        F.when(
            (F.col("sx") == 0) & (F.col("sy") == 0), F.lit(None)
        ).otherwise(
            F.atan2(F.col("sy").cast("double"), F.col("sx").cast("double"))
        ).alias("mean_heading_rad"),
        F.sqrt(res2.cast("double")).alias("resultant_len"),
    )
