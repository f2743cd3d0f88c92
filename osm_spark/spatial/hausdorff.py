"""Trajectory / footprint similarity join — symmetric discrete
Hausdorff distance under a radius, from ONE spatial radius join.

The mirror-detection / route-matching primitive: which pairs of point
sets (travelers' trajectories, hosts' page footprints, per-language
corpora) cover the same ground? Pairs (A, B) with symmetric discrete
Hausdorff distance H = max(max_a min_b d(a,b), max_b min_a d(b,a))
at most ``max_d`` degrees, with the exact integer H² returned.

The naive evaluation is |A|·|B| per pair over all pairs. The key
identity this operator exploits: for the THRESHOLDED join, the full
cross product is never needed —

    H(A, B) ≤ d  ⟺  every point of A has a B-point within d
                     AND every point of B has an A-point within d,

and when that holds, each point's true nearest neighbor is among its
within-d partners, so per-point mins over the RADIUS-JOIN output are
exact. The whole operator is therefore:

1. ``distance_join`` of the deduplicated points against themselves at
   radius ``max_d`` (the knn_points grid machinery: bounded Chebyshev
   disk fan-out + one cell equi-join + exact int64 filter — shuffle
   bounded by the close-pair volume, never the pair-of-trajectory
   cross product).
2. ONE map-side-combinable groupBy (pair, a-point) → min d2, then
   (pair) → max + covered-point count.
3. A broadcast join against per-trajectory point counts: a pair
   qualifies iff its covered-point count equals |A| (any uncovered
   point already implies H > d); same test in the mirrored direction;
   H² = greatest of the two directed maxima.

Exactness contract: points are deduplicated on their int64
micro-degree coordinates; d2 is exact int64; the threshold is
d_u² with d_u = round(max_d·1e6) — the distance_join metric contract,
so the output pair set and H² values are engine/parallelism-exact.

No reference counterpart (pmezard/osm has no similarity join);
training-data extension surface (SURVEY §2.9 X92).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.knn_points import distance_join


def hausdorff_join(
    points: DataFrame,
    max_d: float,
    traj_col: str = "traj_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_data: bool = True,
    level: int | None = None,
    metric: str = "planar",
) -> DataFrame:
    """(traj_a, traj_b, hausdorff_d2) for every unordered pair with
    symmetric discrete Hausdorff ≤ max_d degrees (traj_a < traj_b).
    See the module docstring for the plan shape and exactness rules.

    ``metric="equirectangular"`` ranks with the distance_join
    cos(source lat)-scaled int64 metric — correct across latitudes,
    where planar degrees overweight longitude. The metric is
    per-SOURCE-point (the standard local approximation), so each
    directed max-min uses its own side's scaling and H² is the max of
    the two quasi-metric directed values — deterministic, and the
    q141 oracle replays exactly that.
    ``metric="haversine"`` ranks with the true great-circle chord²
    metric (knn_points.SPHERE_SCALE quantization) — a REAL symmetric
    metric (no per-side scaling asymmetry), so H² is an honest
    Hausdorff in quantized chord units; the threshold is the chord² of
    a ``max_d``-degree arc (the distance_join haversine contract,
    q166's oracle replays it).
    """
    import math as _math

    from osm_spark.spatial.knn_points import SPHERE_SCALE

    d_u = int(round(max_d * 1e6))
    if metric == "haversine":
        d_rad = _math.radians(max_d)
        t = 2.0 * SPHERE_SCALE * _math.sin(min(d_rad, _math.pi) / 2.0) + 4.0
        thr = int(_math.floor(t * t))
    else:
        thr = d_u * d_u
    # Canonical per-µdeg-point representative: reconstructing degrees
    # from the int grid keeps distance_join's own rounding exact.
    pts_u = points.select(
        F.col(traj_col).alias("tid"),
        F.round(F.col(lon_col) * 1e6).cast("long").alias("x_u"),
        F.round(F.col(lat_col) * 1e6).cast("long").alias("y_u"),
    ).distinct()
    # The query-side identity rides the radius join as a STRUCT (the
    # per-point aggregation over the close-pair volume then groups on
    # numeric fields — a concat-string key measured ~2× slower
    # end-to-end on a 75M-close-pair leg).
    pts_deg = pts_u.select(
        "tid",
        (F.col("x_u") / 1e6).alias("lon"),
        (F.col("y_u") / 1e6).alias("lat"),
        F.struct("tid", "x_u", "y_u").alias("pid"),
    )
    sizes = pts_u.groupBy(F.col("tid").alias("ta")).agg(
        F.count("*").alias("n_a")
    )

    close = distance_join(
        pts_deg,
        pts_deg,
        max_d,
        level=level,
        broadcast_data=broadcast_data,
        query_id="pid",
        data_id="tid",
        metric=metric,
    ).select(
        F.col("query_id").getField("tid").alias("ta"),
        F.col("query_id").getField("x_u").alias("ax"),
        F.col("query_id").getField("y_u").alias("ay"),
        F.col("data_id").alias("tb"),
        "d2_u",
    ).where(F.col("ta") != F.col("tb"))

    per_point = close.groupBy("ta", "tb", "ax", "ay").agg(
        F.min("d2_u").alias("m")
    )
    directed = per_point.groupBy("ta", "tb").agg(
        F.max("m").alias("dir_d2"), F.count("*").alias("n_covered")
    )
    # A pair's directed distance is valid iff EVERY a-point found a
    # within-d partner; otherwise H > d and the pair drops here.
    full = directed.join(F.broadcast(sizes), "ta").where(
        F.col("n_covered") == F.col("n_a")
    )
    # Symmetrize WITHOUT a self-join (a fwd⋈rev join would recompute
    # the whole radius-join pipeline once per branch): each surviving
    # direction is one row under the canonical (lo, hi) key, so
    # H² = max over the two rows, and the pair qualifies iff BOTH
    # directions survived the covered-count test (n_dir = 2). One
    # combinable groupBy, the upstream evaluated exactly once.
    canon = full.select(
        F.least("ta", "tb").alias("traj_a"),
        F.greatest("ta", "tb").alias("traj_b"),
        "dir_d2",
    )
    return (
        canon.groupBy("traj_a", "traj_b")
        .agg(
            F.max("dir_d2").alias("hausdorff_d2"),
            F.count("*").alias("_n_dir"),
        )
        .where(F.col("_n_dir") == 2)
        .where(F.col("hausdorff_d2") <= F.lit(thr))
        .drop("_n_dir")
    )
