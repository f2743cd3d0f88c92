"""Inverse-distance-weighted (IDW) spatial interpolation.

Estimates a numeric field at arbitrary probe points from irregular
samples — the classic Shepard (1968) smoothed-IDW surface, the
standard raster-interpolation step a geo pipeline runs after PIP /
raster binning (no reference analog; the reference's geometry ops stop
at centroids, centroid.go).

Scale plan — a thin composition, pure Catalyst end to end:

    pairs = distance_join(queries, samples, max_d, data_cols=(value,))
        ONE grid equi-join (the X76 radius-join plan: per-side Morton
        build, bounded Chebyshev disk fan-out of the query side only,
        broadcast or shuffled data side) with the sample VALUE threaded
        through the join — no second join back to the samples table.
    groupBy(query_id): Σw, Σw·v, count — map-side combinable, so the
        shuffle carries ≤ one row per (task, query).

Exactness: floating-point IDW is sum-order sensitive, so a naive
Σ v/d² is NOT reproducible across engines/parallelism. Here the
weight is an exact INT64:

    w = scale DIV (1 + (d2_u >> shift))

(integer division, never float), so Σw and Σw·v are integer sums —
order-free, engine- and parallelism-bit-identical — and the final
``idw_value = Σw·v / Σw`` is ONE IEEE division of two exact integers.
This is inverse-SQUARED-distance weighting (the IDW power p=2 default)
with +1 smoothing: an exact probe-sample hit (d2=0) gets the maximum
finite weight ``scale`` instead of a pole, so coincident points need
no special-case branch.

``shift`` rescales d2 (µdeg²) so the weight resolution spans the
radius: auto = max(0, bit_length(d_u²) - 20), putting the scaled d2 in
[0, ~2^20] — at the far edge w ≈ scale/2^20, still ≥ 2^10 relative
steps at the default scale. Overflow contract (caller's bound, like
the sketch modules): scale · max|value| · neighbors_per_query < 2^63;
the defaults leave 2^33 of value·density headroom.

Values are cast to BIGINT — fixed-point µ-units are the caller's job
for fractional fields (the repo-wide integer-exactness convention).
Queries with no sample in radius are DROPPED (the J8/J9 miss→drop
contract); raise ``min_samples`` to also drop thin estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.knn_points import distance_join


def idw_interpolate(
    queries: DataFrame,
    samples: DataFrame,
    value_col: str,
    max_d: float,
    *,
    scale: int = 1 << 30,
    shift: int | None = None,
    level: int | None = None,
    broadcast_data: bool = True,
    query_id: str = "query_id",
    data_id: str = "data_id",
    metric: str = "planar",
    min_samples: int = 1,
) -> DataFrame:
    """queries(query_id, lon, lat) × samples(data_id, lon, lat, value)
    → (query_id, n_samples, w_sum, wv_sum, idw_value): the smoothed
    inverse-squared-distance estimate of ``value_col`` at each query
    point from every sample within degree distance ``max_d``.

    ``w_sum``/``wv_sum`` are the exact integer numerator/denominator —
    returned so a differential oracle can hash them directly;
    ``idw_value`` is their one-division double ratio. ``metric`` and
    ``level``/``broadcast_data`` pass through to
    :func:`~osm_spark.spatial.knn_points.distance_join`.
    """
    if scale <= 0:
        raise ValueError("scale must be positive")
    d_u = int(round(max_d * 1e6))
    if shift is None:
        shift = max(0, (d_u * d_u).bit_length() - 20)
    val = F.col(value_col).cast("long").alias("_idw_v")
    pairs = distance_join(
        queries,
        samples.select(F.col(data_id), F.col("lon"), F.col("lat"), val),
        max_d,
        level=level,
        broadcast_data=broadcast_data,
        query_id=query_id,
        data_id=data_id,
        metric=metric,
        data_cols=("_idw_v",),
    )
    w = F.expr(f"CAST({scale} AS BIGINT) DIV (1 + shiftright(d2_u, {shift}))")
    out = (
        pairs.select("query_id", w.alias("_w"), F.col("_idw_v"))
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum("_w").alias("w_sum"),
            F.sum(F.col("_w") * F.col("_idw_v")).alias("wv_sum"),
        )
        .where(
            (F.col("w_sum") > 0) & (F.col("n_samples") >= F.lit(min_samples))
        )
    )
    return out.select(
        "query_id",
        "n_samples",
        "w_sum",
        "wv_sum",
        (F.col("wv_sum") / F.col("w_sum")).alias("idw_value"),
    )
