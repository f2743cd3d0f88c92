"""Segment-crossing join — which trajectory pairs properly cross?

The segment×segment member of the spatial-join family (overlap.py is
polygon×polygon, hausdorff.py is pointset×pointset): report every
pair of steps from DIFFERENT trajectories whose closed segments
properly cross. "Properly" = the segments intersect at exactly one
point interior to both (the classic two-sided orientation test);
touches, shared endpoints and collinear overlaps are excluded — the
contract that keeps the predicate a pure sign test on exact int64
cross products, with no epsilon anywhere.

Scale shape:

1. **Segments** — one lag window per trajectory (the geo_sessions
   shuffle) turns ordered points into steps (traj, seg_idx, a, b).
2. **Candidates** — each segment's bbox is covered by cells of a
   side-2^s µdeg grid (pure integer shifts; s auto-sized from the
   MEASURED mean segment extent, one tiny agg job — the
   suggest_level pattern). Two top-level sequence/explode fan-outs,
   one cell equi-join, distinct on the segment-id pair. Fan-out per
   segment is O(bbox area / 4^s) — cells ≈ a few for typical steps;
   far-apart segments are never co-binned, so the candidate volume
   tracks real spatial density, not n².
3. **Verdict** — the four orientation signs, evaluated as sign
   comparisons (never o1·o2 < 0: the product of two ~1.3·10¹⁷ cross
   products overflows int64; the sign pair does not).

Exactness: coordinates are µdeg int64; every decision is a sign of an
exact 64-bit cross product (|coord| ≤ 1.8·10⁸ → |cross| ≤ 1.3·10¹⁷).
Candidate enumeration order cannot leak into the result (distinct
pair set + deterministic predicate).

No reference counterpart; training-data extension surface
(SURVEY §2.9 X93).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OFFSET = 180_000_000  # lon/lat µdeg → non-negative grid space


def segments_from_points(
    points: DataFrame,
    traj_col: str = "traj_id",
    order_cols: tuple[str, ...] = ("ts",),
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(traj, seg_idx, ax, ay, bx, by): consecutive steps per
    trajectory in ``order_cols`` order (include a unique tiebreaker in
    ``order_cols`` if the primary key can collide — segment indexing
    must be total for the output to be engine-exact)."""
    w = Window.partitionBy(traj_col).orderBy(*order_cols)
    x = F.round(F.col(lon_col) * 1e6).cast("long")
    y = F.round(F.col(lat_col) * 1e6).cast("long")
    stepped = points.select(
        F.col(traj_col).alias("traj"),
        (F.row_number().over(w) - 1).alias("seg_idx"),
        F.lag(x).over(w).alias("ax"),
        F.lag(y).over(w).alias("ay"),
        x.alias("bx"),
        y.alias("by"),
    )
    return stepped.where(F.col("ax").isNotNull()).withColumn(
        "seg_idx", F.col("seg_idx") - 1
    )


def _auto_shift(segments: DataFrame) -> int:
    """Cell side 2^s µdeg ≈ the mean segment extent (one scalar agg)."""
    row = segments.agg(
        F.avg(
            F.greatest(
                F.abs(F.col("bx") - F.col("ax")),
                F.abs(F.col("by") - F.col("ay")),
            )
        ).alias("m")
    ).first()
    mean_span = max(1.0, float(row["m"] or 1.0))
    return max(8, min(28, int(math.ceil(math.log2(mean_span)))))


def crossing_join(
    segments: DataFrame, shift: int | None = None, salt: int = 1
) -> DataFrame:
    """(traj_a, seg_a, traj_b, seg_b) for every properly-crossing
    segment pair from different trajectories (traj_a < traj_b; both
    orderings of equal-traj... cross-traj pairs canonicalized).

    ``salt``: mega-cell EXPANSION-skew guard (measured in
    tools/skew_demo_crossings.py / SCALE.md). A cell holding m
    co-located segments expands to ~m² candidate pairs inside ONE
    reduce task — and AQE's skew split cannot help, because it splits
    by shuffle-INPUT bytes and the hot key's input is tiny (the
    blowup is the join's output). salt=R shards the a-side by segment
    hash and replicates the b-side R ways (join key (cx, cy, salt)),
    bounding the per-task pair volume at pairs/R for an R× replication
    of the b-side fan-out — the standard self-join expansion split.
    Output is salt-invariant (pinned by test_crossings)."""
    if shift is None:
        shift = _auto_shift(segments)

    def covered(df: DataFrame, tag: str) -> DataFrame:
        gx0 = F.shiftright(F.least("ax", "bx") + F.lit(_OFFSET), shift)
        gx1 = F.shiftright(F.greatest("ax", "bx") + F.lit(_OFFSET), shift)
        gy0 = F.shiftright(F.least("ay", "by") + F.lit(_OFFSET), shift)
        gy1 = F.shiftright(F.greatest("ay", "by") + F.lit(_OFFSET), shift)
        out = df.select(
            F.col("traj").alias(f"traj_{tag}"),
            F.col("seg_idx").alias(f"seg_{tag}"),
            F.col("ax").alias(f"{tag}ax"),
            F.col("ay").alias(f"{tag}ay"),
            F.col("bx").alias(f"{tag}bx"),
            F.col("by").alias(f"{tag}by"),
            F.explode(F.sequence(gx0, gx1)).alias("cx"),
            gy0.alias("_gy0"),
            gy1.alias("_gy1"),
        )
        return out.select(
            *[c for c in out.columns if c not in ("_gy0", "_gy1")],
            F.explode(F.sequence("_gy0", "_gy1")).alias("cy"),
        )

    a = covered(segments, "a")
    b = covered(segments, "b")
    if salt > 1:
        # a-row carries ONE salt, b-row all salts: each (a, b) pair
        # meets exactly once (at a's salt) — same pair set, R-way
        # split of every cell's expansion.
        a = a.withColumn(
            "_s", F.pmod(F.hash("traj_a", "seg_a"), F.lit(salt))
        )
        b = b.withColumn(
            "_s", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        keys = ["cx", "cy", "_s"]
    else:
        keys = ["cx", "cy"]
    cand = (
        a.join(b, keys)
        .where(F.col("traj_a") < F.col("traj_b"))
        .drop(*keys)
        .distinct()
    )

    def orient(px, py, qx, qy, rx, ry):
        return (F.col(qx) - F.col(px)) * (F.col(ry) - F.col(py)) - (
            F.col(qy) - F.col(py)
        ) * (F.col(rx) - F.col(px))

    o1 = orient("aax", "aay", "abx", "aby", "bax", "bay")
    o2 = orient("aax", "aay", "abx", "aby", "bbx", "bby")
    o3 = orient("bax", "bay", "bbx", "bby", "aax", "aay")
    o4 = orient("bax", "bay", "bbx", "bby", "abx", "aby")
    proper = (
        (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0)))
        & (((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0)))
    )
    return cand.where(proper).select("traj_a", "seg_a", "traj_b", "seg_b")
