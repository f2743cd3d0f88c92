"""Temporal joins and rollups — as-of join, interval range join,
hypertable-style multi-granularity rollup.

These are the time-series operators Spark's built-in API lacks as
first-class verbs but the DataFrame algebra expresses efficiently;
each is built so Catalyst keeps the page/event side to ONE shuffle.

Scale shapes (the reason each is written the way it is):

- ``asof_join``: the naive formulation is an inequality join
  (``l.ts >= r.ts`` + argmax), which Spark executes as a
  broadcast-nested-loop or a sort-merge with per-row rescans —
  O(n·m) within a key at worst. The union-tag + window formulation
  here is the classic distributed as-of: ONE hash shuffle on the key,
  one per-partition sort, then a running ``last(ignorenulls)`` — every
  row is touched once, and the window is rows-running (no range
  rescan), so a 10^12-row probe side streams. Pandas calls the same
  algorithm ``merge_asof`` (sort + single backward scan).
- ``range_join``: points × intervals with NO equi key degenerates to a
  cross join in vanilla Spark. Binning fixes it: each point owns
  exactly one bucket, each interval explodes into the buckets it
  covers, and the join becomes an equi-join on bucket + a residual
  predicate — shuffle volume is O(points + intervals · span/bucket).
  Bucket width trades interval-side duplication against candidate
  slack; pass roughly the median interval span.
- ``time_rollup``: the TimescaleDB "continuous aggregate" shape —
  one pass, GROUPING SETS over (bucket_coarse, bucket_fine) × dims,
  all partial-aggregated map-side. One shuffle for every granularity
  instead of one scan per granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``right_ts`` <= ``left_ts`` within its key group (DuckDB
    ``ASOF LEFT JOIN`` / pandas ``merge_asof(direction="backward")``
    semantics; unmatched left rows keep nulls).

    Determinism contract: the right side MUST be unique per
    (key, ts) — with duplicates, ``last()`` picks whichever sorts
    last in the partition-local order, which is not a stated rule.
    Dedupe upstream with an explicit argmax (e.g. ``max_by``), as
    the q92 query does.

    ``tolerance_s``: optional max staleness in seconds — matches
    older than ``left_ts - tolerance_s`` are nulled out (pandas'
    ``tolerance``), keeping the join result but dropping the payload.

    Shape: union-tag + running ``last(ignorenulls)`` window — one
    shuffle on the key, no inequality join. Payload columns ride a
    single struct so the window computes ONE running value.
    """
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        F.col(by_right).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l = left.select(
        F.col(by_left).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    both = r.unionByName(l)
    # Right rows sort BEFORE left rows at the same timestamp (__side
    # 0 < 1), so an equal-ts right row is visible to the left row —
    # the <= (inclusive) as-of contract.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select("__l", "__m")
    )
    if tolerance_s is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.__ts")
                >= F.col(f"__l.{left_ts}") - F.expr(f"INTERVAL {tolerance_s} SECOND"),
                F.col("__m"),
            ),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__ts").alias(f"matched_{right_ts}"))
    out_cols += [F.col(f"__m.{c}").alias(c) for c in value_cols]
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Interval join with NO equi key: every (point, interval) pair
    where ``start_ts <= point_ts < end_ts`` (half-open), without a
    cross join.

    Each point maps to its single time bucket; each interval explodes
    into the buckets it overlaps (``sequence`` — JVM-side, no Python);
    the pair space is then an equi-join on bucket plus the exact
    residual predicate. A point meets a given interval in exactly one
    bucket (its own), so no distinct is needed — output multiplicity
    is exactly the true pair multiplicity.

    Scale: shuffle is O(points + intervals · span/bucket). Hot buckets
    (event spikes) are ordinary join skew — AQE skew-split applies
    because this IS a plain equi-join after the rewrite.
    """
    bs = _bucket_seconds(bucket)
    p = points.withColumn(
        "__b",
        F.unix_timestamp(F.col(point_ts))
        - F.unix_timestamp(F.col(point_ts)) % F.lit(bs),
    )
    i = intervals.withColumn(
        "__bs",
        F.explode(
            F.sequence(
                F.unix_timestamp(F.col(start_ts)) - F.unix_timestamp(F.col(start_ts)) % bs,
                # end is EXCLUSIVE: a point at exactly end_ts never
                # matches, but the bucket containing end-epsilon does.
                F.unix_timestamp(F.col(end_ts)) - F.lit(1)
                - (F.unix_timestamp(F.col(end_ts)) - F.lit(1)) % bs,
                F.lit(bs),
            )
        ),
    )
    joined = p.join(i, p["__b"] == i["__bs"]).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__b", "__bs")


def _bucket_seconds(bucket: str) -> int:
    n, unit = bucket.split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        unit.rstrip("s")
    ]
    return int(n) * mult


def time_rollup(
    events: DataFrame,
    ts_col: str,
    dims: list[str],
    aggs: list,
    granularities: list[str] = ("hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: ONE scan producing every
    (granularity × dims) rollup via GROUPING SETS.

    Output: one row per (granularity, bucket, *dims) with a ``gran``
    label column. All aggregates must be partial-aggregatable (sum /
    count / min / max / avg) so the heavy lifting is map-side; the
    single shuffle carries pre-combined partials for every granularity
    at once — at 10^12 events this beats one-pass-per-granularity by
    the scan count.
    """
    buckets = [
        F.date_trunc(g, F.col(ts_col)).alias(f"__b_{g}") for g in granularities
    ]
    base = events.select(*buckets, "*")
    sets = ", ".join(
        "(" + ", ".join([f"__b_{g}"] + dims) + ")" for g in granularities
    )
    base.createOrReplaceTempView("__rollup_base")
    agg_sql = ", ".join(aggs)
    dim_sql = ("," + ", ".join(dims)) if dims else ""
    bucket_cols = ", ".join(f"__b_{g}" for g in granularities)
    gran_label = "CASE " + " ".join(
        f"WHEN __b_{g} IS NOT NULL THEN '{g}'" for g in granularities
    ) + " END"
    df = base.sparkSession.sql(
        f"""
        SELECT {gran_label} AS gran,
               coalesce({bucket_cols}) AS bucket
               {dim_sql}, {agg_sql}
        FROM __rollup_base
        GROUP BY GROUPING SETS ({sets})
        """
    )
    return df
