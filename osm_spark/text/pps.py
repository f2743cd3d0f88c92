"""Exact systematic PPS (probability-proportional-to-size) sampling.

The weighted companion of the uniform stratified sampler (X68):
draw m slots over the cumulative integer weight line with a fixed
midpoint stride — row i is selected with multiplicity = number of
stride positions falling inside its weight interval, so E[mult_i] =
m·wᵢ/W exactly and Σ mult = m ALWAYS (the telescoping property of
the position-count formula). The canonical order is the id — the
sample is a pure function of the (id, weight) SET, reproducible on
any engine at any parallelism.

This is the quality-weighted mixture move (sample documents ∝ token
count / quality score) with none of the float trouble weighted
reservoir schemes carry (Efraimidis–Spirakis keys need u^{1/w} — a
libm-dependent ordering no cross-engine hash gate can pin). Every
quantity here is int64:

    W    = Σw (one map-side-combinable agg, via the partition pass)
    p_j  = ⌊(2j+1)·W / 2m⌋,  j = 0..m−1          (midpoint stride)
    C_i  = exclusive prefix sum of w in id order
    mult_i = count(C_i + w_i) − count(C_i)  where
    count(X) = #{j : p_j < X}
             = 0                         if 2mX ≤ W
             = min(m, ⌈(2mX − W)/2W⌉)    otherwise (positive operands
                                          only — floor/trunc agree)

Prefix sums use the packing.py two-phase shape: range-partition by
id + partition-local sort → per-partition totals → O(P) driver
prefix → partition-local window. No global sort, no global window.

int64 bound: the formula computes 2·m·W — keep m·W < 2^62 (at
10^12 rows × 10^6-scale weights, draw in shards or pre-scale w).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pps_sample(
    df: DataFrame,
    m: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    n_parts: int | None = None,
) -> DataFrame:
    """(id, weight, mult) for every row with selection multiplicity
    ≥ 1; Σ mult = m exactly. Zero-weight rows are never selected;
    negative weights fail the job (in-plan guard)."""
    if m <= 0:
        raise ValueError("m must be positive")
    sp = df.sparkSession
    w_guard = F.when(
        F.col(weight_col) < 0,
        F.raise_error(F.lit("pps_sample: negative weight")),
    ).otherwise(F.col(weight_col).cast("long"))
    src = df.select(F.col(id_col).alias("_id"), w_guard.alias("_w"))
    np_ = n_parts or src.rdd.getNumPartitions() or 1
    ranged = (
        src.repartitionByRange(np_, "_id")
        .sortWithinPartitions("_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = {
        r["pid"]: int(r["s"])
        for r in ranged.groupBy("pid").agg(F.sum("_w").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(psums):
        offsets.append((pid, acc))
        acc += psums[pid]
    total_w = acc
    if total_w <= 0:
        return sp.createDataFrame(
            [], f"{id_col} {dict(df.dtypes)[id_col]}, "
            f"weight long, mult long"
        )
    if m * total_w >= 1 << 62:
        raise ValueError(
            f"m·W = {m * total_w} overflows the 2·m·W formula — "
            "shard the draw or pre-scale weights"
        )
    off_df = sp.createDataFrame(offsets, "pid int, part_off long")
    win = (
        Window.partitionBy("pid")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = F.coalesce(F.sum("_w").over(win), F.lit(0)) + F.col("part_off")

    W, M = total_w, m
    # count(X) numerators as named columns so the integral `div`
    # (NEVER `/` — doubles drop bits past 2^53 and these reach 2·m·W)
    # can run in a plain SQL expression; operands are positive where
    # the div applies, so trunc (Spark div) == floor (DuckDB //).
    pre = ranged.join(F.broadcast(off_df), "pid").select(
        F.col("_id"),
        F.col("_w"),
        (F.lit(2 * M) * (c + F.col("_w")) - F.lit(W)).alias("_na"),
        (F.lit(2 * M) * c - F.lit(W)).alias("_nb"),
    )
    cnt = (
        "CASE WHEN {n} <= 0 THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST({M} AS BIGINT), "
        f"({{n}} + {2 * W - 1}) div {2 * W}) END"
    )
    mult = F.expr(
        f"({cnt.format(n='_na')}) - ({cnt.format(n='_nb')})"
    )
    return pre.select(
        F.col("_id").alias(id_col),
        F.col("_w").alias("weight"),
        mult.cast("long").alias("mult"),
    ).where(F.col("mult") > 0)
