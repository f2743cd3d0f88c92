"""Exact distributed quantiles — rank-select without a global sort.

Spark's built-ins force a choice: ``percentile_approx`` (sketch, not
exact) or ``percentile``/``Window.orderBy`` over the whole relation
(exact, but the final sort serializes through few tasks and the window
through ONE). At 10^12 rows neither is acceptable for an exact answer.

This operator computes exact discrete quantiles (DuckDB
``quantile_disc`` semantics: the element at 1-based rank
``max(1, ceil(q·N))``) with the two-phase prefix-sum pattern the
sequence packer already uses (text/packing.py):

1. **Range partition** on the value column (one shuffle — Spark
   samples split points; correctness never depends on where the
   boundaries land) and persist to freeze the layout.
2. **Per-partition counts** — one tiny aggregate; the O(partitions)
   histogram goes to the driver, whose prefix sum locates, for every
   requested quantile, the partition holding its global rank and the
   rank's offset within it.
3. **Local rank-select** — only the partitions that own a target rank
   are touched again: filter on ``spark_partition_id`` (all other
   partitions are skipped at the scan), sort WITHIN each such
   partition (parallel, bounded by the largest partition, never a
   global sort) and pick the offsets with a per-partition window.

Total cost: one range shuffle + one O(P) aggregate + a local sort of
only the hit partitions. Ties and duplicate values are handled by
pure rank arithmetic — no value comparisons cross partitions because
range partitioning guarantees inter-partition order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """(q double, value) — exact quantile_disc for every q in ``qs``.

    Nulls are excluded (SQL aggregate semantics). Empty input returns
    an empty frame."""
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("qs must be non-empty fractions in [0, 1]")
    spark = df.sparkSession
    vals = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = vals.repartitionByRange(p, "v").persist()
    hist = (
        ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .orderBy("pid")
        .collect()
    )
    total = sum(r["n"] for r in hist)
    if total == 0:
        ranged.unpersist()
        return spark.createDataFrame([], f"q double, value {df.schema[col].dataType.simpleString()}")
    # driver-side prefix sum over O(P) rows → (pid, local_rank) targets
    targets: list[tuple[int, int, float]] = []  # (pid, local_rank, q)
    for q in qs:
        rank = max(1, math.ceil(q * total))  # 1-based global rank
        acc = 0
        for r in hist:
            if rank <= acc + r["n"]:
                targets.append((r["pid"], rank - acc, q))
                break
            acc += r["n"]
    hit_pids = sorted({t[0] for t in targets})
    picks = spark.createDataFrame(
        [(pid, lr, q) for pid, lr, q in targets], "pid int, lr long, q double"
    )
    w = Window.partitionBy("pid").orderBy("v")
    local = (
        ranged.withColumn("pid", F.spark_partition_id())
        .where(F.col("pid").isin(hit_pids))
        .withColumn("lr", F.row_number().over(w))
    )
    out = (
        local.join(F.broadcast(picks), ["pid", "lr"])
        .select("q", F.col("v").alias("value"))
    )
    # The answer is O(len(qs)) rows: materialize it so the persisted
    # range layout can be released here instead of leaking into the
    # caller's session (ADVICE r3 pattern: no operator-lifetime caches).
    rows = [(r["q"], r["value"]) for r in out.collect()]
    ranged.unpersist()
    return spark.createDataFrame(
        rows, f"q double, value {df.schema[col].dataType.simpleString()}"
    )
