"""Sequence packing: concat-and-chunk token-offset assignment.

Pretraining pipelines concatenate the token streams of all documents
in a fixed global order and cut the stream into fixed-length training
sequences (seq_len tokens). The assignment every downstream loader
needs is per-document: WHERE in the global token stream does this doc
start, and which sequence ids does it span. That is a global
prefix sum over documents ordered by key — the textbook "not a
window over one partition, please" operation at 10^12 rows.

Scale shape — two-phase distributed prefix sum:

1. range-partition by key and sort within partitions (one shuffle;
   Spark's range partitioner balances by sampled quantiles, so skew
   in doc length doesn't matter — the partitioned quantity is rows);
2. per-partition token totals -> driver (O(partitions) rows, like the
   manifest's O(files) — NOT a per-row collect), exclusive prefix sum
   there, broadcast back;
3. within each partition a bounded window (partitionBy pid) adds the
   local running sum to the partition's global offset.

A naive `Window.orderBy(key)` with no partitionBy computes the same
thing by dragging EVERY row through one task — correct at 10^3 rows,
dead at 10^9. The DuckDB oracle uses exactly that single-window
formulation, which is the point: two radically different plans, one
answer, hash-checked.

The partition id is pinned with localCheckpoint before it is used
twice (once for the totals, once for the window): range partitioning
samples, so without pinning the two passes could disagree on
boundaries. Output VALUES are boundary-independent either way — the
pin is self-consistency within one run, not determinism of results
(those depend only on the key order).

Documents with zero tokens are dropped (nothing to pack) — pinned in
tests as chosen semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.text.analysis import TOKENS_SQL


def pack_offsets(
    docs: DataFrame,
    seq_len: int,
    key: str = "doc_id",
    text: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document packing assignment.

    Returns (key, n_tokens, start_tok, seq_first, seq_last) where
    ``start_tok`` is the document's first token's offset in the
    global concatenated stream (docs ordered by ``key``) and
    ``seq_first``/``seq_last`` are the first/last training-sequence
    ids (0-based, ``seq_len`` tokens each) the document lands in.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    toks = docs.select(
        F.col(key),
        F.size(F.expr(TOKENS_SQL.format(t=text))).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)

    np_ = num_partitions or toks.sparkSession.sparkContext.defaultParallelism
    ranged = (
        toks.repartitionByRange(np_, key)
        .sortWithinPartitions(key)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # O(partitions) driver pass: exclusive prefix of per-partition sums.
    psums = {
        r["pid"]: r["s"]
        for r in ranged.groupBy("pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(psums):
        offsets.append((pid, acc))
        acc += int(psums[pid])
    off_df = ranged.sparkSession.createDataFrame(
        offsets or [(0, 0)], "pid int, part_off long"
    )

    w = (
        Window.partitionBy("pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("part_off")
    ).alias("start_tok")
    return (
        ranged.join(F.broadcast(off_df), "pid")
        .select(key, "n_tokens", start)
        .select(
            key,
            "n_tokens",
            "start_tok",
            # integer div (not float /-then-cast: token offsets at
            # 10^12 docs overflow double's exact-integer range)
            F.expr(f"start_tok div {seq_len}").alias("seq_first"),
            F.expr(
                f"(start_tok + n_tokens - 1) div {seq_len}"
            ).alias("seq_last"),
        )
    )


def sequence_stats(pack: DataFrame, seq_len: int) -> DataFrame:
    """Per-sequence view of a packing: how many documents touch each
    training sequence and how many of its token slots they fill (the
    tail sequence may be partial). One explode over the doc spans —
    each doc spans ceil(n/seq_len)+1 sequences at most, so the blowup
    is bounded by the corpus token count / seq_len."""
    spans = pack.select(
        "start_tok",
        "n_tokens",
        F.explode(F.sequence("seq_first", "seq_last")).alias("seq_id"),
    ).select(
        "seq_id",
        (
            F.least(
                (F.col("seq_id") + 1) * seq_len,
                F.col("start_tok") + F.col("n_tokens"),
            )
            - F.greatest(F.col("seq_id") * seq_len, F.col("start_tok"))
        ).alias("tok_in_seq"),
    )
    return spans.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok_in_seq").alias("n_tokens"),
    )
