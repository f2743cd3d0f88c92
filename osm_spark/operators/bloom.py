"""Bloom-filter join pruning — engine-reproducible, pure Catalyst.

The standard 100-TB pattern for a selective join: instead of shuffling
the 10^12-row probe side against a filtered build side, build a bloom
filter over the build keys (one map-side-combinable aggregate), then
prune the probe side with a BROADCAST equi-join against the filter's
word table — zero shuffle on the big side, no false negatives, a
bounded false-positive rate that the real join (or an exact semi-join
over the surviving sliver) cleans up. Spark's own runtime row-level
filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does
this opportunistically inside one query; this operator makes the
structure EXPLICIT so it can be built once, persisted in a manifest
table, merged across shards/snapshots (bitwise OR of word rows), and
reused across queries — the same lifecycle as the HLL/CMS sketches in
operators/sketch.py.

Engine-reproducible convention (shared with sketch.py / sampling.py):
k independent bit positions per key via md5('j:'||key) 48-bit-prefix
int64 mod n_bits. Words are 63 BITS wide — the sign bit of the int64
word is never used, so ``1 << (bit % 63)`` is the same non-negative
value in Spark and DuckDB and the oracle can rebuild the filter
bit-for-bit without two's-complement edge cases.

Scale shape:
- build: explode k (word, mask) pairs per key → ONE groupBy(word) with
  a bit_or aggregate. Partial aggregation caps shuffle at
  tasks × n_words regardless of build rows.
- probe: k (word, mask) pairs per probe row joined BROADCAST against
  the ≤ n_words filter rows, then a groupBy(row-key) counting
  satisfied probes — all JVM-side, no Python. For a 10^12-row probe
  side prefer ``bloom_prune`` (below), which keeps the probe row
  intact and needs no re-aggregation when k·probe fan-out would
  dominate: it maps each key to its k masks via k broadcast joins
  folded into array lookups — still zero shuffle on the probe side.
- merge: union word tables and groupBy(word).agg(bit_or(bits)) — the
  filter of the union of key sets, exactly (OR-linearity).

No false negatives is structural: every inserted key's k bits are set,
so the conjunction test cannot fail for it. False positives are
measured, not assumed — callers that need exactness follow with the
real join on the surviving rows (which is the point: the join now
touches fp_rate·N instead of N rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = 12  # 48-bit md5-prefix hash (sampling.py convention)
_WORD = 63  # bits per int64 word; sign bit unused (engine parity)


def _bitpos(key: Column, j: int, n_bits: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, _HEX), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(n_bits))


def _word_mask(key: Column, j: int, n_bits: int) -> Column:
    bit = _bitpos(key, j, n_bits)
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(bit, F.lit(_WORD)).cast("int")
    )
    return F.struct(
        (bit / _WORD).cast("long").alias("word"), mask.alias("mask")
    )


def bloom_build(
    df: DataFrame, key: str, n_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """(word long, bits long) rows, ≤ ceil(n_bits/63) of them.
    Mergeable: union word tables + groupBy(word).agg(bit_or(bits))."""
    kc = F.col(key).cast("string")
    pairs = F.array(*[_word_mask(kc, j, n_bits) for j in range(k)])
    return (
        df.where(F.col(key).isNotNull())
        .select(F.explode(pairs).alias("wm"))
        .groupBy(F.col("wm.word").alias("word"))
        .agg(F.expr("bit_or(wm.mask)").alias("bits"))
    )


def bloom_prune(
    probe: DataFrame, key: str, bloom: DataFrame, n_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Rows of ``probe`` whose key passes the filter (all k bits set).

    Plan: k broadcast LEFT joins against the tiny word table — one per
    hash — each adding a boolean ``(bits & mask) = mask`` (missing
    word → fail). The probe side is never exploded, shuffled, or
    re-aggregated: each join is a broadcast hash join on ``word``, so
    the big side streams through map tasks once per hash. For small k
    (≤ ~6, the useful range) this beats the explode+regroup shape by
    avoiding the k× row fan-out AND the groupBy shuffle."""
    kc = F.col(key).cast("string")
    out = probe
    for j in range(k):
        wm = _word_mask(kc, j, n_bits)
        b = bloom.select(
            F.col("word").alias(f"_bw{j}"), F.col("bits").alias(f"_bb{j}")
        )
        out = (
            out.withColumn(f"_w{j}", wm["word"])
            .withColumn(f"_m{j}", wm["mask"])
            .join(
                F.broadcast(b),
                F.col(f"_w{j}") == F.col(f"_bw{j}"),
                "left",
            )
            .where(
                F.col(f"_bb{j}").isNotNull()
                & (F.col(f"_bb{j}").bitwiseAND(F.col(f"_m{j}")) == F.col(f"_m{j}"))
            )
            .drop(f"_w{j}", f"_m{j}", f"_bw{j}", f"_bb{j}")
        )
    return out
