"""HyperLogLog distinct-count sketch — engine-reproducible variant.

Spark's ``approx_count_distinct`` and DuckDB's ``approx_count_distinct``
are both HLL but with different hashes and internals, so they can never
cross-check each other. This operator implements HLL (Flajolet et al.
2007) from first principles on the repo's oracle hash convention
(md5-prefix → int64, the text/sampling.py scheme), with one extra
twist that makes the estimate BIT-IDENTICAL across engines: the
harmonic denominator Σ 2^(-M_j) is accumulated as the exact integer
Σ 2^(37 - M_j) (ranks are ≤ 37 by construction, so every term and the
4096-register sum fit comfortably in int64) — an order-free fold, so
Spark's partition-parallel aggregation and DuckDB's sequential one
produce the same number, and the only float ops are a final division
and (in the small-range branch) one ln of an integer ratio.

Layout: a 48-bit uniform hash (12 md5 hex chars); the top ``p`` bits
pick the register, the remaining ``48 - p`` bits give the rank
(leading zeros + 1, capped at 48 - p + 1). floor(log2) is computed
EXACTLY via the length of the base-2 string (``bin()`` in both
engines) — never a float log that could misround at a power of two.

Scale shape: ONE map-side-combinable groupBy over ≤ 2^p groups — the
sketch table (register, max_rank) is tiny, mergeable across shards /
snapshots by a further max() groupBy (the property that makes HLL the
standard distributed-distinct structure), and the estimate is a
single-row aggregate over it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = 12          # 48-bit hash (sampling.py convention)
_BITS = 4 * _HEX


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _hash48(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key), 1, _HEX), 16, 10).cast("long")


def hll_sketch(df: DataFrame, key: str, p: int = 12) -> DataFrame:
    """(register, max_rank) sketch rows — mergeable: union sketches
    and groupBy(register).max(max_rank) to sketch a union of sets."""
    tail_bits = _BITS - p
    h = _hash48(F.col(key).cast("string"))
    register = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    # rank = leading zeros in the tail field + 1; exact floor(log2)
    # via the binary-string length (bin(0) is never consulted).
    rank = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits + 1) - F.length(F.bin(tail))
    )
    return (
        df.where(F.col(key).isNotNull())
        .select(register.alias("register"), rank.alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(sketch: DataFrame, p: int = 12) -> DataFrame:
    """One row: (estimate double, v_zero long, n_registers long).

    estimate = alpha·m² / Σ 2^(-M_j) with the small-range correction
    m·ln(m/V) when E ≤ 2.5 m and V > 0 (Flajolet et al. §4)."""
    m = 1 << p
    tail_bits = _BITS - p
    scale = 1 << tail_bits  # 2^(48-p): the exact-integer denominator unit
    alpha = _alpha(m)
    agg = sketch.agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {tail_bits} - max_rank)"))
        .alias("int_sum"),
        F.count("*").alias("n_registers"),
    )
    v = F.lit(m) - F.col("n_registers")
    denom = (F.col("int_sum") + v * F.lit(scale)).cast("double") / F.lit(
        float(scale)
    )
    e_raw = F.lit(alpha * m * m) / denom
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((e_raw <= 2.5 * m) & (v > 0), small).otherwise(e_raw)
    return agg.select(
        F.round(est, 4).alias("estimate"),
        v.cast("long").alias("v_zero"),
        F.col("n_registers").cast("long").alias("n_registers"),
    )


def hll_distinct(df: DataFrame, key: str, p: int = 12) -> DataFrame:
    """End-to-end: sketch + estimate in one plan."""
    return hll_estimate(hll_sketch(df, key, p), p)


def hll_sketch_by(
    df: DataFrame, group: str, key: str, p: int = 12
) -> DataFrame:
    """Per-group sketch: (group, register, max_rank). Same mergeability
    as the global sketch, per group value."""
    tail_bits = _BITS - p
    h = _hash48(F.col(key).cast("string"))
    register = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    rank = F.when(tail == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits + 1) - F.length(F.bin(tail))
    )
    return (
        df.where(F.col(key).isNotNull())
        .select(F.col(group), register.alias("register"), rank.alias("rank"))
        .groupBy(group, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate_by(sketch: DataFrame, group: str, p: int = 12) -> DataFrame:
    """Per-group estimates: (group, estimate, v_zero, n_registers) —
    the grouped twin of ``hll_estimate`` with identical arithmetic.

    Scale shape: distinct-per-group is normally a
    count_distinct(key) GROUP BY group — an exact shuffle of every
    distinct (group, key) pair, brutal when both are high-cardinality
    (urls per host at 10^12 rows). Here the wire carries at most
    groups × 2^p sketch rows, all map-side combined, and per-shard
    sketches fold by max() without rescanning."""
    m = 1 << p
    tail_bits = _BITS - p
    scale = 1 << tail_bits
    alpha = _alpha(m)
    agg = sketch.groupBy(group).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {tail_bits} - max_rank)"))
        .alias("int_sum"),
        F.count("*").alias("n_registers"),
    )
    v = F.lit(m) - F.col("n_registers")
    denom = (F.col("int_sum") + v * F.lit(scale)).cast("double") / F.lit(
        float(scale)
    )
    e_raw = F.lit(alpha * m * m) / denom
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((e_raw <= 2.5 * m) & (v > 0), small).otherwise(e_raw)
    return agg.select(
        F.col(group),
        F.round(est, 4).alias("estimate"),
        v.cast("long").alias("v_zero"),
        F.col("n_registers").cast("long").alias("n_registers"),
    )


def hll_distinct_by(
    df: DataFrame, group: str, key: str, p: int = 12
) -> DataFrame:
    """End-to-end per-group distinct estimate in one plan."""
    return hll_estimate_by(hll_sketch_by(df, group, key, p), group, p)


def hll_estimate_py(ranks: dict[int, int], p: int = 12) -> float:
    """Driver-side twin for tests (same exact-integer arithmetic)."""
    m = 1 << p
    tail_bits = _BITS - p
    scale = 1 << tail_bits
    int_sum = sum(1 << (tail_bits - r) for r in ranks.values())
    v = m - len(ranks)
    denom = (int_sum + v * scale) / float(scale)
    e_raw = _alpha(m) * m * m / denom
    if e_raw <= 2.5 * m and v > 0:
        return round(m * math.log(m / v), 4)
    return round(e_raw, 4)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency twin
# of the HLL above: d independent hash rows × w counters, point query
# = min over the d cells, guaranteed est ≥ true and est ≤ true + εN
# with ε = e/w at failure probability e^-d. Same engine-reproducible
# convention (md5-prefix int64 hashes, integer-only counters), so the
# DuckDB oracle recomputes the ENTIRE sketch + query bit-identically.
#
# Scale shape: the build is ONE map-side-combinable groupBy — the d×
# explode is bounded by partial aggregation (each task emits at most
# its d·w local grid, regardless of input rows), so shuffle volume is
# tasks × d·w, not rows × d. Sketches are mergeable by
# groupBy(row, col).sum(cnt) (counter linearity), which is what makes
# CMS the standard structure for per-shard / per-snapshot frequency
# summaries folded across a 10^12-row table. The query side broadcasts
# the d·w-cell sketch and touches each candidate once.
# ---------------------------------------------------------------------------


def _cm_cell(key: Column, j: int, w: int) -> Column:
    """Row-j column index: md5('j:'||key) 48-bit prefix mod w."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, _HEX), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(w)).cast("int")


def cm_sketch(df: DataFrame, key: str, d: int = 4, w: int = 2048) -> DataFrame:
    """(row int, col int, cnt long) counters; ≤ d·w rows. Mergeable:
    union sketches and groupBy(row, col).sum(cnt) to sketch a union
    of multisets (counter linearity)."""
    k = F.col(key).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("row"), _cm_cell(k, j, w).alias("col")
            )
            for j in range(d)
        ]
    )
    return (
        df.where(F.col(key).isNotNull())
        .select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cm_query(
    sketch: DataFrame, keys: DataFrame, key: str, d: int = 4, w: int = 2048
) -> DataFrame:
    """Point-query each row of ``keys``: (key, est_count long) with
    est_count = min over the d rows (0 for never-seen keys via the
    left join). The sketch side is broadcast — d·w cells, a few KB."""
    k = F.col(key).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("row"), _cm_cell(k, j, w).alias("col")
            )
            for j in range(d)
        ]
    )
    probes = keys.select(F.col(key), F.explode(cells).alias("rc")).select(
        key, F.col("rc.row").alias("row"), F.col("rc.col").alias("col")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .select(key, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(key)
        .agg(F.min("cnt").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# Equi-width histogram sketch — mergeable approximate quantiles
# ---------------------------------------------------------------------------
# The mergeable companion to operators/quantiles.py (exact two-phase
# rank-select): a fixed [lo, hi) equi-width bin-count table over an
# INT64 column. Everything is exact integer arithmetic — the bin
# assignment is ((x - lo)·n_bins) DIV (hi - lo), clamped — so the
# sketch is order-free, bit-identical at any parallelism, engine-
# reproducible (q131 recomputes it in SQL), and merges across shards /
# snapshots / stream batches by a plain SUM groupBy. The quantile
# estimate is the LOWER BOUNDARY of the bin holding the target rank
# (quantile_disc rank semantics: r = ⌊q·(n-1)⌋, first bin with
# cumulative count > r): off by at most one bin width
# ceil((hi-lo)/n_bins) — the classic accuracy/size trade against the
# exact operator's extra shuffle.
#
# Scale shape: ONE map-side-combinable groupBy over ≤ n_bins groups
# (shuffle ≤ tasks × n_bins rows regardless of input size); the
# quantile lookup runs a window over the n_bins-row sketch — driver-
# trivial but kept relational so it composes with the oracle.


def hist_sketch(
    df: DataFrame, col: str, lo: int, hi: int, n_bins: int = 256
) -> DataFrame:
    """(bin int, n long) equi-width counts of int64 ``col`` over
    [lo, hi); values outside clamp into the edge bins (documented —
    the edge bins are therefore open-ended)."""
    if not lo < hi:
        raise ValueError("need lo < hi")
    if n_bins < 1:
        raise ValueError("need n_bins >= 1")
    x = F.col(col).cast("long")
    raw = F.expr(
        f"(({col} - {lo}L) * {n_bins}L) div {hi - lo}L"
    )
    b = F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(n_bins - 1).cast("long")
    )
    return (
        df.where(x.isNotNull())
        .select(b.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches of the same (lo, hi, n_bins) config: SUM by bin."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("n").alias("n"))


def hist_quantiles(
    sketch: DataFrame, qs_ppm: list[int], lo: int, hi: int, n_bins: int = 256
) -> DataFrame:
    """(q_ppm, bin, est_num, est_den, est) per requested quantile
    (parts-per-million integers so the rank math stays exact).

    rank r = (q_ppm·(N-1)) div 10^6 over total count N; the answer bin
    is the first whose cumulative count exceeds r; the estimate is its
    lower boundary lo + bin·(hi-lo)/n_bins, carried as the exact
    integer pair (est_num = lo·n_bins + bin·(hi-lo), est_den = n_bins)
    plus their one-division double ratio."""
    from pyspark.sql import Window

    qdf = sketch.sparkSession.createDataFrame(
        [(int(q),) for q in qs_ppm], "q_ppm long"
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin", "n", F.sum("n").over(w).alias("cum")
    ).withColumn("total", F.sum("n").over(Window.partitionBy()))
    ranked = qdf.crossJoin(cum).where(
        F.col("cum")
        > F.expr("(q_ppm * (total - 1)) div 1000000")
    )
    first = (
        ranked.groupBy("q_ppm")
        .agg(F.min("bin").cast("long").alias("bin"))
    )
    num = F.lit(lo).cast("long") * n_bins + F.col("bin") * (hi - lo)
    return first.select(
        "q_ppm",
        "bin",
        num.alias("est_num"),
        F.lit(n_bins).cast("long").alias("est_den"),
        (num / F.lit(n_bins)).alias("est"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta) sketch — distinct estimates that also
# support set INTERSECTION, the operation HLL cannot give directly.
# Same 48-bit md5-prefix hash convention, so a DuckDB oracle replays
# every step; the only float op is one final division of exact int64s
# (engine-identical IEEE). Estimator: with k distinct uniform hashes
# the (k)-th smallest h_k estimates density, est = (k-1)·2^48 / h_k
# (Bar-Yossef et al. 2002); a sketch with < k values IS its set —
# exact count, flagged. θ-intersection (theta-sketch rule): below
# θ = min(θ_A, θ_B) both sketches are complete uniform samples, so
# |A∩B ∩ {h<θ}| · 2^48 / θ estimates |A∩B|.
# ---------------------------------------------------------------------------


def _kmv_combine(hs_list: Column, k: int) -> Column:
    """Merge rule shared by every KMV path: sort, distinct, keep k."""
    return F.slice(F.array_distinct(F.array_sort(hs_list)), 1, k)


def kmv_sketch(
    df: DataFrame,
    key: str,
    group: list[str] | None = None,
    k: int = 64,
    kernel: str = "window",
) -> DataFrame:
    """(group..., hs array<long> ascending, ≤ k) — the k smallest
    distinct hashes of ``key`` per group.

    kernel="window": distinct (group, h) → per-group rank filter —
    the relational form the oracle replays; per-group sort is the
    cost, fine when groups are few or small.

    kernel="combiner": per-PARTITION top-k per group (Arrow pass with
    bounded state k per live group) then one groupBy merge of ≤
    k·n_tasks values — the 10^12-row path: a mega-group's distinct
    hash multiset never assembles anywhere; state is k hashes per
    group per task. Bit-identical to window (pinned by test_sketch).
    """
    group = list(group or [])
    h = _hash48(F.col(key).cast("string"))
    base = df.where(F.col(key).isNotNull()).select(
        *group, h.alias("h")
    )
    if kernel == "window":
        from pyspark.sql import Window

        w = Window.partitionBy(*[F.col(g) for g in group]).orderBy("h")
        return (
            base.distinct()
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k)
            .groupBy(*group)
            .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        )
    if kernel != "combiner":
        raise ValueError(f"unknown kernel {kernel!r}")
    import pandas as pd  # noqa: PLC0415

    gcols = group

    def partial(batches):
        state: dict[tuple, list] = {}
        import heapq

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                gk = tuple(getattr(row, g) for g in gcols)
                hv = int(row.h)
                heap = state.setdefault(gk, [])
                # max-heap of the k smallest (negated); dedup via
                # membership set piggybacked on the heap list
                if len(heap) < k:
                    if -hv not in heap:
                        heapq.heappush(heap, -hv)
                elif hv < -heap[0] and -hv not in heap:
                    heapq.heapreplace(heap, -hv)
        rows = [
            {**dict(zip(gcols, gk)), "hs": sorted(-x for x in heap)}
            for gk, heap in state.items()
        ]
        yield pd.DataFrame(
            rows,
            columns=[*gcols, "hs"],
        )

    fields = df.select(*gcols).schema if gcols else None
    gschema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
        + ", "
        if gcols
        else ""
    )
    partials = base.mapInPandas(partial, gschema + "hs array<long>")
    return partials.groupBy(*gcols).agg(
        _kmv_combine(F.flatten(F.collect_list("hs")), k).alias("hs")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(group..., n_sketch, saturated, est) — exact size(hs) when the
    sketch is the whole set, else (k-1)·2^48 / h_k."""
    n = F.size("hs")
    hk = F.element_at("hs", k)
    est = F.when(
        n < k, n.cast("double")
    ).otherwise(
        F.lit(float((k - 1) << _BITS)) / hk.cast("double")
    )
    return sketch.select(
        *[c for c in sketch.columns if c != "hs"],
        n.cast("long").alias("n_sketch"),
        (n >= k).alias("saturated"),
        est.alias("est"),
    )


def kmv_pair_ops(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 64
) -> DataFrame:
    """Cross of two sketch tables → per pair (union est, intersection
    est, θ) — pure Catalyst array ops over ≤ k-element arrays.

    θ = min over both sketches of (h_k if saturated else 2^48); below
    θ both hash samples are complete, so union/intersection counts of
    the θ-truncated arrays scale by 2^48/θ. When neither sketch is
    saturated the counts are exact (θ = 2^48, scale 1)."""
    full = 1 << _BITS
    a = sk_a.select(
        *[F.col(c).alias(f"a_{c}") for c in sk_a.columns if c != "hs"],
        F.col("hs").alias("hs_a"),
    )
    b = sk_b.select(
        *[F.col(c).alias(f"b_{c}") for c in sk_b.columns if c != "hs"],
        F.col("hs").alias("hs_b"),
    )
    theta_of = lambda hs: F.when(  # noqa: E731
        F.size(hs) >= k, F.element_at(hs, k)
    ).otherwise(F.lit(full).cast("long"))
    pair = a.crossJoin(b).select(
        "*",
        F.least(theta_of(F.col("hs_a")), theta_of(F.col("hs_b"))).alias(
            "theta"
        ),
    )
    trunc = lambda hs: F.filter(hs, lambda x: x < F.col("theta"))  # noqa: E731
    n_inter = F.size(F.array_intersect(trunc(F.col("hs_a")), trunc(F.col("hs_b"))))
    n_union = F.size(F.array_union(trunc(F.col("hs_a")), trunc(F.col("hs_b"))))
    scale = F.lit(float(full)) / F.col("theta").cast("double")
    return pair.select(
        *[c for c in pair.columns if c not in ("hs_a", "hs_b")],
        n_inter.cast("long").alias("n_inter_sample"),
        n_union.cast("long").alias("n_union_sample"),
        (n_inter.cast("double") * scale).alias("est_intersection"),
        (n_union.cast("double") * scale).alias("est_union"),
    )
