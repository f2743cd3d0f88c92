"""Distributed Lloyd k-means over embedding columns — exact-integer.

Full-corpus clustering for training-data curation (topic mixing,
cluster-balanced sampling, coverage audits): unlike the IVF coarse
quantizer (ann.train_ivf_centroids — trained on a deterministic sample
COLLECTED TO THE DRIVER), every row participates in every Lloyd round
here, so the fitted centroids reflect the true corpus distribution at
any scale and the per-cluster summary is an exact census.

Scale shape, per round:

1. **Assign** — a pure-Catalyst per-row expression: k squared-distance
   folds (``aggregate(zip_with(qvec, centroid_lit, ...))``) and an
   ``array_min`` argmin over (d2, cid) structs. Zero shuffle, no
   Python; the k×dim centroid literals ride the plan.
2. **Update** — ONE map-side-combinable ``groupBy(cid)`` with dim+1
   int64 sums (count + per-dim coordinate sums). Partial aggregation
   reduces each task's output to ≤ k rows, so the shuffle is k×tasks
   rows regardless of corpus size; the k×(dim+1) result is collected
   to the driver (tiny) and fed back as literals — the same
   driver-coordinated round loop pagerank / BPE / kNN-frontier use.

Exactness contract (house convention — the DuckDB oracle re-runs the
whole fit from scratch in SQL and must agree bit-for-bit):

- Embeddings are quantized ONCE to int64 micro-units
  ``round(x * 10^6)`` (half away from zero — Spark's HALF_UP and
  DuckDB's round agree, including negatives).
- Distances and per-dim sums are int64 — order-free, so partitioning
  and combiner order cannot perturb a single bit.
- The centroid update is truncating integer division
  ``sign(s) * (|s| div n)`` (spelled out on both engines because
  Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors —
  they differ on negative sums).
- Seeds are the k rows with lexicographically smallest
  ``md5('km-' || id)`` (id tiebreak), cid in that md5 order — the same
  engine-portable seeding rule as the IVF quantizer.
- An emptied cluster keeps its previous centroid (same rule as
  ann.train_ivf_centroids_np).

int64 bounds: with ``scale = 10^6`` and |x| ≤ ~10, a per-dim update
sum is ≤ n·10^7 → safe past n = 9·10^11 rows per cluster; a squared
distance is ≤ dim·(2·10^7)² ≈ 2.6·10^16·(dim/64); the per-cluster
``inertia`` sum therefore overflows int64 when n·d2_typical exceeds
2^63 — pass ``inertia_shift`` to accumulate ``d2 >> shift`` instead
(still order-free exact on the shifted values) when a cluster can
exceed ~10^5 × d2_typical ≈ planet scale.

No reference counterpart (pmezard/osm has no clustering); this is the
training-data extension surface (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**6


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", scale: int = DEFAULT_SCALE
) -> Column:
    """int64 micro-unit quantization of a float array column.

    ``round`` is half-away-from-zero on both engines; the result is the
    ONLY place float enters the pipeline — everything downstream is
    exact integer arithmetic.
    """
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x * F.lit(float(scale))).cast("long"),
    )


def _d2_expr(qvec: Column, centroid: list[int]) -> Column:
    """Exact int64 squared distance between ``qvec`` and a literal."""
    lit = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(qvec, lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_expr(qvec: Column, centroids: list[list[int]]) -> Column:
    """struct(d2, cid) of the nearest centroid — ties to the lowest
    cid (array_min orders structs lexicographically by field)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _d2_expr(qvec, c).alias("d2"),
                    F.lit(j).cast("int").alias("cid"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )


def _trunc_div(s: int, n: int) -> int:
    """Truncating (toward-zero) integer division — python // floors."""
    return -((-s) // n) if s < 0 else s // n


def kmeans_seeds(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> list[list[int]]:
    """k deterministic seed centroids: smallest md5('km-'||id) rows,
    cid assigned in that order. One tiny top-k job (sort is LIMIT k —
    a TakeOrdered, not a global sort)."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            quantize_vectors(embeddings, vec_col, scale).alias("q"),
        )
        .orderBy(
            F.md5(F.concat(F.lit("km-"), F.col("_id").cast("string"))),
            F.col("_id"),
        )
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return [[int(v) for v in r["q"]] for r in rows]


def _round_sums_numpy(base: DataFrame, cents: list[list[int]]):
    """One Lloyd round's (cid → n, per-dim sums) via an Arrow int64
    GEMM: d2 = |q|² − 2·q·Cᵀ + |c|² with EVERY operand int64, so the
    argmin (np.argmin ties to the lowest cid, same as array_min on
    (d2, cid) structs) and the emitted sums are bit-identical to the
    Catalyst kernel — the semdedup dual-kernel pattern, except here
    integer arithmetic makes the equality exact, not approximate.
    Per batch the kernel emits ≤ k pre-aggregated rows (a batch-level
    combiner); int64 bound: |q·c| ≤ dim·(|x|·scale)² — safe to
    |x| ≈ 470 at scale 10⁶."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.int64)
    dim = C.shape[1]
    c2 = (C * C).sum(axis=1)

    def fold(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.asarray(pdf["q"].tolist(), dtype=np.int64)
            G = Q @ C.T
            D = (Q * Q).sum(axis=1)[:, None] - 2 * G + c2[None, :]
            cid = np.argmin(D, axis=1)
            out = {"cid": [], "n": []}
            sums_cols = {f"s{d}": [] for d in range(dim)}
            for j in np.unique(cid):
                sel = Q[cid == j]
                out["cid"].append(int(j))
                out["n"].append(int(sel.shape[0]))
                s = sel.sum(axis=0, dtype=np.int64)
                for d in range(dim):
                    sums_cols[f"s{d}"].append(int(s[d]))
            yield pd.DataFrame({**out, **sums_cols})

    schema = "cid int, n long, " + ", ".join(
        f"s{d} long" for d in range(dim)
    )
    return (
        base.mapInPandas(fold, schema)
        .groupBy("cid")
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"s{d}").alias(f"s{d}") for d in range(dim)],
        )
        .collect()
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    kernel: str = "catalyst",
) -> list[list[int]]:
    """Full-corpus Lloyd fit → k int64 centroids (micro-units).

    Runs ``n_iters`` rounds; each round is one Spark job whose shuffle
    is bounded by k×tasks rows (see module docstring). The returned
    centroids are a pure function of the row SET — partitioning,
    executor count, and task order cannot change a bit.

    ``kernel="catalyst"`` (default): pure-JVM assignment folds — the
    oracle-pinned path. ``kernel="numpy"``: Arrow int64 GEMM with a
    batch-level combiner — the throughput path for wide dim·k, and
    BIT-IDENTICAL to catalyst (integer arithmetic throughout; pinned
    by test_kmeans)."""
    if kernel not in ("catalyst", "numpy"):
        raise ValueError(f"unknown kernel {kernel!r}")
    cents = kmeans_seeds(embeddings, k, id_col, vec_col, scale)
    dim = len(cents[0])
    base = embeddings.select(
        quantize_vectors(embeddings, vec_col, scale).alias("q")
    )
    for _ in range(n_iters):
        if kernel == "numpy":
            sums = _round_sums_numpy(base, cents)
        else:
            assigned = base.select(
                F.col("q"),
                assign_expr(F.col("q"), cents)["cid"].alias("cid"),
            )
            sums = (
                assigned.groupBy("cid")
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.col("q")[d]).alias(f"s{d}")
                        for d in range(dim)
                    ],
                )
                .collect()
            )
        nxt = [list(c) for c in cents]  # emptied cluster keeps previous
        for r in sums:
            n = int(r["n"])
            nxt[int(r["cid"])] = [
                _trunc_div(int(r[f"s{d}"]), n) for d in range(dim)
            ]
        cents = nxt
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(id, cluster_id, d2) — one zero-shuffle Catalyst pass."""
    q = quantize_vectors(embeddings, vec_col, scale)
    best = assign_expr(q, centroids)
    return embeddings.select(
        F.col(id_col),
        best["cid"].alias("cluster_id"),
        best["d2"].alias("d2"),
    )


def kmeans_summary(
    embeddings: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
    inertia_shift: int = 0,
) -> DataFrame:
    """Per-cluster census against fitted centroids: (cluster_id,
    n_points, inertia, centroid_digest).

    ``inertia`` = Σ (d2 >> inertia_shift) — exact int64, order-free;
    raise the shift when n·d2_typical can exceed 2^63 (module
    docstring bound). ``centroid_digest`` = md5 of the comma-joined
    centroid ints, so the oracle checks the fitted floats-free model
    itself, not just the census.
    """
    assigned = kmeans_assign(embeddings, centroids, id_col, vec_col, scale)
    d2 = F.col("d2")
    if inertia_shift:
        d2 = F.shiftright(d2, inertia_shift)
    digests = {
        j: ",".join(str(int(v)) for v in c) for j, c in enumerate(centroids)
    }
    digest_col = F.element_at(
        F.create_map(
            *[
                x
                for j in range(len(centroids))
                for x in (F.lit(j), F.lit(digests[j]))
            ]
        ),
        F.col("cluster_id"),
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count("*").alias("n_points"), F.sum(d2).alias("inertia"))
        .select(
            "cluster_id",
            "n_points",
            "inertia",
            F.md5(digest_col).alias("centroid_digest"),
        )
    )
