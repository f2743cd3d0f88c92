"""Discrete Fréchet distance join — ORDER-AWARE trajectory similarity.

Hausdorff (hausdorff.py) asks "do these two point sets cover the same
ground"; Fréchet asks "do these two TOURS walk the same route the same
way" — the dog-leash distance: the minimum leash length that lets two
walkers traverse their polylines monotonically front-to-back. Two
travelers visiting the same places in opposite order are Hausdorff-
identical and Fréchet-far; for route matching (crawl frontier replay,
mobility mining) order is the signal.

Discrete Fréchet (Eiter-Mannila 1994) over sequences A[1..n], B[1..m]:

    c(i,j) = max( d(A_i, B_j),
                  min( c(i-1,j), c(i-1,j-1), c(i,j-1) ) ),   DF = c(n,m)

Distributed shape — prune-then-solve, the established candidate
pattern (LSH→Jaccard, ADC→refine):

1. **Prune**: DF ≥ Hausdorff always (the coupled max dominates every
   per-point min), so ``hausdorff_join`` at the same radius is a
   LOSSLESS prefilter: any pair it drops cannot satisfy DF ≤ d. The
   expensive O(n·m) DP runs only on pairs whose footprints already
   match — at web scale the radius join's close-pair volume, not the
   pair cross product, bounds the cost (hausdorff.py's contract).
2. **Solve**: per candidate pair, one Arrow batch computes the DP in
   ANTI-DIAGONAL order — each diagonal is one vectorized
   max/min over the previous two diagonals (length ≤ min(n,m)), so
   the kernel is n+m numpy ops, not n·m python steps. The
   parallelism unit is the candidate pair (same sequential-per-group
   argument as relation assembly): 10^6 candidate pairs spread over
   the cluster, each pair's DP local and exact.

Exactness: coordinates are int64 micro-degrees, d² and the DP are
pure int64 max/min (INF sentinel 2^62 — unreachable: the max planar
d² is (720·10^6)² < 2^60), so the output is bit-identical across
engines and cluster sizes. The q151 oracle replays the SAME
anti-diagonal recurrence as a DuckDB recursive CTE over list states —
an independent implementation of the identical arithmetic.

No reference counterpart; training-data / trajectory extension
surface (SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.hausdorff import hausdorff_join

_INF = 1 << 62


def frechet_dp_np(A: np.ndarray, B: np.ndarray) -> int:
    """Exact discrete Fréchet d² between int64 point arrays (n,2),
    (m,2) — anti-diagonal vectorized.

    Memory is O(n + m): distances are computed PER DIAGONAL (a gather
    of the two point slices, never the n×m matrix), so a pair of
    10^5-point tours costs ~MBs, not the 80 GB a materialized matrix
    would — the bound that keeps the per-pair kernel safe inside an
    Arrow task at any tour length. Time stays the intrinsic O(n·m),
    spent in n+m vector ops."""
    n, m = len(A), len(B)
    ax, ay = A[:, 0], A[:, 1]
    bx, by = B[:, 0], B[:, 1]

    def diag_d2(iv: np.ndarray, jv: np.ndarray) -> np.ndarray:
        dx = ax[iv - 1] - bx[jv - 1]
        dy = ay[iv - 1] - by[jv - 1]
        return dx * dx + dy * dy

    # cur[i] = c(i, g-i) on diagonal g (1-based i)
    prev = np.full(n + 2, _INF, dtype=np.int64)
    cur = np.full(n + 2, _INF, dtype=np.int64)
    one = np.array([1])
    cur[1] = int(diag_d2(one, one)[0])  # g = 2: cell (1, 1)
    i_all = np.arange(1, n + 1)
    for g in range(2, n + m):
        nxt = np.full(n + 2, _INF, dtype=np.int64)
        j = (g + 1) - i_all
        valid = (j >= 1) & (j <= m)
        iv = i_all[valid]
        jv = j[valid]
        up = cur[iv - 1]      # c(i-1, j)   on diag g
        left = cur[iv]        # c(i,   j-1) on diag g
        diag = prev[iv - 1]   # c(i-1, j-1) on diag g-1
        best = np.minimum(np.minimum(up, left), diag)
        nxt[iv] = np.maximum(diag_d2(iv, jv), best)
        prev, cur = cur, nxt
    return int(cur[n])


def frechet_join(
    points: DataFrame,
    max_d: float,
    traj_col: str = "traj_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    order_cols: tuple = ("warc_ts", "url"),
    broadcast_data: bool = True,
    level: int | None = None,
) -> DataFrame:
    """(traj_a, traj_b, hausdorff_d2, frechet_d2) for every unordered
    pair with discrete Fréchet ≤ max_d degrees (traj_a < traj_b).

    Sequence order within a trajectory is ``order_cols`` (must be a
    total order per trajectory — the q137 segment convention). Points
    are NOT deduplicated on the DP path (revisits are part of the
    tour); the Hausdorff prune dedups internally, which cannot change
    its own threshold test."""
    d_u = int(round(max_d * 1e6))
    thr = d_u * d_u
    cands = hausdorff_join(
        points,
        max_d,
        traj_col=traj_col,
        lon_col=lon_col,
        lat_col=lat_col,
        broadcast_data=broadcast_data,
        level=level,
    )
    seqs = (
        points.select(
            F.col(traj_col).alias("tid"),
            F.struct(
                *[F.col(c) for c in order_cols],
                F.round(F.col(lon_col) * 1e6).cast("long").alias("x_u"),
                F.round(F.col(lat_col) * 1e6).cast("long").alias("y_u"),
            ).alias("p"),
        )
        .groupBy("tid")
        .agg(F.sort_array(F.collect_list("p")).alias("pts"))
        .select(
            "tid",
            F.transform("pts", lambda s: s["x_u"]).alias("xs"),
            F.transform("pts", lambda s: s["y_u"]).alias("ys"),
        )
    )
    joined = (
        cands.join(
            seqs.select(
                F.col("tid").alias("traj_a"),
                F.col("xs").alias("ax"),
                F.col("ys").alias("ay"),
            ),
            "traj_a",
        )
        .join(
            seqs.select(
                F.col("tid").alias("traj_b"),
                F.col("xs").alias("bx"),
                F.col("ys").alias("by"),
            ),
            "traj_b",
        )
    )
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.select("traj_a", "traj_b").schema.fields
    )
    out_schema = key_fields + ", hausdorff_d2 long, frechet_d2 long"

    def solve(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                A = np.stack(
                    [
                        np.asarray(r.ax, dtype=np.int64),
                        np.asarray(r.ay, dtype=np.int64),
                    ],
                    axis=1,
                )
                B = np.stack(
                    [
                        np.asarray(r.bx, dtype=np.int64),
                        np.asarray(r.by, dtype=np.int64),
                    ],
                    axis=1,
                )
                fd2 = frechet_dp_np(A, B)
                if fd2 <= thr:
                    rows.append(
                        (r.traj_a, r.traj_b, int(r.hausdorff_d2), fd2)
                    )
            yield pd.DataFrame(
                rows,
                columns=["traj_a", "traj_b", "hausdorff_d2", "frechet_d2"],
            )

    return joined.mapInPandas(solve, out_schema)
