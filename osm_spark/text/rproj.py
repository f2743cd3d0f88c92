"""Sparse random projection (Johnson-Lindenstrauss) — exact-integer.

Dimensionality reduction for the embedding pipeline: project
``dim``-d vectors to ``out_dim`` with the Achlioptas sparse scheme —
coefficients c(j, d) ∈ {+1, −1, 0} with P(+1) = P(−1) = 1/6,
P(0) = 2/3 (Achlioptas 2003: this 3-point distribution satisfies the
JL lemma with the same guarantees as gaussian projections, at 1/3 the
multiplies — and ±1 coefficients keep the projection EXACT INT64 over
micro-unit quantized inputs: no float enters, so the projected table
is bit-identical across engines and cluster sizes, SQL-replayable).

Coefficients are a pure function of (j, d) via the repo's md5
convention: md5("rp-{j}-{d}") mod 6 → 0: +1, 1: −1, else 0 — the
oracle re-derives the matrix from the same hashes in SQL; Spark bakes
the tiny out_dim×dim matrix into the plan as literal ± sums (zero
shuffle, whole-stage codegen, no Python).

Distance contract: E[‖Px − Py‖²] = (dim/3)·‖x − y‖² / ... in the
unscaled integer form the expected squared-distance ratio is
out_dim/3·(1/dim)·dim = out_dim/3 per coordinate pair — callers
compare projected distances to projected distances (rank use), or
multiply by 3/out_dim · (scale adjustments) for absolute estimates;
the JL concentration test in test_rproj measures the empirical ratio
band. Use: cheap pre-filter for ANN (project → shortlist → exact
re-rank over original vectors), sketching for clustering, storage
reduction 4× at out_dim = 16.

No reference counterpart; training-data extension surface
(SURVEY §2.9).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.text.kmeans import quantize_vectors


def rproj_coeff(j: int, d: int) -> int:
    """{+1, −1, 0} Achlioptas coefficient — md5('rp-j-d') mod 6."""
    h = int(hashlib.md5(f"rp-{j}-{d}".encode()).hexdigest()[:12], 16) % 6
    return 1 if h == 0 else (-1 if h == 1 else 0)


def rproj_matrix(out_dim: int, dim: int) -> list[list[int]]:
    return [
        [rproj_coeff(j, d) for d in range(dim)] for j in range(out_dim)
    ]


def _proj_col(qcol: Column, row: list[int]) -> Column:
    """One projected coordinate: Σ ±q[d] over the nonzero entries —
    a linear Catalyst sum (≈ dim/3 terms), codegen-friendly."""
    terms = [
        qcol[d] if c > 0 else -qcol[d]
        for d, c in enumerate(row)
        if c != 0
    ]
    if not terms:
        return F.lit(0).cast("long")
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def random_project(
    df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    dim: int | None = None,
) -> DataFrame:
    """(id, p0..p{out_dim-1}) int64 projected coordinates — one
    zero-shuffle Catalyst pass, matrix baked into the plan.

    ``dim`` (the input vector length) should be passed explicitly
    when known — it avoids an extra inference job. When omitted it is
    inferred from the first row (all vectors must share that length,
    the same contract every ANN op in this package assumes)."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("n")).first()
        if first is None or first["n"] is None:
            raise ValueError(
                "random_project: cannot infer vector dim from an "
                "empty input — pass dim= explicitly"
            )
        dim = int(first["n"])
    M = rproj_matrix(out_dim, dim)
    q = quantize_vectors(df, vec_col, scale)
    return df.select(
        F.col(id_col),
        *[
            _proj_col(q, M[j]).cast("long").alias(f"p{j}")
            for j in range(out_dim)
        ],
    )
