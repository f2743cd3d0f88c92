"""Skyline (Pareto-front) query — multi-criteria curation cuts.

"Give me every document no other document beats on ALL axes at once"
— the multi-objective selection a scalar quality score can't express
(any weighted score picks ONE point of the front; the skyline IS the
front). Curation use: token-dense yet short documents, high-quality
yet rare-language pages — the trade-off frontier, not a threshold.

Dominance (after orienting every dimension to MAX): a dominates b iff
a ≥ b on every dimension and a > b on at least one. The skyline is
the set of non-dominated rows; exact duplicates on all dims never
dominate each other, so whole tie-groups survive together —
deterministic, engine-portable (int64 comparisons only).

Distributed shape (the standard two-phase MapReduce skyline,
Börzsönyi-style block-nested-loop kernel per partition):

1. **Local prune** — one Arrow pass computes each partition's own
   skyline. Dominance is transitive, so any row dominated in its
   partition is dominated globally: the prune is LOSSLESS. On
   independently-distributed dimensions a partition of n rows keeps
   O(log^(d-1) n) — the pass typically deletes ~everything.
2. **Global pass** — the union of local skylines (small by 1)
   collapses to one task for the final kernel. Worst case
   (anti-correlated dimensions) the skyline itself is large and no
   algorithm beats that — the operator's honest bound; the local
   kernel's sort-first order makes each partition's work O(n·s) for
   output size s, not O(n²).

No reference counterpart; training-data extension surface
(SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_np(X: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the Pareto front of int64 rows (max
    orientation). Lexicographic-desc presort: a row can only be
    dominated by rows sorted BEFORE it, so one forward scan against
    the kept set suffices (O(n·s))."""
    n = len(X)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort(tuple(X[:, d] for d in range(X.shape[1])))[::-1]
    kept_rows: list[np.ndarray] = []
    keep = np.zeros(n, dtype=bool)
    for idx in order:
        x = X[idx]
        dominated = False
        if kept_rows:
            K = np.asarray(kept_rows)
            dominated = bool(
                ((K >= x).all(axis=1) & (K > x).any(axis=1)).any()
            )
        if not dominated:
            keep[idx] = True
            kept_rows.append(x)
    return keep


def skyline(df: DataFrame, dims: dict[str, str]) -> DataFrame:
    """Pareto front of ``df`` over ``dims`` ({column: "max"|"min"},
    integer-typed columns). Returns the input rows (all columns) that
    no other row dominates."""
    for col, mode in dims.items():
        if mode not in ("max", "min"):
            raise ValueError(f"dims[{col!r}] must be 'max' or 'min'")
    if not dims:
        raise ValueError("need at least one dimension")
    cols = list(dims)
    signs = np.array(
        [1 if dims[c] == "max" else -1 for c in cols], dtype=np.int64
    )
    out_schema = df.schema

    def kernel(batches):
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        X = pdf[cols].to_numpy(dtype=np.int64) * signs[None, :]
        yield pdf[skyline_np(X)]

    local = df.mapInPandas(kernel, out_schema)
    # Global pass: one task over the union of local fronts (small by
    # the lossless local prune; see docstring for the worst case).
    return local.coalesce(1).mapInPandas(kernel, out_schema)
