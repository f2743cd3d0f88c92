"""Deterministic CLUSTERED embedding corpus — the IVF scale testbed.

The testdata ``embeddings`` table is (measured) uniform on the 64-dim
sphere: within-label and across-label cosine similarity both ≈ 0, and
exact top-5 neighbors share the query's label only 9% of the time. On
a uniform sphere NO partitioning ANN (IVF, LSH, graph-entry pruning)
can be simultaneously selective and high-recall — concentration of
measure makes every direction equidistant, so the "nearest" lists
carry no information about the nearest vectors. That corpus is the
right ORACLE input (q40/q41/q45 pin determinism and exact re-rank
arithmetic) but the wrong SCALE input: benchmarking IVF selectivity on
it measures the data, not the index (VERDICT r3 #2).

Real embedding corpora (the 100-TB use case: near-dup mining over web
pages) are heavily clustered — that is why IVF works in practice. This
module generates a deterministic clustered corpus DISTRIBUTED, as a
pure function of ``vec_id`` (splitmix64 finalizer — full-avalanche
mixing, NOT the lattice-prone LCG that broke r1's hyperplanes), so any
two runs, partitionings, or cluster sizes produce bit-identical
vectors:

    cluster(i) = mix(i · SALT_C)  mod n_clusters
    center[c]  = unit vector from mix-derived gaussians (Box-Muller)
    vec(i)     = center[cluster(i)] + sigma · gaussian noise(i)

With sigma=0.08 and dim=64, within-cluster cosine ≈ 0.7 and
across-cluster ≈ 0, so exact top-k is dominated by true cluster
members — the regime where IVF's ≈ n_probe/n_lists candidate fraction
is an honest selectivity claim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (vectorized, exact)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _uniform01(z: np.ndarray) -> np.ndarray:
    """uint64 → (0,1) doubles (never exactly 0: Box-Muller takes log)."""
    return (_mix(z).astype(np.float64) + 1.0) / 18446744073709551616.0


def _gaussians(base: np.ndarray, n_cols: int, salt: int) -> np.ndarray:
    """(len(base), n_cols) standard gaussians, pure function of
    (base id, column, salt) via Box-Muller on two mixed uniforms."""
    ids = base[:, None] * np.uint64(2654435761) + np.arange(
        n_cols, dtype=np.uint64
    )[None, :]
    u1 = _uniform01(ids ^ np.uint64(salt))
    u2 = _uniform01(ids ^ np.uint64(salt + 1))
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def cluster_centers(n_clusters: int, dim: int) -> np.ndarray:
    """Unit-norm deterministic cluster centers (n_clusters, dim)."""
    g = _gaussians(np.arange(n_clusters, dtype=np.uint64), dim, 0xC0FFEE)
    return g / np.linalg.norm(g, axis=1, keepdims=True)


def clustered_vectors(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    n_clusters: int = 256,
    sigma: float = 0.08,
) -> DataFrame:
    """(vec_id long, embedding array<float>, label int) — clustered,
    deterministic, generated distributed (one Arrow pass over
    ``spark.range``; centers ride the task closure, n_clusters·dim·8 B).
    ``label`` is the TRUE cluster id (ground truth for recall studies).
    """
    centers = cluster_centers(n_clusters, dim)
    nc = n_clusters
    sg = float(sigma)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            lab = (_mix(ids * np.uint64(0x9E3779B1)) % np.uint64(nc)).astype(
                np.int64
            )
            noise = _gaussians(ids, dim, 0xBADC0DE)
            v = centers[lab] + sg * noise
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids.astype(np.int64),
                    "embedding": list(v.astype(np.float32)),
                    "label": lab.astype(np.int32),
                }
            )

    return spark.range(n_vecs).mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    )
