"""Random projection: matrix determinism, exact-integer twin, JL
distance concentration, shortlist-recall usefulness."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from osm_spark.data.vectors import clustered_vectors
from osm_spark.text.pq import quantize_np
from osm_spark.text.rproj import random_project, rproj_matrix


def test_matrix_distribution_and_determinism():
    M = np.asarray(rproj_matrix(16, 64))
    assert set(np.unique(M)) <= {-1, 0, 1}
    frac_nonzero = (M != 0).mean()
    assert 0.2 < frac_nonzero < 0.47  # E = 1/3
    assert rproj_matrix(16, 64) == rproj_matrix(16, 64)


def test_projection_matches_numpy_twin(spark):
    emb = clustered_vectors(spark, 300, dim=64, n_clusters=8)
    out = random_project(emb, out_dim=16)
    got = {
        r["vec_id"]: [r[f"p{j}"] for j in range(16)]
        for r in out.collect()
    }
    pdf = emb.select("vec_id", "embedding").toPandas()
    Q = quantize_np(np.asarray(pdf["embedding"].tolist()))
    M = np.asarray(rproj_matrix(16, 64), dtype=np.int64)
    want = Q @ M.T
    for i, vid in enumerate(pdf["vec_id"]):
        assert got[int(vid)] == [int(v) for v in want[i]]


def test_jl_distance_concentration(spark):
    """Projected squared distances track original ones: the ratio
    ‖Px−Py‖²/‖x−y‖² concentrates around out_dim/3 (each output coord
    contributes E[c²] = 1/3 per input coord)."""
    emb = clustered_vectors(spark, 200, dim=64, n_clusters=8)
    pdf = emb.select("vec_id", "embedding").toPandas()
    Q = quantize_np(np.asarray(pdf["embedding"].tolist()))
    M = np.asarray(rproj_matrix(24, 64), dtype=np.int64)
    P = Q @ M.T
    rng = np.random.default_rng(0)
    ratios = []
    for _ in range(300):
        i, j = rng.integers(0, len(Q), 2)
        if i == j:
            continue
        d0 = float(((Q[i] - Q[j]) ** 2).sum())
        dp = float(((P[i] - P[j]) ** 2).sum())
        ratios.append(dp / d0)
    r = np.asarray(ratios) / (24 / 3)
    assert 0.9 < np.median(r) < 1.1
    assert (np.abs(r - 1) < 0.6).mean() > 0.9


def test_shortlist_recall(spark):
    """Project → shortlist top-30 by projected distance → exact
    re-rank: recall@5 high on the clustered corpus (the pre-filter
    use-case)."""
    emb = clustered_vectors(spark, 400, dim=64, n_clusters=10)
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    Q = quantize_np(np.asarray(pdf["embedding"].tolist()))
    M = np.asarray(rproj_matrix(16, 64), dtype=np.int64)
    P = Q @ M.T
    hits = tot = 0
    for qi in range(0, 400, 37):
        d_exact = ((Q - Q[qi]) ** 2).sum(1)
        d_proj = ((P - P[qi]) ** 2).sum(1)
        d_exact[qi] = d_proj[qi] = 1 << 62
        exact5 = set(ids[np.argsort(d_exact, kind="stable")[:5]])
        short = np.argsort(d_proj, kind="stable")[:30]
        rerank = short[np.argsort(d_exact[short], kind="stable")[:5]]
        hits += len(exact5 & set(ids[rerank]))
        tot += 5
    assert hits / tot >= 0.8
