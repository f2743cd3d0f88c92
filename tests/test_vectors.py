"""Clustered embedding corpus (osm_spark.data.vectors) — the IVF scale
testbed: determinism across parallelism, cluster structure, and the
selectivity+recall claim VERDICT r3 #2 asked the bench to demonstrate.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    from osm_spark.data.vectors import clustered_vectors

    df = clustered_vectors(spark, 5000).persist()
    df.count()
    yield df
    df.unpersist()


def test_deterministic_across_parallelism(spark, corpus):
    """Vectors are a pure function of vec_id: a second generation on a
    different partitioning is bit-identical (the north rule's
    cluster-size invariance, applied to the corpus generator)."""
    from osm_spark.data.vectors import clustered_vectors

    a = {r.vec_id: (r.label, tuple(r.embedding)) for r in corpus.collect()}
    again = clustered_vectors(spark, 5000)
    b = {
        r.vec_id: (r.label, tuple(r.embedding))
        for r in again.repartition(13).collect()
    }
    assert a == b


def test_matches_driver_side_recomputation(corpus):
    """Spot-check rows against a pure-numpy recomputation of the same
    formula (mix → label → center + sigma·noise → renorm)."""
    from osm_spark.data.vectors import _gaussians, _mix, cluster_centers

    sample = corpus.where(F.col("vec_id") % 500 == 7).collect()
    assert sample
    centers = cluster_centers(256, 64)
    for r in sample:
        i = np.asarray([r.vec_id], dtype=np.uint64)
        lab = int(_mix(i * np.uint64(0x9E3779B1))[0] % np.uint64(256))
        assert lab == r.label
        v = centers[lab] + 0.08 * _gaussians(i, 64, 0xBADC0DE)[0]
        v = v / np.linalg.norm(v)
        np.testing.assert_array_equal(
            v.astype(np.float32), np.asarray(r.embedding, dtype=np.float32)
        )


def test_cluster_separation(corpus):
    """Within-cluster cosine ≈ 0.7, across ≈ 0 — the clustered regime
    (real web-embedding shape) where IVF selectivity is meaningful."""
    pdf = corpus.limit(1500).toPandas()
    X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    lab = pdf["label"].to_numpy()
    sims = X @ X.T
    same = lab[:, None] == lab[None, :]
    np.fill_diagonal(same, False)
    off = ~np.eye(len(lab), dtype=bool)
    assert sims[same].mean() > 0.55
    assert abs(sims[off & ~same].mean()) < 0.1


def test_ivf_selective_and_high_recall(spark, corpus):
    """The VERDICT r3 #2 'done' shape: auto n_lists ≈ √corpus with a
    small n_probe gives candidate ratio ≤ 0.15 at recall@5 ≥ 0.9 on the
    clustered corpus (measured 0.996 @ 0.11; thresholds leave margin).
    """
    from osm_spark.text.ann import (
        auto_n_lists, cosine_topk, ivf_topk, train_ivf_centroids,
    )

    assert auto_n_lists(5000) == 71
    assert auto_n_lists(10**12) == 4096  # clamp
    assert auto_n_lists(10) == 16  # clamp
    q = corpus.where(F.col("vec_id") % 100 == 0)
    cent = train_ivf_centroids(corpus, None, 5, sample_mod=2)
    assert cent.shape[0] == 71
    approx = ivf_topk(corpus, q, k=5, n_probe=8, centroids=cent).persist()
    exact = cosine_topk(corpus, q, k=5).select("query_id", "neighbor_id").persist()
    ne = exact.count()
    hit = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"], "left_semi",
    ).count()
    cand = (
        approx.select("query_id", "n_candidates").distinct()
        .agg(F.avg("n_candidates")).first()[0]
    )
    assert hit / ne >= 0.9
    assert float(cand) / 5000 <= 0.15
    approx.unpersist()
    exact.unpersist()
