"""text/semdedup.py — cluster-scoped embedding dedup (SemDeDup shape).

The q95 oracle checks the full pass against DuckDB on the uniform
testdata corpus; these tests run the CLUSTERED corpus (the regime the
operator exists for) and differentially check the pair stage against
a numpy reimplementation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_spark.data.vectors import clustered_vectors
from osm_spark.text.ann import train_ivf_centroids
from osm_spark.text.semdedup import (
    assign_clusters,
    semantic_dedup,
    semantic_dup_pairs,
)

N, DIM, K = 240, 32, 8


@pytest.fixture(scope="module")
def corpus(spark):
    return clustered_vectors(
        spark, N, dim=DIM, n_clusters=K, sigma=0.05
    ).persist()


def test_pairs_match_numpy_within_cluster(spark, corpus):
    cents = train_ivf_centroids(corpus, n_lists=K)
    assigned = assign_clusters(corpus, cents)
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(assigned, threshold=0.8).collect()
    }
    pdf = corpus.orderBy("vec_id").toPandas()
    X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    lists = Xn @ cents.T
    assign = np.argmax(lists, axis=1)
    ids = pdf["vec_id"].to_numpy()
    S = Xn @ Xn.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(N)
        for j in range(i + 1, N)
        if assign[i] == assign[j] and S[i, j] >= 0.8
    }
    assert got == want and len(want) > 100  # clusters genuinely collapse


def test_dedup_collapses_clusters(spark, corpus):
    out = semantic_dedup(corpus, threshold=0.8, n_lists=K).persist()
    assert out.count() == N
    # keeper is the component min and unique per component
    keepers = out.where("keep")
    assert keepers.where(F.col("vec_id") != F.col("component")).count() == 0
    assert keepers.count() == out.select("component").distinct().count()
    # sizes partition the corpus
    assert (
        out.select("component", "cluster_size").distinct()
        .agg(F.sum("cluster_size")).collect()[0][0] == N
    )
    # tight clusters at sigma=0.05 collapse to ~one keeper per true
    # cluster — far fewer than N survivors
    assert keepers.count() <= 3 * K
    out.unpersist()


def test_gemm_kernel_matches_catalyst(spark, corpus):
    cents = train_ivf_centroids(corpus, n_lists=K)
    assigned = assign_clusters(corpus, cents)
    cat = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(assigned, 0.8, kernel="catalyst").collect()
    }
    gem = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(assigned, 0.8, kernel="gemm").collect()
    }
    assert cat == gem and len(cat) > 100
    # tiling must not change the pair set (exercise multi-tile blocks)
    tiled = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            assigned, 0.8, kernel="gemm", tile=16
        ).collect()
    }
    assert tiled == gem


def test_quantizer_shared_with_ivf(spark, corpus):
    cents = train_ivf_centroids(corpus, n_lists=K)
    a = semantic_dedup(corpus, threshold=0.8, centroids=cents)
    b = semantic_dedup(corpus, threshold=0.8, n_lists=K)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
