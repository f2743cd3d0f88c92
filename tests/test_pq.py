"""IVF-PQ: trainer twin identity, encode kernel identity, full-probe
refine == exact brute, and the compression invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_spark.data.vectors import clustered_vectors
from osm_spark.text.kmeans import kmeans_fit
from osm_spark.text.pq import (
    exact_int_topk,
    pq_adc_topk,
    pq_encode,
    pq_fit,
    train_pq_np,
)

N, DIM, M_SUB, KSUB, N_LISTS = 600, 64, 4, 16, 8


@pytest.fixture(scope="module")
def emb(spark):
    df = clustered_vectors(spark, N, dim=DIM, n_clusters=12).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def model(emb):
    return pq_fit(emb, m_sub=M_SUB, ksub=KSUB, n_lists=N_LISTS, n_iters=2)


def test_np_trainer_is_kmeans_fit_per_subspace(emb):
    """The np trainer must be bit-identical to the ORACLE-PINNED
    distributed kmeans_fit (q134 pins kmeans_fit vs a full SQL replay;
    this pin chains that verification to the PQ codebooks)."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    books = train_pq_np(
        pdf["vec_id"].to_numpy(np.int64),
        np.asarray(pdf["embedding"].tolist(), np.float64),
        M_SUB,
        KSUB,
        n_iters=2,
    )
    dsub = DIM // M_SUB
    for s in range(M_SUB):
        sliced = emb.select(
            "vec_id",
            F.slice("embedding", s * dsub + 1, dsub).alias("embedding"),
        )
        cents = kmeans_fit(sliced, k=KSUB, n_iters=2)
        assert [[int(v) for v in c] for c in books[s]] == cents


def test_trainer_order_invariant(emb):
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    X = np.asarray(pdf["embedding"].tolist(), np.float64)
    a = train_pq_np(ids, X, M_SUB, KSUB, 2)
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(ids))
    b = train_pq_np(ids[perm], X[perm], M_SUB, KSUB, 2)
    assert (a == b).all()


def test_encode_kernels_bit_identical(emb, model):
    cat = pq_encode(emb, model, kernel="catalyst")
    gem = pq_encode(emb, model, kernel="numpy")
    cols = ["neighbor_id", "list_id", "codes"]
    a = {r["neighbor_id"]: r for r in cat.select(cols).collect()}
    b = {r["neighbor_id"]: r for r in gem.select(cols).collect()}
    assert len(a) == N and a == b


def test_codes_compress(emb, model):
    row = pq_encode(emb, model).first()
    assert len(row["codes"]) == M_SUB
    assert all(0 <= c < KSUB for c in row["codes"])
    assert 0 <= row["list_id"] < N_LISTS


def test_full_probe_refine_equals_exact(emb, model):
    """n_probe = n_lists (every list probed) + refine = corpus ⇒ the
    PQ pipeline must reproduce the exact integer top-k EXACTLY — the
    approximation comes only from probe pruning and the ADC head cut,
    both disabled here."""
    queries = emb.where(F.col("vec_id") % 97 == 0)
    got = pq_adc_topk(
        emb, queries, model, k=5, n_probe=N_LISTS, refine=N
    ).select("query_id", "neighbor_id", "rank")
    want = exact_int_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_query_kernels_bit_identical(emb, model):
    """Arrow query side (probes + LUT) must reproduce the catalyst
    expressions exactly — int64 GEMM, same lowest-id probe ties."""
    queries = emb.where(F.col("vec_id") % 53 == 0)
    cols = ["query_id", "neighbor_id", "adc_d2", "rank"]
    cat = pq_adc_topk(
        emb, queries, model, k=5, n_probe=3, query_kernel="catalyst"
    )
    gem = pq_adc_topk(
        emb, queries, model, k=5, n_probe=3, query_kernel="numpy"
    )
    assert sorted(map(tuple, cat.select(cols).collect())) == sorted(
        map(tuple, gem.select(cols).collect())
    )


@pytest.fixture(scope="module")
def rmodel(emb):
    return pq_fit(
        emb, m_sub=M_SUB, ksub=KSUB, n_lists=N_LISTS, n_iters=2,
        by_residual=True,
    )


def test_residual_encode_kernels_bit_identical(emb, rmodel):
    """Residual mode (FAISS by_residual=true): catalyst and Arrow-GEMM
    encodes agree bit-for-bit, and codes quantize the residual — NOT
    the raw vector — so the two models' codes differ."""
    cat = pq_encode(emb, rmodel, kernel="catalyst")
    gem = pq_encode(emb, rmodel, kernel="numpy")
    cols = ["neighbor_id", "list_id", "codes"]
    a = {r["neighbor_id"]: r for r in cat.select(cols).collect()}
    b = {r["neighbor_id"]: r for r in gem.select(cols).collect()}
    assert len(a) == N and a == b
    raw = pq_fit(emb, m_sub=M_SUB, ksub=KSUB, n_lists=N_LISTS, n_iters=2)
    c = {
        r["neighbor_id"]: r
        for r in pq_encode(emb, raw).select(cols).collect()
    }
    # same coarse assignment (coarse training is residual-independent)
    assert all(a[k]["list_id"] == c[k]["list_id"] for k in a)
    assert any(list(a[k]["codes"]) != list(c[k]["codes"]) for k in a)


def test_residual_query_kernels_bit_identical(emb, rmodel):
    queries = emb.where(F.col("vec_id") % 53 == 0)
    cols = ["query_id", "neighbor_id", "adc_d2", "rank"]
    cat = pq_adc_topk(
        emb, queries, rmodel, k=5, n_probe=3, query_kernel="catalyst"
    )
    gem = pq_adc_topk(
        emb, queries, rmodel, k=5, n_probe=3, query_kernel="numpy"
    )
    assert sorted(map(tuple, cat.select(cols).collect())) == sorted(
        map(tuple, gem.select(cols).collect())
    )


def test_residual_full_probe_refine_equals_exact(emb, rmodel):
    """The residual pipeline with probe pruning and head cut disabled
    must also collapse to the exact integer top-k."""
    queries = emb.where(F.col("vec_id") % 97 == 0)
    got = pq_adc_topk(
        emb, queries, rmodel, k=5, n_probe=N_LISTS, refine=N
    ).select("query_id", "neighbor_id", "rank")
    want = exact_int_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_residual_adc_beats_raw_adc(emb, model, rmodel):
    """The point of residual encoding: at the SAME code budget the raw
    ADC ranking (refine=0) recovers more of the exact top-k, because
    codes span the within-cluster spread instead of the whole space."""
    queries = emb.where(F.col("vec_id") % 29 == 0)
    exact = exact_int_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )

    def recall(m):
        approx = pq_adc_topk(emb, queries, m, k=5, n_probe=3)
        return approx.join(
            exact, ["query_id", "neighbor_id"], "left_semi"
        ).count()

    assert recall(rmodel) > recall(model)


def test_adc_recall_on_clustered_corpus(emb, model):
    """Selective point: ADC+refine recall@5 should be high on a
    clustered corpus (the regime PQ exists for)."""
    queries = emb.where(F.col("vec_id") % 29 == 0)
    approx = pq_adc_topk(emb, queries, model, k=5, n_probe=3, refine=40)
    exact = exact_int_topk(emb, queries, k=5)
    hits = approx.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).count()
    n_q = queries.count()
    assert hits / (5.0 * n_q) >= 0.8
    # selectivity: candidates ≈ n_probe/n_lists of the corpus
    max_cand = approx.agg(F.max("n_candidates")).first()[0]
    assert max_cand <= N * (3 / N_LISTS) * 2.5
