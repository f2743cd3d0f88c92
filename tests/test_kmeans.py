"""Full-corpus integer Lloyd k-means (osm_spark/text/kmeans.py).

Differential against an independent pure-python twin, plus the
determinism / degenerate-path pins the house conventions require.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_spark.text.kmeans import (
    kmeans_assign,
    kmeans_fit,
    kmeans_seeds,
    kmeans_summary,
)


def _twin_quantize(vec, scale=10**6):
    out = []
    for x in vec:
        v = float(x) * scale
        r = int(v + 0.5) if v >= 0 else -int(-v + 0.5)  # half away from 0
        out.append(r)
    return out


def _twin_seeds(rows, k):
    order = sorted(
        rows,
        key=lambda r: (hashlib.md5(f"km-{r[0]}".encode()).hexdigest(), r[0]),
    )
    return [list(q) for _, q in order[:k]]


def _twin_fit(rows, k, n_iters):
    """rows: [(id, qvec_int)] — same seeding/update/tie rules, written
    independently (dict-of-sums accumulation, not Spark)."""
    cents = _twin_seeds(rows, k)
    dim = len(cents[0])
    for _ in range(n_iters):
        sums = {}
        for _id, q in rows:
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(q, c)), j)
                for j, c in enumerate(cents)
            )[1]
            n, s = sums.setdefault(best, [0, [0] * dim])
            sums[best][0] = n + 1
            for d in range(dim):
                s[d] += q[d]
        nxt = [list(c) for c in cents]
        for j, (n, s) in sums.items():
            nxt[j] = [
                -((-v) // n) if v < 0 else v // n for v in s
            ]
        cents = nxt
    return cents


def _corpus(n=60, dim=6):
    """Deterministic clustered corpus — md5-derived floats around 3
    well-separated anchors, plus a negative-coordinate anchor so the
    truncating-division sign path is exercised."""
    anchors = [
        [0.8, 0.1, -0.7, 0.3, 0.0, 0.5],
        [-0.9, -0.4, 0.2, -0.6, 0.1, -0.2],
        [0.1, 0.9, 0.6, -0.1, -0.8, 0.0],
    ]
    rows = []
    for i in range(n):
        a = anchors[i % 3]
        vec = []
        for d in range(dim):
            h = int(
                hashlib.md5(f"km-test-{i}-{d}".encode()).hexdigest()[:8], 16
            )
            vec.append(a[d] + ((h % 2001) - 1000) / 10000.0)
        rows.append((i, vec))
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    return rows, df


def test_fit_matches_python_twin(corpus):
    rows, df = corpus
    qrows = [(i, _twin_quantize(v)) for i, v in rows]
    expected = _twin_fit(qrows, k=4, n_iters=3)
    got = kmeans_fit(df, k=4, n_iters=3)
    assert got == expected


def test_seeds_are_md5_order(corpus):
    rows, df = corpus
    qrows = [(i, _twin_quantize(v)) for i, v in rows]
    assert kmeans_seeds(df, 5) == _twin_seeds(qrows, 5)


def test_partition_invariance(corpus):
    _, df = corpus
    a = kmeans_fit(df.repartition(1), k=3, n_iters=2)
    b = kmeans_fit(df.repartition(7, "vec_id"), k=3, n_iters=2)
    assert a == b


def test_assign_tie_to_lowest_cid(spark):
    # Two identical centroids -> every point equidistant -> cid 0.
    df = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [-0.25, 0.125])],
        "vec_id long, embedding array<double>",
    )
    cents = [[0, 0], [0, 0]]
    got = {
        r["vec_id"]: (r["cluster_id"], r["d2"])
        for r in kmeans_assign(df, cents).collect()
    }
    assert got[1] == (0, 500000**2 * 2)
    assert got[2] == (0, 250000**2 + 125000**2)


def test_empty_cluster_keeps_seed(spark):
    # 2 distinct points, k=2, but both nearest to one seed after the
    # first update can't happen with k=n; instead: duplicate points so
    # one seed owns everything and the other (identical coords) keeps
    # its previous centroid unchanged through every round.
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(df, k=2, n_iters=3)
    # All points tie to cid 0 (identical seeds, lowest-cid rule); cid 1
    # never receives a point and must keep its seed centroid.
    assert cents == [[10**6, 10**6], [10**6, 10**6]]
    assigned = kmeans_assign(df, cents)
    assert assigned.where(F.col("cluster_id") == 1).count() == 0


def test_summary_census_and_digest(corpus):
    rows, df = corpus
    cents = kmeans_fit(df, k=3, n_iters=2)
    out = kmeans_summary(df, cents).collect()
    assert sum(r["n_points"] for r in out) == len(rows)
    for r in out:
        want = hashlib.md5(
            ",".join(str(v) for v in cents[r["cluster_id"]]).encode()
        ).hexdigest()
        assert r["centroid_digest"] == want
    # inertia_shift halves exactly on the shifted values
    sh = {
        r["cluster_id"]: r["inertia"]
        for r in kmeans_summary(df, cents, inertia_shift=4).collect()
    }
    qrows = {i: _twin_quantize(v) for i, v in rows}
    twin = {}
    for r in kmeans_assign(df, cents).collect():
        twin[r["cluster_id"]] = twin.get(r["cluster_id"], 0) + (
            r["d2"] >> 4
        )
    assert sh == twin
    assert set(qrows) == {i for i, _ in rows}


def test_assignment_plan_is_pure_catalyst(corpus):
    _, df = corpus
    cents = [[0] * 6, [10**5] * 6]
    plan = kmeans_assign(df, cents)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # zero-shuffle assignment pass


def test_numpy_kernel_bit_identical(corpus):
    rows, df = corpus
    a = kmeans_fit(df, k=4, n_iters=3)
    b = kmeans_fit(df.repartition(5), k=4, n_iters=3, kernel="numpy")
    assert a == b
    with pytest.raises(ValueError, match="kernel"):
        kmeans_fit(df, k=2, n_iters=1, kernel="gpu")


def test_k_exceeds_corpus_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_seeds(df, 3)
