"""Discrete Fréchet: textbook DP twin, order-awareness vs Hausdorff,
prune losslessness, and kernel exactness."""

from __future__ import annotations

import numpy as np

from osm_spark.spatial.frechet import frechet_dp_np, frechet_join


def _brute_frechet(A, B):
    """Textbook O(n·m) memoized recurrence — the independent twin."""
    n, m = len(A), len(B)
    INF = 1 << 62
    c = [[None] * (m + 1) for _ in range(n + 1)]

    def d2(i, j):
        dx = int(A[i - 1][0]) - int(B[j - 1][0])
        dy = int(A[i - 1][1]) - int(B[j - 1][1])
        return dx * dx + dy * dy

    for i in range(1, n + 1):
        for j in range(1, m + 1):
            preds = []
            if i > 1:
                preds.append(c[i - 1][j])
            if j > 1:
                preds.append(c[i][j - 1])
            if i > 1 and j > 1:
                preds.append(c[i - 1][j - 1])
            best = min(preds) if preds else 0 if (i, j) == (1, 1) else INF
            c[i][j] = max(d2(i, j), best if (i, j) != (1, 1) else 0)
    return c[n][m]


def test_kernel_matches_textbook_dp():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n, m = rng.integers(1, 30, 2)
        A = rng.integers(-100, 100, (n, 2)).astype(np.int64)
        B = rng.integers(-100, 100, (m, 2)).astype(np.int64)
        assert frechet_dp_np(A, B) == _brute_frechet(A, B)


def test_kernel_goldens():
    a = np.array([[0, 0], [10, 0], [20, 0]], dtype=np.int64)
    assert frechet_dp_np(a, a) == 0
    b = np.array([[0, 5], [10, 5], [20, 5]], dtype=np.int64)
    assert frechet_dp_np(a, b) == 25  # constant offset: leash = 5
    # reversed tour: Hausdorff 0, Fréchet forced across the span
    assert frechet_dp_np(a, a[::-1].copy()) == 400


def test_join_order_awareness(spark):
    """Two identical routes and one reversed route: Hausdorff accepts
    both pairs, Fréchet keeps only the same-direction pair."""
    rows = []
    for i in range(8):
        rows.append(("f", i, 0.001 * i, 0.0))
        rows.append(("g", i, 0.001 * i, 0.0))       # same direction
        rows.append(("r", i, 0.001 * (7 - i), 0.0))  # reversed
    pts = spark.createDataFrame(
        rows, "traj string, seq long, lon double, lat double"
    )
    out = frechet_join(
        pts, 0.002, traj_col="traj", order_cols=("seq",)
    ).collect()
    got = {(r["traj_a"], r["traj_b"]): r["frechet_d2"] for r in out}
    assert got == {("f", "g"): 0}
    # at a radius covering the whole span, the reversed pairs appear
    # with the forced-crossing Fréchet value
    wide = frechet_join(
        pts, 0.01, traj_col="traj", order_cols=("seq",)
    ).collect()
    gotw = {(r["traj_a"], r["traj_b"]): r["frechet_d2"] for r in wide}
    assert gotw[("f", "g")] == 0
    assert gotw[("f", "r")] == gotw[("g", "r")] == 7000 * 7000


def test_frechet_at_least_hausdorff(spark):
    rng = np.random.default_rng(9)
    rows = []
    for t in range(5):
        for s in range(12):
            rows.append(
                (
                    f"t{t}",
                    s,
                    float(rng.uniform(0, 0.004)),
                    float(rng.uniform(0, 0.004)),
                )
            )
    pts = spark.createDataFrame(
        rows, "traj string, seq long, lon double, lat double"
    )
    out = frechet_join(
        pts, 0.01, traj_col="traj", order_cols=("seq",)
    ).collect()
    assert out, "radius covers everything — pairs must qualify"
    for r in out:
        assert r["frechet_d2"] >= r["hausdorff_d2"]
