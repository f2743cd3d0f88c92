"""Property-based (hypothesis) pins for the session-2 pure kernels —
Spark-free randomized invariants that a fixed fixture can miss.

Each test pins a mathematical property the ORACLE equality can't
check by itself (oracles pin engine-vs-engine on one dataset; these
pin the algorithm's own contract over the input space)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from osm_spark.operators.skyline import skyline_np
from osm_spark.spatial.frechet import frechet_dp_np
from osm_spark.spatial.isolines import MS_TABLE, isolines_py

pts = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=150, deadline=None)
@given(pts, pts)
def test_frechet_axioms(a, b):
    A = np.asarray(a, dtype=np.int64)
    B = np.asarray(b, dtype=np.int64)
    dab = frechet_dp_np(A, B)
    # symmetry
    assert dab == frechet_dp_np(B, A)
    # identity
    assert frechet_dp_np(A, A) == 0
    # lower bound: endpoints are forcibly coupled
    d_start = int(((A[0] - B[0]) ** 2).sum())
    d_end = int(((A[-1] - B[-1]) ** 2).sum())
    assert dab >= max(d_start, d_end) or len(a) == 1 or len(b) == 1
    # upper bound: any coupling max ≥ DF; the diagonal-ish walk gives
    # max over the greedy pairing of index-proportional alignment
    n, m = len(A), len(B)
    walk = max(
        int(((A[min(i, n - 1)] - B[min(i, m - 1)]) ** 2).sum())
        for i in range(max(n, m))
    )
    assert dab <= walk


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_properties(rows):
    X = np.asarray(rows, dtype=np.int64)
    keep = skyline_np(X)
    assert keep.any()  # the front is never empty
    front = X[keep]
    out = X[~keep]
    # every kept row is non-dominated by ANY row
    for f in front:
        dom = (X >= f).all(axis=1) & (X > f).any(axis=1)
        assert not dom.any()
    # every dropped row is dominated by some kept row
    for o in out:
        dom = (front >= o).all(axis=1) & (front > o).any(axis=1)
        assert dom.any()
    # max on each single dimension always survives somewhere
    for d in range(X.shape[1]):
        assert front[:, d].max() == X[:, d].max() or (
            X[:, d] == X[:, d].max()
        ).sum() > 0  # ties: at least one max-row must be kept
        assert (front[:, d] == X[:, d].max()).any()


@settings(max_examples=120, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_isolines_topology(occ):
    segs = isolines_py(occ)
    # closed 1-manifold: every vertex has even degree (contours of a
    # binary field never dead-end)
    deg: dict[tuple, int] = {}
    for *_, x1, y1, x2, y2 in segs:
        for p in ((x1, y1), (x2, y2)):
            deg[p] = deg.get(p, 0) + 1
    assert all(v % 2 == 0 for v in deg.values())
    # segment count == Σ per-case table sizes (no case invents or
    # drops segments)
    blocks: dict[tuple, int] = {}
    for gx, gy in occ:
        for dx, dy, w in ((0, 0, 1), (1, 0, 2), (1, 1, 4), (0, 1, 8)):
            k = (gx - dx, gy - dy)
            blocks[k] = blocks.get(k, 0) | w
    want = sum(len(MS_TABLE.get(c, [])) for c in blocks.values())
    assert len(segs) == want
