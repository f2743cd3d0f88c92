"""Douglas-Peucker ring simplification (planet-scale index mitigation).

SCALE.md names geometry simplification as the way to keep the broadcast
PipIndex under budget when planet-fidelity admin boundaries are wanted
in index mode (admin assignment tolerates ~1e-5 deg tolerance).  This
kernel is that operator's core: classic Douglas-Peucker, expressed
stack-based (no recursion limit) over numpy coordinate arrays.

Closed-ring convention: rings arrive CLOSED (first point == last
point, the assembly output shape, assembly.py LOCATION_SCHEMA).  Both
endpoints of the chain are anchored; the first baseline is therefore
degenerate (a == b) and the farthest-point rule falls back to plain
point distance from the anchor — the standard "closed ring as open
chain" treatment.  Every split after that uses the perpendicular
distance to the anchor segment's LINE, computed division-free:

    keep the farthest interior point iff cross^2 > tol^2 * len2

with cross = (bx-ax)*(ay-py) - (ax-px)*(by-ay) and len2 the squared
anchor distance.  Ties take the SMALLEST index (np.argmax first-hit).
The exact same formula, operation order and tie-break is re-expressed
as a recursive SQL CTE in the q55 DuckDB oracle (__spark_entry__.py),
so the two implementations are independent in *algorithm expression*
(stack loop vs SQL recursion) while bit-comparable in arithmetic.

Guarantees:
- kept vertices are a subset of the input vertices (indices returned);
- indices 0 and n-1 (the closure pair) are always kept, so the output
  ring is closed by construction;
- every removed vertex lies within ``tol`` of the kept polyline's
  anchor lines (the DP invariant).

A ring whose simplification keeps fewer than 4 points (closure pair +
at least 2 more, i.e. < 3 distinct vertices) is degenerate at this
tolerance; ``simplify_polygon`` drops collapsed holes and returns
``None`` when the outer ring itself collapses (callers drop the
polygon — matching how a sub-tolerance sliver contributes nothing to
point-in-polygon assignment).
"""

from __future__ import annotations

import numpy as np

# Minimum kept points for a closed ring to stay valid: closure pair
# plus two more distinct vertices (a triangle).
MIN_RING_POINTS = 4


def simplify_ring_indices(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Indices (ascending) of the vertices Douglas-Peucker keeps on a
    closed ring given as float64 coordinate arrays (first == last)."""
    n = xs.shape[0]
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = True
    keep[n - 1] = True
    tol2 = tol * tol
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay = xs[lo], ys[lo]
        bx, by = xs[hi], ys[hi]
        px = xs[lo + 1 : hi]
        py = ys[lo + 1 : hi]
        dx = bx - ax
        dy = by - ay
        len2 = dx * dx + dy * dy
        if len2 == 0.0:
            ex = px - ax
            ey = py - ay
            score = ex * ex + ey * ey
            thresh = tol2
        else:
            cross = dx * (ay - py) - (ax - px) * dy
            score = cross * cross
            thresh = tol2 * len2
        k_rel = int(np.argmax(score))  # first max -> smallest index on ties
        if score[k_rel] > thresh:
            k = lo + 1 + k_rel
            keep[k] = True
            stack.append((lo, k))
            stack.append((k, hi))
    return np.flatnonzero(keep).astype(np.int64)


def simplify_ring(ring: list, tol: float) -> list | None:
    """Simplify one closed ring ([[lon, lat], ...], first == last).

    Returns the kept points as a list, or None when the ring collapses
    below MIN_RING_POINTS at this tolerance."""
    xs = np.asarray([p[0] for p in ring], dtype=np.float64)
    ys = np.asarray([p[1] for p in ring], dtype=np.float64)
    kept = simplify_ring_indices(xs, ys, tol)
    if kept.shape[0] < MIN_RING_POINTS:
        return None
    return [[float(xs[i]), float(ys[i])] for i in kept]


def simplify_polygon(rings: list, tol: float) -> list | None:
    """Simplify a polygon (outer ring first, then holes).

    Collapsed holes are dropped; a collapsed OUTER ring drops the whole
    polygon (returns None)."""
    out = []
    for i, ring in enumerate(rings):
        simplified = simplify_ring(ring, tol)
        if simplified is None:
            if i == 0:
                return None
            continue
        out.append(simplified)
    return out
