"""Per-group convex hull — exact-integer monotone chain, distributed
via the hull-of-hulls pre-reduction.

The curation/coverage primitive the PIP surface lacks: the extremal
footprint of a point set (per language, per host, per admin area —
"where does this slice of the corpus live?"), with exact area and a
canonical vertex order that downstream joins/digests can rely on.

Scale shape — hull is an associative reduction (hull(A ∪ B) =
hull(hull(A) ∪ hull(B))), so it distributes like a combiner:

1. **Local reduce** — one ``mapInPandas`` pass emits each partition's
   per-group LOCAL hull vertices (for a degenerate — collinear or
   tiny — local set, its extreme points). Random points have expected
   hull size O(log n); worst case the local hull is the local set, but
   the shuffle after this stage is per-group Σ local-hull sizes, not
   the point count.
2. **Final chain** — ONE ``groupBy(group)`` + ``applyInPandas`` runs
   the same kernel on the surviving extremes. Parallelism unit is the
   group (the boundary-assembly A2 pattern); per-task memory is the
   surviving extreme count, not the corpus.

Exactness contract: coordinates are int64 micro-degrees; every turn
decision is a python-int cross product (arbitrary precision — no
float, no overflow); the hull is the STRICT hull (collinear boundary
points excluded — `<= 0` pops), in CCW order starting at the
lexicographically smallest (x, y) vertex, so vertex lists and digests
are engine/partitioning-exact. Groups whose distinct points are all
collinear (or < 3) have no polygon hull and emit nothing — the same
drop semantics as the centroid pipeline's degenerate geometries.

``area2_u`` is the shoelace 2×area in µdeg² about the hull's first
vertex (translation keeps edge terms ≤ (3.6·10⁸)² ≈ 1.3·10¹⁷; a
planet-spanning hull with hundreds of vertices stays far from 2⁶³ —
the kernel computes in python ints and raises if a cast would wrap).

No reference counterpart (pmezard/osm has no hull); training-data
extension surface (SURVEY §2.9 X91).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def chain_hull(pts) -> list[tuple[int, int]] | None:
    """Strict convex hull of int point tuples (Andrew monotone chain),
    CCW starting at the lexicographically smallest point; None when
    the distinct points admit no polygon (all collinear or < 3)."""
    pts = sorted(set((int(x), int(y)) for x, y in pts))
    if len(pts) < 3:
        return None
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    return hull if len(hull) >= 3 else None


def _local_extremes(pts) -> list[tuple[int, int]]:
    """Pre-reduction survivors: the local hull when one exists, else
    the extreme points of the degenerate set (endpoints of a collinear
    run suffice — interior collinear points can never be hull vertices
    of any superset... of the segment they lie strictly inside)."""
    pts = list(pts)  # pts may be a one-shot iterator; chain consumes it
    hull = chain_hull(pts)
    if hull is not None:
        return hull
    uniq = sorted(set((int(x), int(y)) for x, y in pts))
    return uniq if len(uniq) <= 2 else [uniq[0], uniq[-1]]


def hull_area2(hull: list[tuple[int, int]]) -> int:
    """Exact shoelace 2×area (positive — hull is CCW), translated to
    the first vertex to bound term magnitude."""
    x0, y0 = hull[0]
    s = 0
    for (ax, ay), (bx, by) in zip(hull, hull[1:] + hull[:1]):
        s += (ax - x0) * (by - y0) - (bx - x0) * (ay - y0)
    return s


def convex_hull(
    points: DataFrame,
    group_cols: list[str],
    x_col: str = "x_u",
    y_col: str = "y_u",
    pre_reduce: bool = True,
) -> DataFrame:
    """Per-group strict hull vertices: (group..., pos, x_u, y_u) in
    canonical CCW order. See module docstring for semantics/scale."""
    import pandas as pd

    gc = list(group_cols)
    src = points.select(
        *gc, F.col(x_col).cast("long").alias("x_u"),
        F.col(y_col).cast("long").alias("y_u"),
    )
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in src.schema if f.name in gc
    )
    mid_schema = f"{fields}, x_u long, y_u long"

    if pre_reduce:
        def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                outs = []
                for key, g in pdf.groupby(gc, sort=False, dropna=False):
                    key = key if isinstance(key, tuple) else (key,)
                    ext = _local_extremes(
                        zip(g["x_u"].tolist(), g["y_u"].tolist())
                    )
                    o = pd.DataFrame(ext, columns=["x_u", "y_u"])
                    for c, v in zip(gc, key):
                        o[c] = v
                    outs.append(o[gc + ["x_u", "y_u"]])
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        src = src.mapInPandas(local, mid_schema)

    out_schema = f"{fields}, pos int, x_u long, y_u long"

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        hull = chain_hull(zip(pdf["x_u"].tolist(), pdf["y_u"].tolist()))
        if hull is None:
            return pd.DataFrame(
                {c: [] for c in gc + ["pos", "x_u", "y_u"]}
            ).astype({"pos": "int32", "x_u": "int64", "y_u": "int64"})
        o = pd.DataFrame(hull, columns=["x_u", "y_u"])
        o["pos"] = range(len(hull))
        for c, v in zip(gc, key):
            o[c] = v
        return o[gc + ["pos", "x_u", "y_u"]]

    return src.groupBy(*gc).applyInPandas(final, out_schema)


def hull_summary(
    points: DataFrame,
    group_cols: list[str],
    x_col: str = "x_u",
    y_col: str = "y_u",
    pre_reduce: bool = True,
) -> DataFrame:
    """(group..., n_vertices, area2_u, hull_digest): hull census with
    md5 over the canonical 'x:y;x:y;...' vertex string — order-exact,
    so two engines agree iff the hulls agree vertex-for-vertex."""
    verts = convex_hull(points, group_cols, x_col, y_col, pre_reduce)
    gc = list(group_cols)
    vstr = F.concat_ws(
        ":", F.col("x_u").cast("string"), F.col("y_u").cast("string")
    )
    edge = F.struct("pos", "x_u", "y_u")
    nxt = F.lead(edge, 1).over(Window.partitionBy(*gc).orderBy("pos"))
    # area2 via order-free shoelace over directed edges (first vertex
    # wraps): lead() window pairs consecutive vertices; the last pairs
    # with the first via coalesce against the group min (pos 0).
    full_w = Window.partitionBy(*gc).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    first = F.first(edge).over(full_w)
    e2 = F.coalesce(nxt, first)
    # Translate to the group's bbox corner before multiplying —
    # shoelace is exactly translation-invariant in integer arithmetic,
    # and regional hulls then multiply extents (≤ their span) instead
    # of absolute coordinates (≤ 1.8·10⁸), keeping the per-term bound
    # span² ≪ 2⁶³ no matter how many vertices the hull has.
    x0 = F.min("x_u").over(full_w)
    y0 = F.min("y_u").over(full_w)
    term = (F.col("x_u") - x0) * (e2["y_u"] - y0) - (
        e2["x_u"] - x0
    ) * (F.col("y_u") - y0)
    return (
        verts.withColumn("_t", term)
        .withColumn("_v", vstr)
        .groupBy(*gc)
        .agg(
            F.count("*").cast("int").alias("n_vertices"),
            F.sum("_t").alias("area2_u"),
            F.md5(F.concat_ws(";", F.array_sort(
                F.collect_list(F.struct("pos", "_v"))
            ).getField("_v"))).alias("hull_digest"),
        )
    )
