"""Coverage dissolve (union by key): edge-cancellation exactness,
hole nesting, pinch split, python-twin differential, invariance."""

import hashlib

import pytest

from osm_spark.spatial.dissolve import coverage_boundary_edges, dissolve

S = 1000  # cell side in fixed-point units


def cell(i, j, s=S):
    """Unit grid cell (i, j) as one CCW ring polygon."""
    x0, y0 = i * s, j * s
    return [
        [
            [float(x0), float(y0)],
            [float(x0 + s), float(y0)],
            [float(x0 + s), float(y0 + s)],
            [float(x0), float(y0 + s)],
            [float(x0), float(y0)],
        ]
    ]


def cells_df(spark, assignment):
    """assignment: {(i, j): group}."""
    rows = [
        (int(g), [cell(i, j)]) for (i, j), g in sorted(assignment.items())
    ]
    return spark.createDataFrame(
        rows, "group_id long, shape array<array<array<array<double>>>>"
    )


def shape_area2(shape):
    """2x exact area of a dissolved multipolygon (outer - holes)."""

    def ring_a2(ring):
        a = 0
        for k in range(len(ring) - 1):
            x1, y1 = int(ring[k][0]), int(ring[k][1])
            x2, y2 = int(ring[k + 1][0]), int(ring[k + 1][1])
            a += x1 * y2 - x2 * y1
        return a

    total = 0
    for poly in shape:
        total += abs(ring_a2(poly[0]))
        for hole in poly[1:]:
            total -= abs(ring_a2(hole))
    return total


def shape_edges(shape):
    """Canonical undirected edge multiset of a multipolygon."""
    out = []
    for poly in shape:
        for ring in poly:
            for k in range(len(ring) - 1):
                a = (int(ring[k][0]), int(ring[k][1]))
                b = (int(ring[k + 1][0]), int(ring[k + 1][1]))
                out.append((min(a, b), max(a, b)))
    return sorted(out)


def brute_boundary(assignment, group):
    """Python twin: undirected edges owned by exactly one of the two
    adjoining cells within ``group`` (grid coverage ground truth)."""
    cells = {c for c, g in assignment.items() if g == group}
    edges = []
    for i, j in cells:
        x0, y0 = i * S, j * S
        sides = [
            ((i, j - 1), ((x0, y0), (x0 + S, y0))),
            ((i + 1, j), ((x0 + S, y0), (x0 + S, y0 + S))),
            ((i, j + 1), ((x0, y0 + S), (x0 + S, y0 + S))),
            ((i - 1, j), ((x0, y0), (x0, y0 + S))),
        ]
        for nbr, (a, b) in sides:
            if nbr not in cells:
                edges.append((min(a, b), max(a, b)))
    return sorted(edges)


def collect_shapes(df):
    return {
        r["group_id"]: r.asDict() for r in df.collect()
    }


def test_two_adjacent_cells_merge(spark):
    df = cells_df(spark, {(0, 0): 1, (1, 0): 1})
    out = collect_shapes(dissolve(df, "group_id"))
    r = out[1]
    assert r["n_polygons"] == 1 and r["n_rings"] == 1
    assert r["invalid_edges"] == 0 and r["warning"] is None
    assert shape_area2(r["shape"]) == 2 * 2 * S * S
    # shared edge gone: 6 boundary edges (the 2x1 rect outline)
    assert len(shape_edges(r["shape"])) == 6


def test_donut_hole_nesting(spark):
    ring8 = {
        (i, j): 7
        for i in range(3)
        for j in range(3)
        if not (i == 1 and j == 1)
    }
    ring8[(1, 1)] = 9
    out = collect_shapes(dissolve(cells_df(spark, ring8), "group_id"))
    a, b = out[7], out[9]
    assert a["n_polygons"] == 1 and a["n_rings"] == 2  # outer + hole
    assert shape_area2(a["shape"]) == 2 * 8 * S * S
    assert b["n_polygons"] == 1 and shape_area2(b["shape"]) == 2 * S * S
    # hole ring equals the inner cell's outline
    assert sorted(shape_edges(a["shape"])) == sorted(
        brute_boundary(ring8, 7)
    )


def test_diagonal_touch_splits(spark):
    df = cells_df(spark, {(0, 0): 3, (1, 1): 3})
    out = collect_shapes(dissolve(df, "group_id"))
    r = out[3]
    assert r["n_polygons"] == 2 and r["n_rings"] == 2
    assert shape_area2(r["shape"]) == 2 * 2 * S * S


def test_seeded_grid_vs_python_twin(spark):
    assignment = {}
    for i in range(9):
        for j in range(7):
            h = hashlib.md5(f"dis:{i}:{j}".encode()).hexdigest()
            assignment[(i, j)] = int(h[:8], 16) % 4
    out = collect_shapes(dissolve(cells_df(spark, assignment), "group_id"))
    for g in range(4):
        n_cells = sum(1 for v in assignment.values() if v == g)
        r = out[g]
        assert r["invalid_edges"] == 0
        assert shape_area2(r["shape"]) == 2 * n_cells * S * S
        assert shape_edges(r["shape"]) == brute_boundary(assignment, g)


def test_partitioning_invariance(spark):
    assignment = {
        (i, j): (i * 7 + j * 13) % 3 for i in range(6) for j in range(6)
    }
    df = cells_df(spark, assignment)
    a = dissolve(df, "group_id").orderBy("group_id").collect()
    b = dissolve(df.repartition(7), "group_id").orderBy("group_id").collect()
    assert [r["shape"] for r in a] == [r["shape"] for r in b]


def test_plus_pinch_four_faces(spark):
    """Four unit faces around an excluded center cell: the undirected
    Eulerian decomposition is ambiguous (plus-outline + center hole has
    the SAME area and edge set) — the directed sharpest-left-turn
    tracer must produce the four separate corner-touching polygons."""
    df = cells_df(spark, {(1, 0): 1, (0, 1): 1, (2, 1): 1, (1, 2): 1})
    r = collect_shapes(dissolve(df, "group_id"))[1]
    assert r["n_polygons"] == 4 and r["n_rings"] == 4
    assert shape_area2(r["shape"]) == 2 * 4 * S * S
    assert all(len(p) == 1 and len(p[0]) == 5 for p in r["shape"])


def test_checkerboard_splits_every_cell(spark):
    """Diagonal-only adjacency everywhere: every cell stays its own
    polygon (straight-through ranks last in the turn rule)."""
    assignment = {
        (i, j): (i + j) % 2 for i in range(4) for j in range(4)
    }
    out = collect_shapes(dissolve(cells_df(spark, assignment), "group_id"))
    assert out[0]["n_polygons"] == 8 and out[1]["n_polygons"] == 8
    assert shape_area2(out[0]["shape"]) == 2 * 8 * S * S


def test_overlap_violation_flagged(spark):
    # same cell twice in one group: every edge has |net| = 2
    rows = [(1, [cell(0, 0)]), (1, [cell(0, 0)])]
    df = spark.createDataFrame(
        rows, "group_id long, shape array<array<array<array<double>>>>"
    )
    r = collect_shapes(dissolve(df, "group_id"))[1]
    assert r["invalid_edges"] == 4


def test_surviving_edges_catalyst_only(spark):
    """The cancellation stage is pure Catalyst — no Python eval nodes."""
    df = cells_df(spark, {(0, 0): 1, (1, 0): 1})
    plan = coverage_boundary_edges(df, "group_id")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
