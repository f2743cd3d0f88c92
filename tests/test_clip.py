"""Clip kernel (Sutherland–Hodgman) unit tests — pure Python."""

from osm_spark.kernels.clip import (
    clip_multipolygon_to_box,
    clip_ring_to_box,
    multipolygon_area,
    ring_area,
)

SQ = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]


def test_clip_fully_inside():
    assert clip_ring_to_box(SQ, -1, -1, 5, 5) == SQ


def test_clip_fully_outside():
    assert clip_ring_to_box(SQ, 10, 10, 12, 12) == []


def test_clip_half():
    r = clip_ring_to_box(SQ, 2, -1, 10, 10)
    assert ring_area(r) == 8.0
    xs = [p[0] for p in r]
    assert min(xs) == 2.0 and max(xs) == 4.0


def test_clip_corner():
    r = clip_ring_to_box(SQ, 3, 3, 10, 10)
    assert ring_area(r) == 1.0


def test_clip_area_partition():
    """Clipping to a grid of boxes partitions the area exactly."""
    total = 0.0
    for bx in range(-1, 5):
        for by in range(-1, 5):
            r = clip_ring_to_box(SQ, bx, by, bx + 1, by + 1)
            if r:
                total += ring_area(r)
    assert abs(total - 16.0) < 1e-9


def test_clip_multipolygon_with_hole():
    mp = [
        [
            SQ,
            [[1.0, 1.0], [1.0, 3.0], [3.0, 3.0], [3.0, 1.0], [1.0, 1.0]],  # hole
        ]
    ]
    # full box: area = 16 - 4
    assert abs(multipolygon_area(clip_multipolygon_to_box(mp, -1, -1, 5, 5)) - 12.0) < 1e-9
    # left half: outer 8, hole half 2 -> 6
    left = clip_multipolygon_to_box(mp, -1, -1, 2, 5)
    assert abs(multipolygon_area(left) - 6.0) < 1e-9
    # window entirely inside the hole -> nothing? outer clips to the
    # window, hole clips to the window too -> area 0
    inner = clip_multipolygon_to_box(mp, 1.5, 1.5, 2.5, 2.5)
    assert abs(multipolygon_area(inner)) < 1e-9


def test_clip_nonconvex_c_shape():
    c = [
        [0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0], [1.0, 2.0],
        [3.0, 2.0], [3.0, 3.0], [0.0, 3.0], [0.0, 0.0],
    ]
    # right half x>=2: two disjoint slabs, S-H yields a degenerate
    # connected ring of equal total area (known S-H property on
    # non-convex subjects): area must still be exact
    r = clip_ring_to_box(c, 2, -1, 10, 10)
    assert abs(ring_area(r) - 2.0) < 1e-9
