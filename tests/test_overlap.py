"""kernels/overlap.py — exact multipolygon pair classification.

The q97 driver oracle checks the full operator against an independent
interval-arithmetic decomposition of the world; these pin the kernel's
decision paths directly, including the ones that exist for exactness
(collinear shared borders, boundary-identical containment, hole-poke).
"""

from osm_spark.kernels.overlap import classify_pair


def rect(x0, y0, x1, y1, cw=False):
    r = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
    return r[::-1] if cw else r


A = [[rect(0, 0, 100, 100)]]


def test_disjoint_and_touching_are_none():
    assert classify_pair(A, [[rect(200, 0, 300, 100)]]) is None
    # shared full edge (adjacent depts): interiors disjoint
    assert classify_pair(A, [[rect(100, 0, 200, 100)]]) is None
    # corner touch
    assert classify_pair(A, [[rect(100, 100, 200, 200)]]) is None


def test_basic_relations():
    assert classify_pair(A, [[rect(10, 10, 20, 20)]]) == "a_contains_b"
    assert classify_pair([[rect(10, 10, 20, 20)]], A) == "b_contains_a"
    assert classify_pair(A, [[rect(50, -50, 150, 50)]]) == "overlap"
    assert classify_pair(A, [[rect(0, 0, 100, 100)]]) == "equal"
    # equality is outline-based: reversed winding is the same point set
    assert classify_pair(A, [[rect(0, 0, 100, 100, cw=True)]]) == "equal"


def test_contained_sharing_border():
    # dept inside country flush against the border: no vertex of the
    # dept is strictly outside, the shared edge is collinear — contains
    country = [[rect(0, 0, 400, 400)]]
    dept = [[rect(0, 0, 100, 400)]]
    assert classify_pair(country, dept) == "a_contains_b"


def test_boundary_identical_part_containment():
    # multipolygon containing an EXACT copy of one of its parts: every
    # vertex is on the other's boundary — resolved by the collinear
    # edge-midpoint interior-side rule
    union = [[rect(0, 0, 100, 100)], [rect(200, 0, 300, 100)]]
    dept = [[rect(0, 0, 100, 100)]]
    assert classify_pair(union, dept) == "a_contains_b"
    assert classify_pair(dept, union) == "b_contains_a"


def test_annulus_cases():
    ann = [[rect(0, 0, 100, 100), rect(30, 30, 70, 70, cw=True)]]
    filled = [[rect(0, 0, 100, 100)]]
    # filled outer strictly contains the annulus (hole-poke demotes
    # the annulus' locally-inside verdict on the reverse test)
    assert classify_pair(ann, filled) == "b_contains_a"
    assert classify_pair(filled, ann) == "a_contains_b"
    # a polygon inside the hole: interiors disjoint
    assert classify_pair(ann, [[rect(40, 40, 60, 60)]]) is None
    # a polygon straddling the hole wall: overlap
    assert classify_pair(ann, [[rect(20, 40, 50, 60)]]) == "overlap"


def test_t_vertex_entry_without_proper_crossing():
    # triangle whose only contact vertex lies ON A's edge, dipping both
    # in and out: no proper crossing, mixed strict votes → overlap
    tri = [[[[50, 100], [20, 120], [20, 80], [50, 100]]]]
    assert classify_pair(A, tri) == "overlap"


def test_multipart_straddle_is_overlap():
    # one part inside A, one outside: partial containment → overlap
    two = [[rect(10, 10, 20, 20)], [rect(200, 0, 300, 100)]]
    assert classify_pair(A, two) == "overlap"


def test_regularized_seam_semantics():
    # two halves jointly contain the undivided square: the seam between
    # the halves is measure-zero — regularized containment holds
    halves = [[rect(0, 0, 50, 100)], [rect(50, 0, 100, 100)]]
    assert classify_pair(halves, A) == "equal"
