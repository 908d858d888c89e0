"""Martinez–Rueda plane-sweep boolean kernel (functions/clipping.py).

The reference gets these from GEOS (gdal/ogr/ogrgeometry.cpp:2922
Intersection, :3104 Union, :3218 Difference, :3310 SymDifference); the
kernel is verified here against hand-computed exact areas, an independent
exact rectilinear implementation, and the algebraic identities
area(A∩B)+area(A−B)=area(A) and area(A∪B)=area(A)+area(B)−area(A∩B).
"""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.functions.clipping import (
    DIFFERENCE, INTERSECTION, UNION, XOR,
    boolean_op, multipolygon_area, wkb_boolean, wkb_difference_multi,
)


def sq(x0, y0, s):
    return [np.array([(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)],
                     dtype=float)]


DIAMOND = [[np.array([(1, -1), (3, 1), (1, 3), (-1, 1)], dtype=float)]]


def area(res):
    return multipolygon_area(res) if res else 0.0


@pytest.mark.parametrize("op,expected", [
    (INTERSECTION, 1.0), (UNION, 7.0), (DIFFERENCE, 3.0), (XOR, 6.0)])
def test_offset_squares(op, expected):
    assert area(boolean_op([sq(0, 0, 2)], [sq(1, 1, 2)], op)) == expected


def test_rotated_clip_partial():
    # diamond part with x >= 2 is the triangle (2,0),(3,1),(2,2): area 1
    assert area(boolean_op([sq(2, 0, 2)], DIAMOND, INTERSECTION)) == pytest.approx(1.0)


def test_rotated_two_diamonds_exact():
    # L1 balls r=2 centered (1,1) and (2,2); in rotated coords the overlap
    # is a sqrt(2) x 2*sqrt(2) rectangle: exactly 4
    d2 = [[np.array([(2, 0), (4, 2), (2, 4), (0, 2)], dtype=float)]]
    assert area(boolean_op(DIAMOND, d2, INTERSECTION)) == pytest.approx(4.0)
    assert area(boolean_op(DIAMOND, d2, UNION)) == pytest.approx(8 + 8 - 4)
    assert area(boolean_op(DIAMOND, d2, XOR)) == pytest.approx(8.0)


class TestVertexOnEdgeDegeneracies:
    """Subject vertices lying exactly ON clipping edges — the sweep-status
    tie the comparator breaks by the heading (right endpoint)."""

    def test_one_corner_touch(self):
        assert area(boolean_op([sq(0, 0, 1.5)], DIAMOND, INTERSECTION)) == 2.25

    def test_inscribed_square_all_corners_touch(self):
        s = [sq(0, 0, 2)]
        assert area(boolean_op(s, DIAMOND, INTERSECTION)) == 4.0
        assert area(boolean_op(s, DIAMOND, UNION)) == 8.0
        assert area(boolean_op(DIAMOND, s, DIFFERENCE)) == 4.0
        assert area(boolean_op(s, DIAMOND, XOR)) == 4.0


class TestCollinearOverlap:
    def test_shared_edge_adjacent(self):
        assert area(boolean_op([sq(0, 0, 1)], [sq(1, 0, 1)], INTERSECTION)) == 0.0
        assert area(boolean_op([sq(0, 0, 1)], [sq(1, 0, 1)], UNION)) == 2.0

    def test_partial_shared_edge(self):
        assert area(boolean_op([sq(0, 0, 2)], [sq(1, 2, 2)], UNION)) == 8.0
        assert area(boolean_op([sq(0, 0, 2)], [sq(1, 2, 2)], INTERSECTION)) == 0.0

    def test_identical_operands(self):
        assert area(boolean_op([sq(0, 0, 2)], [sq(0, 0, 2)], INTERSECTION)) == 4.0
        assert area(boolean_op([sq(0, 0, 2)], [sq(0, 0, 2)], DIFFERENCE)) == 0.0
        assert area(boolean_op([sq(0, 0, 2)], [sq(0, 0, 2)], XOR)) == 0.0


def test_concave_L_shape():
    L = [[np.array([(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)], float)]]
    s = [sq(0, 0, 2)]
    assert area(boolean_op(L, s, INTERSECTION)) == 3.0
    assert area(boolean_op(L, s, UNION)) == 6.0
    assert area(boolean_op(L, s, DIFFERENCE)) == 2.0


def test_hole_produced_by_difference():
    res = boolean_op([sq(0, 0, 4)], [sq(1, 1, 1)], DIFFERENCE)
    assert area(res) == 15.0
    assert len(res) == 1 and len(res[0]) == 2  # one polygon, one hole


def test_holed_subject():
    holed = [[sq(0, 0, 4)[0], sq(1, 1, 2)[0][::-1]]]
    assert area(boolean_op(holed, [sq(0, 0, 2)], INTERSECTION)) == 3.0
    assert area(boolean_op(holed, [sq(0, 0, 2)], UNION)) == 13.0


def test_multipolygon_operand():
    mp = [sq(0, 0, 1), sq(3, 0, 1)]
    assert area(boolean_op(mp, [sq(0, 0, 4)], INTERSECTION)) == 2.0


def test_empty_operands():
    assert boolean_op([], [sq(0, 0, 1)], INTERSECTION) == []
    assert area(boolean_op([], [sq(0, 0, 1)], UNION)) == 1.0
    assert boolean_op([sq(0, 0, 1)], [], INTERSECTION) == []
    assert area(boolean_op([sq(0, 0, 1)], [], DIFFERENCE)) == 1.0


def test_disjoint():
    assert boolean_op([sq(0, 0, 1)], [sq(5, 5, 1)], INTERSECTION) == []
    assert area(boolean_op([sq(0, 0, 1)], [sq(5, 5, 1)], UNION)) == 2.0


def test_output_ring_orientation():
    res = boolean_op([sq(0, 0, 4)], [sq(1, 1, 1)], DIFFERENCE)
    outer, hole = res[0]
    def signed(r):
        x, y = r[:, 0], r[:, 1]
        return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    assert signed(outer) > 0   # CCW outer
    assert signed(hole) < 0    # CW hole


def _random_rectilinear(rng, n_rects, span=16):
    """Union-of-axis-aligned-rects multipolygon on an integer grid (may
    overlap; fed through the exact rectilinear union first)."""
    wkbs = []
    for _ in range(n_rects):
        x0, y0 = rng.randint(0, span - 1, 2)
        w, h = rng.randint(1, 5, 2)
        wkbs.append(G.encode_polygon(sq(float(x0), float(y0), 0.0)
                                     if False else
                                     [np.array([(x0, y0), (x0 + w, y0),
                                                (x0 + w, y0 + h), (x0, y0 + h)],
                                               float)]))
    out = G.rectilinear_union(wkbs)
    return out  # (wkb, area) or None


@pytest.mark.parametrize("seed", range(8))
def test_cross_check_vs_rectilinear_difference(seed):
    """General kernel vs the independent breakpoint-grid implementation on
    random rectilinear arrangements (concave, holed, multi-part)."""
    rng = np.random.RandomState(seed)
    a = _random_rectilinear(rng, 4)
    b = _random_rectilinear(rng, 4)
    if a is None or b is None:
        pytest.skip("degenerate random fixture")
    exact = G.rectilinear_difference(a[0], [b[0]])
    got = wkb_boolean(a[0], b[0], DIFFERENCE)
    exact_area = exact[1] if exact else 0.0
    got_area = got[1] if got else 0.0
    assert got_area == pytest.approx(exact_area, abs=1e-9)
    # algebraic identities
    inter = wkb_boolean(a[0], b[0], INTERSECTION)
    union = wkb_boolean(a[0], b[0], UNION)
    ia = inter[1] if inter else 0.0
    ua = union[1] if union else 0.0
    assert ia + got_area == pytest.approx(a[1], abs=1e-9)
    assert ua == pytest.approx(a[1] + b[1] - ia, abs=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_random_convex_identities(seed):
    """Random rotated convex polygons: identities + Monte-Carlo area check."""
    rng = np.random.RandomState(100 + seed)

    def rand_convex():
        ang = np.sort(rng.rand(rng.randint(3, 8)) * 2 * np.pi)
        r = 1.0 + 2.0 * rng.rand(len(ang))
        cx, cy = rng.rand(2) * 4
        pts = np.column_stack((cx + r * np.cos(ang), cy + r * np.sin(ang)))
        hull = G.convex_hull(pts)
        return [hull]

    A, B = [rand_convex()], [rand_convex()]
    a_area = multipolygon_area(A)
    b_area = multipolygon_area(B)
    ia = area(boolean_op(A, B, INTERSECTION))
    da = area(boolean_op(A, B, DIFFERENCE))
    ua = area(boolean_op(A, B, UNION))
    xa = area(boolean_op(A, B, XOR))
    assert ia + da == pytest.approx(a_area, abs=1e-9)
    assert ua == pytest.approx(a_area + b_area - ia, abs=1e-9)
    assert xa == pytest.approx(ua - ia, abs=1e-9)
    # Monte-Carlo confirmation of the intersection area
    pts = rng.rand(200000, 2) * 12 - 3
    pa = G.PreparedPolygons([0], [G.encode_polygon(A[0])])
    pb = G.PreparedPolygons([0], [G.encode_polygon(B[0])])
    in_a = np.zeros(len(pts), dtype=bool)
    in_a[pa.contains_batch(pts[:, 0], pts[:, 1])[0]] = True
    in_b = np.zeros(len(pts), dtype=bool)
    in_b[pb.contains_batch(pts[:, 0], pts[:, 1])[0]] = True
    mc = float(np.mean(in_a & in_b)) * 144.0
    assert ia == pytest.approx(mc, abs=max(0.15, 0.1 * max(ia, 1e-9)))


def test_wkb_difference_multi_fold():
    subject = G.encode_polygon(sq(0, 0, 4))
    clips = [G.encode_polygon(sq(0, 0, 2)), G.encode_polygon(sq(2, 2, 2))]
    out = wkb_difference_multi(subject, clips)
    assert out is not None and out[1] == pytest.approx(8.0)
    gone = wkb_difference_multi(subject, [G.encode_polygon(sq(-1, -1, 6))])
    assert gone is None


# ---------------------------------------------------------------------------
# Buffer (OGRGeometry::Buffer, ogrgeometry.cpp:2817 → GEOSBuffer): exact
# Steiner closed forms for the snapped 4·quadsegs-gon disk.
# ---------------------------------------------------------------------------

from gdal_spark.functions.clipping import wkb_buffer  # noqa: E402


def _adisk(d, quadsegs):
    import math
    n = 4 * quadsegs
    return (n / 2.0) * d * d * math.sin(2 * math.pi / n)


class TestBuffer:
    def test_point_disk(self):
        wkb = G.encode_point(3.0, 4.0)
        out = wkb_buffer(wkb, 2.0, quadsegs=8)
        assert out is not None
        assert out[1] == pytest.approx(_adisk(2.0, 8), abs=1e-10)

    def test_point_negative_empty(self):
        assert wkb_buffer(G.encode_point(0.0, 0.0), -1.0) is None

    def test_line_band(self):
        wkb = G.encode_linestring(np.array([[0.0, 0.0], [7.0, 0.0]]))
        out = wkb_buffer(wkb, 0.5, quadsegs=30)
        assert out[1] == pytest.approx(7.0 + _adisk(0.5, 30), abs=1e-10)

    def test_line_bent(self):
        # right-angle polyline: two bands + 3 disks; exact closed form:
        # 2dL per segment + full disk area + convex-corner quarter wedge
        # − d² band overlap at the elbow
        d, qs = 0.5, 30
        wkb = G.encode_linestring(np.array([[0.0, 0.0], [5.0, 0.0],
                                            [5.0, 4.0]]))
        out = wkb_buffer(wkb, d, qs)
        want = 2 * d * 9 + _adisk(d, qs) + _adisk(d, qs) / 4 - d * d
        assert out[1] == pytest.approx(want, abs=1e-10)

    def test_square_dilate(self):
        wkb = G.encode_polygon(sq(0, 0, 10)[0:1])
        out = wkb_buffer(wkb, 1.0, quadsegs=6)
        assert out[1] == pytest.approx(100 + 40 + _adisk(1.0, 6), abs=1e-10)

    def test_square_erode(self):
        wkb = G.encode_polygon(sq(0, 0, 10)[0:1])
        out = wkb_buffer(wkb, -2.0, quadsegs=6)
        assert out[1] == pytest.approx(36.0, abs=1e-10)

    def test_square_erode_away(self):
        wkb = G.encode_polygon(sq(0, 0, 3)[0:1])
        assert wkb_buffer(wkb, -1.6) is None

    def test_quadseg1_is_l1_diamond(self):
        wkb = G.encode_point(0.0, 0.0)
        out = wkb_buffer(wkb, 2.0, quadsegs=1)
        assert out[1] == pytest.approx(8.0, abs=1e-12)  # 2d² diamond

    def test_holed_dilate_shrinks_hole(self):
        outer = sq(0, 0, 10)[0]
        hole = sq(4, 4, 2)[0]
        wkb = G.encode_polygon([outer, hole])
        d, qs = 0.5, 30
        out = wkb_buffer(wkb, d, qs)
        want = (100 + 40 * d + _adisk(d, qs)) - (2 - 2 * d) ** 2
        assert out[1] == pytest.approx(want, abs=1e-10)

    def test_holed_dilate_fills_hole(self):
        outer = sq(0, 0, 10)[0]
        hole = sq(4, 4, 2)[0]
        wkb = G.encode_polygon([outer, hole])
        d, qs = 1.5, 30
        out = wkb_buffer(wkb, d, qs)
        want = 100 + 40 * d + _adisk(d, qs)  # hole eroded away entirely
        assert out[1] == pytest.approx(want, abs=1e-10)

    def test_concave_reflex_correction(self):
        ring = np.array([[0, 0], [10, 0], [10, 3], [3, 3], [3, 7],
                         [10, 7], [10, 10], [0, 10], [0, 0]], dtype=float)
        d, qs = 0.5, 30
        out = wkb_buffer(G.encode_polygon([ring]), d, qs)
        want = 72 + 54 * d + _adisk(d, qs) + 2 * (_adisk(d, qs) / 4 - d * d)
        assert out[1] == pytest.approx(want, abs=1e-10)

    def test_dilate_then_erode_roundtrip(self):
        # opening/closing sanity: (P ⊕ D) ⊖ D ⊇ P for convex P, equal here
        wkb = G.encode_polygon(sq(0, 0, 10)[0:1])
        dil = wkb_buffer(wkb, 1.0, quadsegs=4)
        back = wkb_buffer(dil[0], -1.0, quadsegs=4)
        assert back[1] == pytest.approx(100.0, rel=1e-6)
