"""Z (2.5-D) + ISO curve geometry tests.

Ports of the reference's own curve cases from autotest/ogr/ogr_geom.py
(ogr_geom_circularstring / compoundcurve / curvepolygon / multicurve /
multisurface) — expected WKTs, stroking coordinates, lengths, areas, and
envelopes are the reference's own expectations.
"""

import math

import numpy as np
import pytest

from gdal_spark.functions import curves as C
from gdal_spark.functions import geometry as G


ROUNDTRIP_WKTS = [
    "CIRCULARSTRING (0 0,1 1,1 -1)",
    "CIRCULARSTRING Z (0 0 10,1 1 20,2 0 30)",
    "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1))",
    "COMPOUNDCURVE ((0 0,0 10))",
    "COMPOUNDCURVE Z (CIRCULARSTRING Z (0 0 10,1 1 20,2 0 30),(2 0 30,0 0 10))",
    "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1),(1 -1,0 0))",
    "CURVEPOLYGON ((0 0,0 10,10 10,10 0,0 0))",
    "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))",
    "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),(2 0,0 0)))",
    "MULTICURVE ((0 0,1 1))",
    "MULTICURVE (CIRCULARSTRING (0 0,1 1,1 -1),(0 0,1 1))",
    "MULTICURVE (COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1)))",
    "MULTISURFACE (((0 0,0 10,10 10,10 0,0 0)))",
    "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0)))",
    "POINT (1 2 3)",
    "LINESTRING (1 2 3,4 5 6)",
    "POLYGON ((0 0 1,0 1 1,1 1 1,0 0 1))",
    "MULTIPOINT (1 2 3,4 5 6)",
    "MULTILINESTRING ((1 2 3,4 5 6))",
    "MULTIPOLYGON (((0 0 1,0 1 1,1 1 1,0 0 1)))",
    "GEOMETRYCOLLECTION (CIRCULARSTRING (0 0,1 1,1 -1))",
    "GEOMETRYCOLLECTION (POINT (1 2 3))",
    "CIRCULARSTRING EMPTY",
    "COMPOUNDCURVE EMPTY",
    "CURVEPOLYGON EMPTY",
    "MULTICURVE EMPTY",
    "MULTISURFACE EMPTY",
]


@pytest.mark.parametrize("wkt", ROUNDTRIP_WKTS)
def test_wkt_wkb_roundtrip(wkt):
    g = C.geom_from_wkt(wkt)
    assert C.wkt_from_geom(g) == wkt
    g2 = C.decode_geom(C.encode_geom(g))
    assert C.wkt_from_geom(g2) == wkt


def test_geometry_py_delegation():
    # the 2-D module's public WKT codec routes extended types through here
    for wkt in ["CIRCULARSTRING (0 0,1 1,1 -1)",
                "POINT (1 2 3)",
                "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"]:
        wkb = G.wkb_from_wkt(wkt)
        assert G.wkt_from_wkb(wkb) == wkt


def test_wkb_25d_bit_and_iso_imports():
    g = C.geom_from_wkt("POINT (1 2 3)")
    wkb = C.encode_geom(g)
    # old-OGC export: high bit set
    assert int.from_bytes(wkb[1:5], "little") == 0x80000001
    # ISO import spelling accepted too
    iso = wkb[:1] + (1001).to_bytes(4, "little") + wkb[5:]
    assert C.wkt_from_geom(C.decode_geom(iso)) == "POINT (1 2 3)"
    # curve Z types are ISO-coded
    cs = C.encode_geom(C.geom_from_wkt("CIRCULARSTRING Z (0 0 1,1 1 2,2 0 3)"))
    assert int.from_bytes(cs[1:5], "little") == 1008


def test_2d_kernels_accept_z_wkb():
    # planar kernels drop Z, mirroring the reference's 2-D operations
    wkb = G.wkb_from_wkt("POLYGON ((0 0 5,4 0 5,4 4 5,0 4 5,0 0 5))")
    assert G.polygon_area(wkb) == pytest.approx(16.0)
    assert G.geometry_envelope(wkb) == pytest.approx((0, 0, 4, 4))
    ls = G.wkb_from_wkt("LINESTRING (0 0 1,3 4 2)")
    assert G.geometry_length(ls) == pytest.approx(5.0)


# --- stroking goldens (autotest ogr_geom.py ogr_geom_circularstring) ------

STROKE_CASES = [
    ("CIRCULARSTRING (0 0,1 1,1 -1)",
     "LINESTRING (0 0,0.218168517531969 0.623489801858729,"
     "0.777479066043687 0.974927912181831,1.433883739117561 "
     "0.900968867902435,1.900968867902463 0.433883739117562,"
     "1.974927912181821 -0.222520933956316,1.623489801858719 "
     "-0.78183148246804,1 -1)"),
    ("CIRCULARSTRING (0 0,1 0,0 0)",
     "LINESTRING (0 0,0.116977778440514 -0.321393804843282,"
     "0.413175911166547 -0.49240387650611,0.75 -0.433012701892224,"
     "0.969846310392967 -0.171010071662835,0.969846310392967 "
     "0.171010071662835,0.75 0.433012701892224,0.413175911166547 "
     "0.49240387650611,0.116977778440514 0.321393804843282,0 0)"),
    ("CIRCULARSTRING (0 0,1 1,2 2)", "LINESTRING (0 0,1 1,2 2)"),
]


@pytest.mark.parametrize("in_wkt,exp_wkt", STROKE_CASES)
def test_stroking_goldens(in_wkt, exp_wkt):
    lin = C.geom_to_linear(C.geom_from_wkt(in_wkt), 45.0)
    exp = C.geom_from_wkt(exp_wkt)
    assert lin.coords.shape == exp.coords.shape
    assert np.abs(lin.coords - exp.coords).max() < 1e-8


def test_stroking_z_interpolation():
    lin = C.geom_to_linear(C.geom_from_wkt(
        "CIRCULARSTRING (0 0 1,1 0 2,0 0 1)"), 45.0)
    exp = C.geom_from_wkt(
        "LINESTRING (0 0 1,0.116977778440514 -0.321393804843282 1,"
        "0.413175911166547 -0.49240387650611 1,0.75 -0.433012701892224 1,"
        "0.969846310392967 -0.171010071662835 1,0.969846310392967 "
        "0.171010071662835 1,0.75 0.433012701892224 1,0.413175911166547 "
        "0.49240387650611 1,0.116977778440514 0.321393804843282 1,0 0 1)")
    assert np.abs(lin.coords - exp.coords).max() < 1e-8


def test_stroking_direction_symmetry():
    a = C.geom_to_linear(C.geom_from_wkt("CIRCULARSTRING (0 0,1.2 1,2 0)"))
    b = C.geom_to_linear(C.geom_from_wkt("CIRCULARSTRING (2 0,1.2 1,0 0)"))
    assert np.array_equal(a.coords, b.coords[::-1])


def test_compoundcurve_stroke_concat():
    lin = C.geom_to_linear(C.geom_from_wkt(
        "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,1 -1),(1 -1,0 0))"), 45.0)
    assert lin.kind == G.WKB_LINESTRING
    # 8 stroked arc points + the straight tail (join point deduped)
    assert len(lin.coords) == 9
    assert tuple(lin.coords[-1]) == (0.0, 0.0)


def test_curvepolygon_to_polygon_and_multi():
    p = C.geom_to_linear(C.geom_from_wkt(
        "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"), 45.0)
    assert p.kind == G.WKB_POLYGON and len(p.parts) == 1
    ms = C.geom_to_linear(C.geom_from_wkt(
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0)))"), 45.0)
    assert ms.kind == G.WKB_MULTIPOLYGON
    mc = C.geom_to_linear(C.geom_from_wkt(
        "MULTICURVE (CIRCULARSTRING (0 0,1 1,1 -1),(0 0,1 1))"), 45.0)
    assert mc.kind == G.WKB_MULTILINESTRING and len(mc.parts) == 2


# --- measures --------------------------------------------------------------

def test_circularstring_length_envelope():
    g = C.geom_from_wkt("CIRCULARSTRING (0 0,1 1,1 -1)")
    assert C.curve_length(g) == pytest.approx(1.5 * math.pi, abs=1e-8)
    assert C.curve_envelope(g) == pytest.approx((0.0, 2.0, -1.0, 1.0),
                                                abs=1e-8)


def test_full_circle_length():
    for wkt in ["CIRCULARSTRING (0 0,1 0,0 0)",
                "CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,0.0 0.0)",
                "CIRCULARSTRING (0 0,0.5 -0.5,1.0 0.0,0.5 0.5,0.0 0.0)"]:
        assert C.curve_length(C.geom_from_wkt(wkt)) == pytest.approx(
            math.pi, abs=1e-8)


def test_collinear_circularstring():
    g = C.geom_from_wkt("CIRCULARSTRING (0 0,1 1,2 2)")
    L = C.curve_length(g)
    assert L == pytest.approx(2 * math.sqrt(2), abs=1e-8)
    assert C.curve_value(g, L / 4) == pytest.approx((0.5, 0.5), abs=1e-8)
    assert C.curve_value(g, 3 * L / 4) == pytest.approx((1.5, 1.5), abs=1e-8)


def test_value_along_arc():
    g = C.geom_from_wkt("CIRCULARSTRING (0 0,1 1,1 -1)")
    L = C.curve_length(g)
    cases = [(-1, (0, 0)), (0, (0, 0)),
             (L / 6, (0.292893218813453, 0.707106781186548)),
             (L / 3, (1, 1)),
             (L / 2, (1.707106781186547, 0.707106781186547)),
             (2 * L / 3, (2, 0)), (L, (1, -1)), (L + 1, (1, -1))]
    for dist, exp in cases:
        v = C.curve_value(g, dist)
        assert v[0] == pytest.approx(exp[0], abs=1e-8)
        assert v[1] == pytest.approx(exp[1], abs=1e-8)


def test_curve_areas():
    # full circle r=0.5 (3-point spelling)
    assert C.curve_area(C.geom_from_wkt(
        "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))")) == pytest.approx(
        math.pi * 0.25, abs=1e-10)
    # full circle r=0.5 (5-point spelling)
    assert C.curve_area(C.geom_from_wkt(
        "CURVEPOLYGON (CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,"
        "0.0 0.0))")) == pytest.approx(math.pi * 0.25, abs=1e-10)
    # semicircle + diameter (compound ring, convex path)
    assert C.curve_area(C.geom_from_wkt(
        "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),"
        "(2 0,0 0)))")) == pytest.approx(math.pi / 2, abs=1e-8)
    # linear ring inside a curve polygon
    assert C.curve_area(C.geom_from_wkt(
        "CURVEPOLYGON ((0 0,0 10,10 10,10 0,0 0))")) == pytest.approx(100.0)
    # exterior minus circular hole
    assert C.curve_area(C.geom_from_wkt(
        "CURVEPOLYGON ((0 0,0 10,10 10,10 0,0 0),"
        "CIRCULARSTRING (4 5,6 5,4 5))")) == pytest.approx(
        100.0 - math.pi, abs=1e-10)
    # multisurface sums members
    assert C.curve_area(C.geom_from_wkt(
        "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0)),"
        "((0 0,0 1,1 1,1 0,0 0)))")) == pytest.approx(
        math.pi * 0.25 + 1.0, abs=1e-10)


def test_nonconvex_curve_ring_strokes():
    # concave compound ring falls back to stroked area
    wkt = ("CURVEPOLYGON (COMPOUNDCURVE ((0 0,2 0,2 2,1 1,0 2,0 0)))")
    area = C.curve_area(C.geom_from_wkt(wkt))
    assert area == pytest.approx(3.0, abs=1e-8)


# --- segmentize ------------------------------------------------------------

def test_segmentize_full_circle():
    g = C.geom_from_wkt(
        "CIRCULARSTRING (0 0,0.5 0.5,1.0 0.0,0.5 -0.5,0.0 0.0)")
    out = C.circularstring_segmentize(g.coords, False, 0.5)
    exp = C.geom_from_wkt(
        "CIRCULARSTRING (0 0,0.146446609406726 0.353553390593274,0.5 0.5,"
        "0.853553390593274 0.353553390593274,1 0,0.853553390593274 "
        "-0.353553390593274,0.5 -0.5,0.146446609406726 -0.353553390593274,"
        "0 0)")
    assert np.abs(out - exp.coords).max() < 1e-8
    # length preserved
    g2 = C.Geom(C.WKB_CIRCULARSTRING, False, out)
    assert C.curve_length(g2) == pytest.approx(math.pi, abs=1e-8)


def test_segmentize_symmetry_binary_exact():
    g1 = C.geom_from_wkt("CIRCULARSTRING (0 0,1.2 1,2 0)")
    g2 = C.geom_from_wkt("CIRCULARSTRING (2 0,1.2 1,0 0)")
    o1 = C.circularstring_segmentize(g1.coords, False, 0.25)
    o2 = C.circularstring_segmentize(g2.coords, False, 0.25)
    assert np.array_equal(o1, o2[::-1])


def test_segmentize_collinear_z():
    g = C.geom_from_wkt("CIRCULARSTRING (0 0 1,1 1 2,2 2 1)")
    out = C.circularstring_segmentize(g.coords, True, 0.5)
    exp = C.geom_from_wkt(
        "CIRCULARSTRING Z (0 0 1,0.166666666666667 0.166666666666667 "
        "1.166666666666667,0.333333333333333 0.333333333333333 "
        "1.333333333333333,0.5 0.5 1.5,0.666666666666667 0.666666666666667 "
        "1.666666666666667,0.833333333333333 0.833333333333333 "
        "1.833333333333333,1 1 2,1.166666666666667 1.166666666666667 "
        "1.833333333333333,1.333333333333333 1.333333333333333 "
        "1.666666666666667,1.5 1.5 1.5,1.666666666666667 1.666666666666667 "
        "1.333333333333333,1.833333333333333 1.833333333333333 "
        "1.166666666666667,2 2 1)")
    assert np.abs(out - exp.coords).max() < 1e-8


# --- misc ------------------------------------------------------------------

def test_force_2d():
    wkb = C.encode_geom(C.geom_from_wkt("POINT (1 2 3)"))
    assert G.wkt_from_wkb(C.wkb_force_2d(wkb)) == "POINT (1 2)"
    wkb = C.encode_geom(C.geom_from_wkt(
        "CURVEPOLYGON (CIRCULARSTRING Z (0 0 1,1 0 2,0 0 1))"))
    assert G.wkt_from_wkb(C.wkb_force_2d(wkb)) == \
        "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))"


def test_geom_end_walks_z_and_curves():
    # collection splitting must skip Z/curve members correctly
    coll = C.encode_geom(C.geom_from_wkt(
        "GEOMETRYCOLLECTION (POINT (1 2 3),CIRCULARSTRING (0 0,1 1,1 -1),"
        "POINT (9 9))"))
    parts = G.decode_collection(coll)
    assert len(parts) == 3
    assert G.wkt_from_wkb(parts[2]) == "POINT (9 9)"


def test_stealth_hidden_bits_roundtrip():
    # the stealth stroking hides the intermediate-point angle ratio in the
    # low bytes of the first/last intermediate vertex pairs
    lin = C.geom_to_linear(C.geom_from_wkt("CIRCULARSTRING (0 0,1 1,1 -1)"))
    c = lin.coords
    lo = C.get_hidden_value(c[1, 0], c[1, 1])
    hi = C.get_hidden_value(c[2, 0], c[2, 1])
    ratio = (lo | (hi << 16)) / ((1 << 32) - 2)
    assert 0.0 < ratio < 1.0
    # middle intermediates carry the 0xFFFF marker
    assert C.get_hidden_value(c[3, 0], c[3, 1]) == 0xFFFF


# --- curve re-detection (GetCurveGeometry; autotest ogr_geom.py
# ogr_geom_getcurvegeometry ports) ------------------------------------------

def _rt(wkt, step=0.0):
    g1 = C.geom_from_wkt(wkt)
    g3 = C.get_curve_geometry(C.geom_to_linear(g1, step))
    return C.wkt_from_geom(g3)


RANDOM_ARCS = [
    "CIRCULARSTRING (1 2,3 1,5 6)",
    "CIRCULARSTRING (1 -2,3 -1,5 -6)",
    "CIRCULARSTRING (-1 2,-3 1,-5 6)",
    "CIRCULARSTRING (5 6,3 1,1 2)",
    "CIRCULARSTRING (-5 6,-3 1,-1 2)",
    "CIRCULARSTRING (5 -6,3 -1,1 -2)",
    "CIRCULARSTRING (215725 -977513,872751 872597,560240 -7500)",
    "CIRCULARSTRING (-492367 816163,537838 -421954,745494 -65479)",
    "CIRCULARSTRING (543208 -865295,582257 635396,563925 -68156)",
    "CIRCULARSTRING (-481 -193,1 329,-692 -421)",
    "CIRCULARSTRING (525407 781005,710737 463833,-674365 340022)",
    "CIRCULARSTRING (743949 709309,743952 709307,743964 709298)",
    "CIRCULARSTRING (283167 -48388,536492 -197399,-449301 382451)",
]


@pytest.mark.parametrize("wkt", RANDOM_ARCS)
def test_curve_redetection_exact(wkt):
    # stroke with the stealth default, then recover the EXACT original
    # arc (hidden-alpha bits + integer rounding recovery)
    assert _rt(wkt) == wkt


def test_curve_redetection_straight_line():
    assert _rt("CIRCULARSTRING (1 2,3 4,5 6)") == "LINESTRING (1 2,3 4,5 6)"


def test_curve_redetection_large_step():
    g1 = C.geom_from_wkt("CIRCULARSTRING (0 0,1 1,2 0)")
    g3 = C.get_curve_geometry(C.geom_to_linear(g1, 15.0))
    assert g3.kind == C.WKB_CIRCULARSTRING
    c = g3.coords
    assert tuple(c[0]) == (0, 0) and tuple(c[2]) == (2, 0)
    assert abs((c[1, 0] - 1) ** 2 + c[1, 1] ** 2 - 1) < 1e-8


def test_curve_redetection_full_circles():
    # 5-point spelling recovers exactly
    wkt = "CIRCULARSTRING (0 0,0.5 -0.5,1 0,0.5 0.5,0 0)"
    assert _rt(wkt) == wkt
    # 3-point spelling becomes a 5-point circle with on-circle midpoints
    g3 = C.get_curve_geometry(C.geom_to_linear(
        C.geom_from_wkt("CIRCULARSTRING (0 0,1 0,0 0)")))
    c = g3.coords
    assert g3.kind == C.WKB_CIRCULARSTRING and len(c) == 5
    assert tuple(c[0]) == (0, 0) and tuple(c[2]) == (1, 0) \
        and tuple(c[4]) == (0, 0)
    for k in (1, 3):
        assert abs((c[k, 0] - 0.5) ** 2 + c[k, 1] ** 2 - 0.25) < 1e-12


def test_curve_redetection_curvepolygon_circles():
    for wkt in ["CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))",
                "CURVEPOLYGON (CIRCULARSTRING (0 0,0 1,0 0))",
                "CURVEPOLYGON (CIRCULARSTRING (0 0,-1 0,0 0))",
                "CURVEPOLYGON (CIRCULARSTRING (0 0,0 -1,0 0))"]:
        assert _rt(wkt, 15.0) == wkt or _rt(wkt) == wkt


def test_curve_redetection_multi_arc_and_compound():
    for wkt in [
        "CIRCULARSTRING (0 0,1 1,2 0,3 -1,4 0)",
        "CIRCULARSTRING (0 0,1 1,2 0,3 -1,4 0,5 1,6 0)",
        "COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),(2 0,3 0,4 0),"
        "CIRCULARSTRING (4 0,5 1,6 0))",
        "COMPOUNDCURVE ((-1 0,-0.5 0.5,0 0),CIRCULARSTRING (0 0,1 1,2 0),"
        "(2 0,3 0,4 0),CIRCULARSTRING (4 0,5 1,6 0),(6 0,7 0))",
    ]:
        assert _rt(wkt) == wkt


def test_curve_redetection_random_sweep():
    # the autotest's randomized sweep, seeded; the reference tolerates
    # occasional misses, we assert a high recovery rate
    import random
    random.seed(12345)
    diff = total = 0
    for _ in range(200):
        v = [random.randint(-1000, 1000) for _ in range(6)]
        if v[0] == v[4] and v[1] == v[5]:
            continue
        wkt = "CIRCULARSTRING (%d %d,%d %d,%d %d)" % tuple(v)
        lin = C.geom_to_linear(C.geom_from_wkt(wkt))
        if len(lin.coords) == 3:
            continue
        total += 1
        if C.wkt_from_geom(C.get_curve_geometry(lin)) != wkt:
            diff += 1
    assert total > 100 and diff <= total * 0.02


def test_curve_redetection_no_false_positives():
    for wkt in ["LINESTRING (0 0,0 1,0 0)",
                "POLYGON ((0 0,0 1,1 1,1 0,0 0))",
                "POLYGON ((0 0 10,0 1 10,1 1 10,1 0 10,0 0 10))"]:
        g = C.geom_from_wkt(wkt)
        assert C.wkt_from_geom(C.get_curve_geometry(g)) == wkt
