"""WKB codec + ray-casting PIP vs hand-computed expectations.

Exercises the reference algorithm's cases (ogrlinearring.cpp:471-533):
convex, concave, interior ring (hole), multipolygon, envelope reject.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import geometry as G

SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
HOLE = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
# concave "C" shape
CONCAVE = np.array(
    [[0, 0], [10, 0], [10, 3], [3, 3], [3, 7], [10, 7], [10, 10], [0, 10], [0, 0]],
    dtype=float,
)


def test_wkb_point_roundtrip():
    wkb = G.encode_point(1.5, -2.25)
    assert G.decode_point(wkb) == (1.5, -2.25)


def test_wkb_polygon_roundtrip():
    wkb = G.encode_polygon([SQUARE, HOLE])
    polys = G.decode_polygons(wkb)
    assert len(polys) == 1
    assert len(polys[0]) == 2
    np.testing.assert_allclose(polys[0][0], SQUARE)
    np.testing.assert_allclose(polys[0][1], HOLE)


def test_wkb_closes_open_ring():
    open_ring = SQUARE[:-1]
    polys = G.decode_polygons(G.encode_polygon([open_ring]))
    np.testing.assert_allclose(polys[0][0], SQUARE)


def test_wkb_multipolygon_roundtrip():
    wkb = G.encode_multipolygon([[SQUARE], [CONCAVE + 100.0]])
    polys = G.decode_polygons(wkb)
    assert len(polys) == 2
    np.testing.assert_allclose(polys[1][0], CONCAVE + 100.0)


def test_area():
    assert G.polygon_area(G.encode_polygon([SQUARE])) == pytest.approx(100.0)
    assert G.polygon_area(G.encode_polygon([SQUARE, HOLE])) == pytest.approx(96.0)
    assert G.polygon_area(G.encode_polygon([CONCAVE])) == pytest.approx(72.0)


def test_envelope():
    env = G.polygon_envelope(G.encode_polygon([CONCAVE]))
    assert env == (0.0, 0.0, 10.0, 10.0)


def test_py_point_in_ring_scalar():
    assert G.py_point_in_ring(5, 5, SQUARE)
    assert not G.py_point_in_ring(15, 5, SQUARE)
    assert not G.py_point_in_ring(-1, 5, SQUARE)
    # concave notch: (5,5) is inside the notch => outside polygon
    assert not G.py_point_in_ring(5, 5, CONCAVE)
    assert G.py_point_in_ring(5, 1, CONCAVE)
    assert G.py_point_in_ring(1, 5, CONCAVE)


def test_prepared_polygons_with_hole():
    prep = G.PreparedPolygons(
        ids=[7, 8],
        wkbs=[G.encode_polygon([SQUARE, HOLE]), G.encode_polygon([CONCAVE])],
    )
    px = np.array([5.0, 5.0, 1.0, 15.0, 5.0, 4.5])
    py = np.array([1.0, 5.0, 5.0, 5.0, 9.0, 4.5])
    pi, gi = prep.contains_batch(px, py)
    pairs = {(int(a), int(prep.ids[b])) for a, b in zip(pi, gi)}
    # pt0 (5,1): in square, in concave. pt1 (5,5): inside square's hole -> out
    #   of poly 7; in concave notch -> out of poly 8.
    # pt2 (1,5): both. pt3 (15,5): neither (bbox reject).
    # pt4 (5,9): both. pt5 (4.5,4.5): inside hole -> not 7; notch -> not 8.
    assert pairs == {(0, 7), (0, 8), (2, 7), (2, 8), (4, 7), (4, 8)}


def test_prepared_multipolygon():
    far = SQUARE + 100.0
    prep = G.PreparedPolygons(ids=[1], wkbs=[G.encode_multipolygon([[SQUARE], [far]])])
    pi, gi = prep.contains_batch(np.array([5.0, 105.0, 50.0]), np.array([5.0, 105.0, 50.0]))
    assert set(pi.tolist()) == {0, 1}


def test_raycast_matches_scalar_on_random_points():
    rng = np.random.default_rng(42)
    px = rng.uniform(-2, 12, 500)
    py = rng.uniform(-2, 12, 500)
    prep = G.PreparedPolygons(ids=[0], wkbs=[G.encode_polygon([CONCAVE])])
    pi, _ = prep.contains_batch(px, py)
    got = set(pi.tolist())
    expected = {i for i in range(500) if G.py_point_in_ring(px[i], py[i], CONCAVE)}
    assert got == expected


def test_wkt_codec_roundtrip():
    """Full WKT emission + parser (OGR exportToWkt/createFromWkt) across
    all six geometry types; %.15g prints integral coords bare."""
    cases = [
        "POINT (30 10.5)",
        "LINESTRING (30 10,10 30,40 40)",
        "POLYGON ((30 10,40 40,20 40,10 20,30 10))",
        "POLYGON ((35 10,45 45,15 40,10 20,35 10),(20 30,35 35,30 20,20 30))",
        "MULTIPOINT (10 40,40 30,20 20,30 10)",
        "MULTILINESTRING ((10 10,20 20,10 40),(40 40,30 30,40 20,30 10))",
        "MULTIPOLYGON (((30 20,45 40,10 40,30 20)),"
        "((15 5,40 10,10 20,5 10,15 5)))",
    ]
    for wkt in cases:
        wkb = G.wkb_from_wkt(wkt)
        assert G.wkt_from_wkb(wkb) == wkt, wkt
    # nested MULTIPOINT variant parses to the same geometry
    a = G.wkb_from_wkt("MULTIPOINT ((10 40),(40 30))")
    b = G.wkb_from_wkt("MULTIPOINT (10 40,40 30)")
    assert a == b
    # decimals survive %.15g
    assert G.wkt_from_wkb(G.wkb_from_wkt("POINT (1.25 -2.75)")) == \
        "POINT (1.25 -2.75)"


def test_wkt_empty_point_and_linestring():
    """Round-2 ADVICE regression: POINT EMPTY / LINESTRING EMPTY used to
    fall through to the coord parser and raise IndexError."""
    pt = G.wkb_from_wkt("POINT EMPTY")
    x, y = G.decode_point(pt)
    assert np.isnan(x) and np.isnan(y)
    ls = G.wkb_from_wkt("LINESTRING EMPTY")
    assert len(G.decode_linestring(ls)) == 0
    # multi kinds already worked; keep them covered
    assert G.wkb_from_wkt("MULTIPOINT EMPTY") is not None
    assert G.wkb_from_wkt("POLYGON EMPTY") is not None
