"""Convex hull, Douglas-Peucker, hstore, pixel algebra, color relief."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.functions import ogr_sql as OS
from gdal_spark.raster import algebra as AL
from gdal_spark.raster import model as M


def test_convex_hull():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3], [3, 1]])
    hull = G.convex_hull(pts)
    # hull is the square, closed, CCW
    assert len(hull) == 5
    assert G.ring_area(hull) == 16.0
    _, _, a = G.ring_centroid_area(hull)
    assert a > 0  # CCW


def test_convex_hull_collinear():
    pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]])
    hull = G.convex_hull(pts)
    assert len(hull) <= 3  # degenerate line


def test_simplify_dp():
    x = np.linspace(0, 10, 101)
    line = np.column_stack([x, np.zeros_like(x)])
    line[50, 1] = 2.0  # one spike
    out = G.simplify_dp(line, 0.5)
    # keeps endpoints + the spike (and its shoulders where deviation > tol)
    assert len(out) < 10
    assert any((p == [5.0, 2.0]).all() for p in out)
    # tolerance above the spike removes it
    out2 = G.simplify_dp(line, 3.0)
    assert len(out2) == 2


def test_hstore(spark):
    df = spark.createDataFrame([("a=>1,b=>two",), ("x=>9",)], "props string")
    got = df.select(OS.hstore_get_value(F.col("props"), "b").alias("v")).collect()
    assert [r["v"] for r in got] == ["two", None]


def test_map_and_zip_pixels(spark):
    meta = M.RasterMeta("p", 40, 30, block=16)
    arr = (np.arange(1200).reshape(30, 40) % 100).astype(np.uint8)
    tiles = M.from_array(spark, arr, meta)
    dbl, om = AL.map_pixels(tiles, meta, "dbl", lambda a: a * 2 % 256)
    np.testing.assert_array_equal(M.to_array(dbl, om), (arr * 2 % 256))
    summed, om2 = AL.zip_pixels(tiles, dbl, meta, "sum",
                                lambda a, b: (a.astype(int) + b) % 256)
    np.testing.assert_array_equal(
        M.to_array(summed, om2), (arr.astype(int) + arr * 2 % 256) % 256)


def test_color_relief(spark):
    meta = M.RasterMeta("e", 20, 10, dtype="float64", block=8)
    arr = np.linspace(0, 100, 200).reshape(10, 20)
    tiles = M.from_array(spark, arr, meta)
    ramp = [(0.0, 0, 0, 255), (50.0, 0, 255, 0), (100.0, 255, 0, 0)]
    out, om = AL.color_relief(tiles, meta, "cr", ramp)
    r = M.to_array(out, om, band=0).astype(float)
    g = M.to_array(out, om, band=1).astype(float)
    b = M.to_array(out, om, band=2).astype(float)
    # elevation 25 → halfway blue→green
    i, j = np.unravel_index(np.argmin(np.abs(arr - 25.0)), arr.shape)
    assert b[i, j] == pytest.approx(np.floor(np.interp(arr[i, j], [0, 50, 100],
                                                       [255, 0, 0]) + 0.5))
    assert g[i, j] == pytest.approx(np.floor(np.interp(arr[i, j], [0, 50, 100],
                                                       [0, 255, 0]) + 0.5))
    # exact ramp points
    i0 = np.unravel_index(np.argmin(np.abs(arr - 100.0)), arr.shape)
    assert r[i0] == 255 and g[i0] == 0


def test_geometry_length_measure():
    """get_Length: linestring polyline length; 0 for polygons/points."""
    import numpy as np
    from gdal_spark.functions import geometry as G
    ls = G.encode_linestring(np.array([[0.0, 0.0], [3.0, 4.0], [3.0, 8.0]]))
    assert G.geometry_length(ls) == 9.0
    sq = G.encode_polygon([np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]],
                                    dtype=float)])
    assert G.geometry_length(sq) == 0.0
    assert G.geometry_length(G.encode_point(1.0, 2.0)) == 0.0


def test_ci_like_escape_uppercase(spark):
    """ESCAPE char must not be lowercased away: '100X%' ESCAPE 'X' matches
    the literal '100%' only."""
    from gdal_spark.functions import ogr_sql as O
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("100%",), ("100abc",), ("100%x",)], "s string")
    got = sorted(r["s"] for r in
                 df.filter(O.ci_like(F.col("s"), "100X%", escape="X")).collect())
    assert got == ["100%"]
    # case-insensitivity still applies to the payload around the escape
    df2 = spark.createDataFrame([("ABC100%",)], "s string")
    assert df2.filter(O.ci_like(F.col("s"), "aBc100X%", escape="X")).count() == 1
    assert df2.filter(O.ci_like(F.col("s"), "aBc10_X%", escape="X")).count() == 1


def test_ogr_style_null(spark):
    from gdal_spark.functions import ogr_sql as O
    df = spark.createDataFrame([(1,)], "id long")
    row = df.select(O.ogr_style().alias("OGR_STYLE")).collect()[0]
    assert row["OGR_STYLE"] is None


def test_rectilinear_union_and_buffer():
    import numpy as np
    from gdal_spark.functions import geometry as G

    def rect(x0, y0, x1, y1):
        return G.encode_polygon([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)])

    # overlapping L-union: area = 100 + 100 - 25
    wkb, area = G.rectilinear_union([rect(0, 0, 10, 10), rect(5, 5, 15, 15)])
    assert area == 175.0
    assert G.polygon_area(wkb) == 175.0
    # disjoint -> MultiPolygon of 2
    wkb2, area2 = G.rectilinear_union([rect(0, 0, 10, 10), rect(20, 0, 30, 10)])
    assert area2 == 200.0 and len(G.decode_polygons(wkb2)) == 2
    # ring union enclosing a hole: frame of 4 rects
    frame = [rect(0, 0, 10, 2), rect(0, 8, 10, 10),
             rect(0, 0, 2, 10), rect(8, 0, 10, 10)]
    wkb3, area3 = G.rectilinear_union(frame)
    polys = G.decode_polygons(wkb3)
    assert area3 == 100.0 - 36.0
    assert len(polys) == 1 and len(polys[0]) == 2  # exterior + hole

    buf = G.buffer_point(10.0, 20.0, 2.0, quadsegs=30)
    rings = G.decode_polygons(buf)[0]
    assert len(rings[0]) == 121  # 4*30 vertices + closing point
    d = np.hypot(rings[0][:, 0] - 10.0, rings[0][:, 1] - 20.0)
    assert np.allclose(d, 2.0)


# ---------------------------------------------------------------------------
# constructive ops round-out (Boundary / PointOnSurface /
# SimplifyPreserveTopology / UnionCascaded)
# ---------------------------------------------------------------------------

def test_boundary_kinds():
    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    hole = np.array([[4.0, 4], [6, 4], [6, 6], [4, 6], [4, 4]])
    b = G.wkb_boundary(G.encode_polygon([sq]))
    assert (b[1] if b[0] == 1 else b[4]) == G.WKB_LINESTRING
    assert G.geometry_length(b) == pytest.approx(40.0)
    b2 = G.wkb_boundary(G.encode_polygon([sq, hole]))
    assert (b2[1] if b2[0] == 1 else b2[4]) == G.WKB_MULTILINESTRING
    assert G.geometry_length(b2) == pytest.approx(48.0)
    # open line → endpoints; closed line → empty; point → empty
    line = G.encode_linestring(np.array([[0.0, 0], [5, 0], [5, 5]]))
    bl = G.wkb_boundary(line)
    assert (bl[1] if bl[0] == 1 else bl[4]) == G.WKB_MULTIPOINT
    ring = G.encode_linestring(np.array([[0.0, 0], [5, 0], [0, 5], [0, 0]]))
    assert G.wkb_boundary(ring) is None
    assert G.wkb_boundary(G.encode_point(1.0, 1.0)) is None


def test_point_on_surface_concave_and_holed():
    # concave C shape: envelope centre is OUTSIDE the polygon
    c = np.array([[0.0, 0], [10, 0], [10, 2], [2, 2], [2, 8], [10, 8],
                  [10, 10], [0, 10], [0, 0]])
    x, y = G.point_on_surface(G.encode_polygon([c]))
    assert G.py_point_in_ring(x, y, c)
    # holed square: centre falls in the hole, widest interval avoids it
    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    hole = np.array([[4.0, 4], [6, 4], [6, 6], [4, 6], [4, 4]])
    x, y = G.point_on_surface(G.encode_polygon([sq, hole]))
    assert G.py_point_in_ring(x, y, sq)
    assert not G.py_point_in_ring(x, y, hole)


def test_simplify_preserve_topology_safe_equals_dp():
    ring = np.array([[0.0, 0], [5, 0.1], [10, 0], [10, 10], [0, 10], [0, 0]])
    dp = G.simplify_dp(ring, 0.5)
    tp = G.simplify_preserve_topology(ring, 0.5)
    assert np.array_equal(dp, tp)


def test_simplify_preserve_topology_guards_collapse():
    # thin sliver: plain DP at huge tolerance collapses to a degenerate
    # ring; the topology-preserving variant re-inserts vertices
    ring = np.array([[0.0, 0], [10, 0], [10, 0.5], [0, 0.5], [0, 0]])
    tp = G.simplify_preserve_topology(ring, 5.0)
    assert abs(G._ring_area_signed(tp)) > 0.0
    from gdal_spark.functions.geometry import _ring_self_intersects
    assert not _ring_self_intersects(tp)


def test_union_cascaded_overlapping():
    from gdal_spark.functions.clipping import wkb_union_cascaded
    sqs = [G.encode_polygon([np.array([[i * 5.0, 0], [i * 5.0 + 10, 0],
                                       [i * 5.0 + 10, 10], [i * 5.0, 10],
                                       [i * 5.0, 0]])]) for i in range(3)]
    out = wkb_union_cascaded(sqs)
    assert out[1] == pytest.approx(200.0)  # 20x10 merged strip


def test_bit2grayscale_overview(spark):
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import pyramid as PY
    meta = RM.RasterMeta("b1", 4, 4, gt=(0, 1, 0, 0, 0, 1),
                         dtype="uint8", nodata=None, block=4)
    arr = np.array([[1, 1, 0, 0], [1, 1, 0, 1], [0, 0, 1, 1], [0, 0, 1, 1]],
                   dtype=np.uint8)
    tiles = RM.from_array(spark, arr, meta)
    out, _ = PY.overview_level(tiles, meta, "b1_ov",
                               method="average_bit2grayscale")
    got = np.frombuffer(bytes(out.collect()[0].data),
                        dtype=np.uint8).reshape(2, 2)
    assert got[0, 0] == 255          # all-ones box
    assert got[0, 1] == (255 + 2) // 4   # one of four set, reference rounding
    assert got[1, 1] == 255
    out2, _ = PY.overview_level(tiles, meta, "b1_ov2",
                                method="average_bit2grayscale_miniswhite")
    got2 = np.frombuffer(bytes(out2.collect()[0].data),
                        dtype=np.uint8).reshape(2, 2)
    assert got2[0, 0] == 0 and got2[1, 1] == 0
    assert got2[1, 0] == 255


# --- ogr_geom.py golden ports (autotest/ogr/ogr_geom.py) ---

def test_ogr_geom_area_goldens():
    """ogr_geom_area / _geometrycollection / _linearring_big_offset:
    holed multipolygon area 99.5; collections sum surface members only;
    rings offset by 1e11 keep exact area (the #3556 stability fix)."""
    import numpy as np

    from gdal_spark.functions import geometry as G
    w = G.wkb_from_wkt(
        "MULTIPOLYGON( ((0 0,1 1,1 0,0 0)),"
        "((0 0,10 0, 10 10, 0 10),(1 1,1 2,2 2,2 1)) )")
    assert abs(G.polygon_area(w) - 99.5) <= 1e-11
    w = G.wkb_from_wkt(
        "GEOMETRYCOLLECTION( POLYGON((0 0,1 1,1 0,0 0)),"
        " MULTIPOLYGON(((0 0,1 1,1 0,0 0))), LINESTRING(0 0,1 1),"
        " POINT(0 0), GEOMETRYCOLLECTION EMPTY )")
    assert abs(G.polygon_area(w) - 1.0) <= 1e-11
    B = 100000000000.0
    ring = np.array([(B, B), (B + 10, B), (B + 10, B + 10),
                     (B, B + 10), (B, B)])
    assert abs(G.ring_area(ring) - 100.0) <= 1e-11


def test_ogr_geom_length_goldens():
    """ogr_geom_length_point / _multilinestring / _geometrycollection:
    points measure 0; collections sum curve members only (the polygon
    member contributes nothing)."""
    from gdal_spark.functions import geometry as G
    assert G.geometry_length(G.wkb_from_wkt("POINT(0 0)")) == 0.0
    w = G.wkb_from_wkt("MULTILINESTRING((0 0,0 1),(0 0,0 1))")
    assert abs(G.geometry_length(w) - 2.0) <= 1e-11
    w = G.wkb_from_wkt(
        "GEOMETRYCOLLECTION( POLYGON((0 0,0 1,1 1,1 0,0 0)),"
        " MULTILINESTRING((0 0,0 1),(0 0,0 1)), LINESTRING(0 0,0 1),"
        " LINESTRING(0 0,0 1), POINT(0 0), GEOMETRYCOLLECTION EMPTY )")
    assert abs(G.geometry_length(w) - 4.0) <= 1e-11


def test_geometrycollection_wkt_roundtrip():
    """GEOMETRYCOLLECTION WKT <-> WKB round-trip, including EMPTY."""
    from gdal_spark.functions import geometry as G
    wkt = "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0,1 1))"
    assert G.wkt_from_wkb(G.wkb_from_wkt(wkt)) == wkt
    assert G.wkt_from_wkb(G.wkb_from_wkt("GEOMETRYCOLLECTION EMPTY")) \
        == "GEOMETRYCOLLECTION EMPTY"
