"""Per-feature geometry pipeline ops (functions/geomops.py) and their
ogr2ogr app flags — reference semantics from the per-feature translate
loop, gdal/apps/ogr2ogr.cpp:3843-3964."""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.functions import geomops as GO


def wkt(w):
    return G.wkt_from_wkb(w)


def wkb(s):
    return G.wkb_from_wkt(s)


# ---------------------------------------------------------------------------
# explode / forceTo
# ---------------------------------------------------------------------------

def test_explode_multi_and_single():
    mp = wkb("MULTIPOINT(1 2,3 4)")
    parts = GO.explode_wkb(mp)
    assert [wkt(p) for p in parts] == ["POINT (1 2)", "POINT (3 4)"]
    pt = wkb("POINT(1 2)")
    assert GO.explode_wkb(pt) == [pt]
    gc = wkb("GEOMETRYCOLLECTION(POINT(0 0),LINESTRING(0 0,1 1))")
    assert len(GO.explode_wkb(gc)) == 2


def test_force_to_promote():
    assert wkt(GO.wkb_force_to(wkb("POINT(1 2)"), "PROMOTE_TO_MULTI")) == \
        "MULTIPOINT (1 2)"
    assert wkt(GO.wkb_force_to(
        wkb("POLYGON((0 0,1 0,1 1,0 0))"), "MULTIPOLYGON")) == \
        "MULTIPOLYGON (((0 0,1 0,1 1,0 0)))"
    # multi passes through unchanged
    m = wkb("MULTIPOINT(1 2)")
    assert GO.wkb_force_to(m, "PROMOTE_TO_MULTI") == m


def test_force_to_polygon_from_closed_line():
    # forceToPolygon: closed curve with >=3 points becomes a polygon
    # (ogrgeometryfactory.cpp forceToPolygon)
    line = wkb("LINESTRING(0 0,4 0,4 4,0 0)")
    assert wkt(GO.wkb_force_to(line, "POLYGON")) == \
        "POLYGON ((0 0,4 0,4 4,0 0))"
    open_line = wkb("LINESTRING(0 0,4 0,4 4)")
    assert GO.wkb_force_to(open_line, "POLYGON") == open_line


def test_force_to_polygon_aggregates_container_rings():
    mp = wkb("MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))")
    out = GO.wkb_force_to(mp, "POLYGON")
    assert wkt(out) == "POLYGON ((0 0,1 0,1 1,0 0),(5 5,6 5,6 6,5 5))"


def test_force_to_multilinestring_from_polygon_rings():
    poly = wkb("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 1))")
    out = GO.wkb_force_to(poly, "MULTILINESTRING")
    assert wkt(out) == ("MULTILINESTRING ((0 0,4 0,4 4,0 4,0 0),"
                        "(1 1,2 1,2 2,1 1))")


def test_force_to_demote_singleton():
    mls = wkb("MULTILINESTRING((0 0,1 1))")
    assert wkt(GO.wkb_force_to(mls, "LINESTRING")) == "LINESTRING (0 0,1 1)"
    two = wkb("MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    assert GO.wkb_force_to(two, "LINESTRING") == two
    with pytest.raises(ValueError, match="unsupported -nlt"):
        GO.wkb_force_to(mls, "TIN")


# ---------------------------------------------------------------------------
# segmentize / simplify on WKB
# ---------------------------------------------------------------------------

def test_wkb_segmentize_line_and_polygon():
    line = wkb("LINESTRING(0 0,10 0)")
    out = G.decode_linestring(GO.wkb_segmentize(line, 3.0))
    # 10/3 -> 4 pieces of 2.5
    assert len(out) == 5
    assert np.allclose(np.diff(out[:, 0]), 2.5)
    poly = wkb("POLYGON((0 0,9 0,9 9,0 9,0 0))")
    rings = G.decode_polygons(GO.wkb_segmentize(poly, 4.5))[0]
    assert len(rings[0]) == 9  # each 9-long edge split in 2
    # points untouched
    pt = wkb("POINT(1 2)")
    assert GO.wkb_segmentize(pt, 1.0) == pt


def test_wkb_simplify():
    line = wkb("LINESTRING(0 0,1 0.001,2 0,5 5)")
    out = G.decode_linestring(GO.wkb_simplify(line, 0.1))
    assert len(out) == 3  # near-collinear vertex dropped
    assert np.allclose(out[0], [0, 0]) and np.allclose(out[-1], [5, 5])


# ---------------------------------------------------------------------------
# arbitrary-polygon clip
# ---------------------------------------------------------------------------

TRI = "POLYGON((0 0,10 0,0 10,0 0))"  # right triangle


def test_clip_point_and_multipoint():
    clip = wkb(TRI)
    assert GO.wkb_clip_to_polygon(wkb("POINT(1 1)"), clip) is not None
    assert GO.wkb_clip_to_polygon(wkb("POINT(9 9)"), clip) is None
    out = GO.wkb_clip_to_polygon(wkb("MULTIPOINT(1 1,9 9,2 2)"), clip)
    assert wkt(out) == "MULTIPOINT (1 1,2 2)"
    assert wkt(GO.wkb_clip_to_polygon(wkb("MULTIPOINT(1 1,9 9)"), clip)) == \
        "POINT (1 1)"


def test_clip_line_against_triangle():
    clip = wkb(TRI)
    # horizontal line at y=2 enters at x=0 and exits the hypotenuse at x=8
    out = GO.wkb_clip_to_polygon(wkb("LINESTRING(-5 2,20 2)"), clip)
    c = G.decode_linestring(out)
    assert np.allclose(c, [[0, 2], [8, 2]])
    # fully outside -> dropped
    assert GO.wkb_clip_to_polygon(wkb("LINESTRING(-5 20,20 20)"), clip) is None


def test_clip_line_multiple_runs():
    # clip polygon with a hole: the line crosses solid-hole-solid
    holed = wkb("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
    out = GO.wkb_clip_to_polygon(wkb("LINESTRING(-2 5,12 5)"), holed)
    assert wkt(out) == "MULTILINESTRING ((0 5,4 5),(6 5,10 5))"


def test_clip_polygon_general():
    clip = wkb(TRI)
    # unit square near the hypotenuse, partially inside
    sq = wkb("POLYGON((4 4,6 4,6 6,4 6,4 4))")
    out = GO.wkb_clip_to_polygon(sq, clip)
    # triangle edge x+y=10 cuts the square at (6,4)-(4,6)
    area = G.polygon_area(out)
    assert area == pytest.approx(2.0)
    assert GO.wkb_clip_to_polygon(
        wkb("POLYGON((20 20,21 20,21 21,20 20))"), clip) is None


# ---------------------------------------------------------------------------
# wrapdateline
# ---------------------------------------------------------------------------

def test_wrapdateline_line():
    # crosses the antimeridian: 170 -> -170 is a 20-degree hop
    line = wkb("LINESTRING(170 0,-170 0)")
    out = GO.wkb_wrapdateline(line)
    assert wkt(out) == "MULTILINESTRING ((170 0,180 0),(-180 0,-170 0))"
    # non-crossing passes through untouched
    plain = wkb("LINESTRING(0 0,10 0)")
    assert GO.wkb_wrapdateline(plain) == plain


def test_wrapdateline_polygon():
    # a 20-degree-wide box straddling the dateline, encoded with raw lons
    poly = wkb("POLYGON((170 -10,-170 -10,-170 10,170 10,170 -10))")
    out = GO.wkb_wrapdateline(poly)
    polys = G.decode_polygons(out)
    assert len(polys) == 2
    total = sum(abs(G.ring_area(p[0])) for p in polys)
    assert total == pytest.approx(20 * 20)
    xs = np.concatenate([p[0][:, 0] for p in polys])
    assert xs.min() >= -180.0 and xs.max() <= 180.0


# ---------------------------------------------------------------------------
# ogr2ogr flags end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture()
def squares(spark):
    """GeoJSON layer of two 10x10 squares and one multipolygon."""
    import json
    feats = []
    for fid, x0 in ((0, 0.0), (1, 20.0)):
        ring = [[x0, 0.0], [x0 + 10, 0.0], [x0 + 10, 10.0], [x0, 10.0],
                [x0, 0.0]]
        feats.append({"type": "Feature", "properties": {"fid": fid},
                      "geometry": {"type": "Polygon", "coordinates": [ring]}})
    feats.append({"type": "Feature", "properties": {"fid": 2},
                  "geometry": {"type": "MultiPolygon", "coordinates": [
                      [[[40.0, 0.0], [42.0, 0.0], [42.0, 2.0], [40.0, 0.0]]],
                      [[[50.0, 0.0], [52.0, 0.0], [52.0, 2.0], [50.0, 0.0]]],
                  ]}})
    import tempfile, os
    d = tempfile.mkdtemp()
    path = os.path.join(d, "squares.geojson")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


def test_ogr2ogr_clipsrc_polygon(spark, squares):
    from gdal_spark import apps as APP
    # triangle clip keeps only the part of square 0 under x+y<=10
    out = APP.ogr2ogr(spark, squares, clipsrc="POLYGON((0 0,10 0,0 10,0 0))")
    rows = out.collect()
    assert [r["fid"] for r in rows] == [0]
    assert G.polygon_area(bytes(rows[0]["geometry"])) == pytest.approx(50.0)


def test_ogr2ogr_explode_and_nlt(spark, squares):
    from gdal_spark import apps as APP
    out = APP.ogr2ogr(spark, squares, explodecollections=True,
                      nlt="MULTIPOLYGON")
    rows = out.orderBy("fid").collect()
    assert [r["fid"] for r in rows] == [0, 1, 2, 2]
    names = {G.wkt_from_wkb(bytes(r["geometry"])).split(" ")[0]
             for r in rows}
    assert names == {"MULTIPOLYGON"}
    with pytest.raises(ValueError, match="preserve_fid"):
        APP.ogr2ogr(spark, squares, explodecollections=True,
                    preserve_fid=True)


def test_ogr2ogr_segmentize_simplify_exclusive(spark, squares):
    from gdal_spark import apps as APP
    out = APP.ogr2ogr(spark, squares, segmentize=5.0)
    w = bytes(out.orderBy("fid").collect()[0]["geometry"])
    assert len(G.decode_polygons(w)[0][0]) == 9
    with pytest.raises(ValueError, match="mutually exclusive"):
        APP.ogr2ogr(spark, squares, segmentize=1.0, simplify=1.0)
    with pytest.raises(ValueError, match="2-D"):
        APP.ogr2ogr(spark, squares, dim=3)


def test_ogr2ogr_wrapdateline(spark, tmp_path):
    import json
    feats = [{"type": "Feature", "properties": {"fid": 0},
              "geometry": {"type": "LineString",
                           "coordinates": [[170.0, 0.0], [-170.0, 0.0]]}}]
    path = str(tmp_path / "dl.geojson")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    from gdal_spark import apps as APP
    out = APP.ogr2ogr(spark, path, wrapdateline=True)
    w = bytes(out.collect()[0]["geometry"])
    assert G.wkt_from_wkb(w).startswith("MULTILINESTRING")


# --- ogr_geom.py autotest ports ---------------------------------------------

def test_geom_area_multipolygon():                         # ogr_geom_area
    g = wkb("MULTIPOLYGON(((0 0,1 1,1 0,0 0)),"
            "((0 0,10 0,10 10,0 10,0 0),(1 1,1 2,2 2,2 1,1 1)))")
    assert abs(G.polygon_area(g) - 99.5) < 1e-11


def test_geom_area_big_offset():         # ogr_geom_area_linearring_big_offset
    B = 100000000000.0
    ring = np.array([[B, B], [B + 10, B], [B + 10, B + 10],
                     [B, B + 10], [B, B]])
    assert abs(abs(G.ring_area(ring)) - 100.0) < 1e-11


def test_geom_boundary():                # ogr_geom_boundary_{point,line,poly}
    # point -> GEOMETRYCOLLECTION EMPTY
    b = G.wkb_boundary(wkb("POINT(1 1)"))
    assert b is None or "GEOMETRYCOLLECTION" in wkt(b)
    # open linestring -> 2-point MULTIPOINT
    b = G.wkb_boundary(wkb("LINESTRING(0 0,1 1,2 2,3 2,4 2)"))
    assert wkt(b) == "MULTIPOINT (0 0,4 2)"
    # closed linestring -> empty boundary
    b = G.wkb_boundary(wkb("LINESTRING(0 0,1 0,1 1,0 1,0 0)"))
    assert b is None or GO.wkb_members(b) == [] or "EMPTY" in wkt(b)
    # polygon -> its ring as a linestring
    b = G.wkb_boundary(wkb("POLYGON((0 0,1 1,1 0,0 0))"))
    assert wkt(b).startswith("LINESTRING")


def test_build_polygon_from_edges():     # ogr_geom_build_from_edges_1/2
    lines = ["LINESTRING (-87.601595 30.999522,-87.599623 31.000059,"
             "-87.599219 31.00017)",
             "LINESTRING (-87.601595 30.999522,-87.604349 30.999493,"
             "-87.606935 30.99952)",
             "LINESTRING (-87.59966 31.000756,-87.599851 31.000805,"
             "-87.599992 31.000805,-87.600215 31.000761,-87.600279 31.000723,"
             "-87.600586 31.000624,-87.601256 31.000508,-87.602501 31.000447,"
             "-87.602801 31.000469,-87.603108 31.000579,-87.603331 31.000716,"
             "-87.603523 31.000909,-87.603766 31.001233,-87.603913 31.00136)",
             "LINESTRING (-87.606134 31.000182,-87.605885 31.000325,"
             "-87.605343 31.000716,-87.60466 31.001117,-87.604468 31.0012,"
             "-87.603913 31.00136)",
             "LINESTRING (-87.599219 31.00017,-87.599289 31.0003,"
             "-87.599398 31.000426,-87.599564 31.000547,-87.599609 31.000701,"
             "-87.59966 31.000756)",
             "LINESTRING (-87.606935 30.99952,-87.606713 30.999799,"
             "-87.6064 30.999981,-87.606134 31.000182)"]
    gc = GO._encode_container(
        GO.WKB_GEOMETRYCOLLECTION, [wkb(w) for w in lines])
    poly = GO.build_polygon_from_edges(gc)
    assert wkt(poly).startswith("POLYGON")
    # same set as a MULTILINESTRING (build_from_edges_2)
    mls = GO._encode_container(
        GO.WKB_MULTILINESTRING, [wkb(w) for w in lines])
    assert GO.build_polygon_from_edges(mls) == poly


def test_build_polygon_from_edges_errors():  # ogr_geom_build_from_edges_3
    with pytest.raises(ValueError):
        GO.build_polygon_from_edges(wkb("POINT (0 1)"))
    with pytest.raises(ValueError, match="non line string"):
        GO.build_polygon_from_edges(wkb(
            "GEOMETRYCOLLECTION (LINESTRING(0 1,2 3),POINT(0 1),"
            "LINESTRING(0 1,-2 3),LINESTRING(-2 3,2 3))"))


def test_build_polygon_exterior_ring():      # ogr_geom_build_from_edges_4
    lines = ["LINESTRING EMPTY", "LINESTRING (1 1,1 2)", "LINESTRING EMPTY",
             "LINESTRING (1 2,2 2)", "LINESTRING (2 2,2 1)",
             "LINESTRING (2 1,1 1)", "LINESTRING (0 0,0 10)",
             "LINESTRING (0 10,10 10)", "LINESTRING (10 10,10 0)",
             "LINESTRING (10 0,0 0)"]
    gc = GO._encode_container(
        GO.WKB_GEOMETRYCOLLECTION, [wkb(w) for w in lines])
    poly = GO.build_polygon_from_edges(gc)
    assert wkt(poly) == \
        "POLYGON ((0 0,0 10,10 10,10 0,0 0),(1 1,1 2,2 2,2 1,1 1))"


def test_close_rings():                                    # ogr_geom_closerings
    g = GO.wkb_close_rings(wkb("POLYGON((0 0,0 1,1 1,1 0))"))
    assert wkt(g) == "POLYGON ((0 0,0 1,1 1,1 0,0 0))"
    assert GO.wkb_close_rings(g) == g    # idempotent


def test_segmentize_golden():                              # ogr_geom_segmentize
    g = GO.wkb_segmentize(wkb("LINESTRING(0 0,0 10)"), 1.00001)
    assert wkt(g) == ("LINESTRING (0 0,0 1,0 2,0 3,0 4,0 5,0 6,0 7,0 8,"
                      "0 9,0 10)")


def test_geom_value():                                     # ogr_geom_value
    line = wkb("LINESTRING(2 3,5 3,5 0)")
    L = G.geometry_length(line)
    cases = [(-1e-3, (2, 3)), (L / 4, (3.5, 3)), (L / 2, (5, 3)),
             (3 * L / 4, (5, 1.5)), (L + 1e-3, (5, 0))]
    for dist, (ex, ey) in cases:
        x, y = G.decode_point(GO.wkb_value(line, dist))
        assert (x, y) == pytest.approx((ex, ey))


def test_geom_length_containers():   # ogr_geom_length_{multilinestring,gc}
    assert G.geometry_length(
        wkb("MULTILINESTRING((0 0,0 1),(0 0,0 1))")) == pytest.approx(2.0)
    assert G.geometry_length(wkb(
        "GEOMETRYCOLLECTION(POLYGON((0 0,0 1,1 1,1 0,0 0)),"
        "MULTILINESTRING((0 0,0 1),(0 0,0 1)),LINESTRING(0 0,0 1),"
        "LINESTRING(0 0,0 1),POINT(0 0),GEOMETRYCOLLECTION EMPTY)")) == \
        pytest.approx(4.0)


def test_ogr2ogr_wrapdateline_utm_golden(spark, tmp_path):
    """test_ogr2ogr_18 (autotest/utilities/test_ogr2ogr.py:530): a UTM
    zone-60 polygon straddling the antimeridian, reprojected to
    geographic with -wrapdateline, splits into the reference's exact
    MULTIPOLYGON (coordinates from PROJ's UTM inverse; the engine's
    Krüger series matches to ~1e-9 deg)."""
    import json
    from gdal_spark import apps as APP
    from gdal_spark.functions.srs import Geographic, utm_crs

    ring = [[700000.0, 4000000.0], [800000.0, 4000000.0],
            [800000.0, 3000000.0], [700000.0, 3000000.0],
            [700000.0, 4000000.0]]
    path = str(tmp_path / "wd.geojson")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {"fid": 0},
             "geometry": {"type": "Polygon", "coordinates": [ring]}}]}, f)
    out = APP.ogr2ogr(spark, path, s_srs=utm_crs(60), t_srs=Geographic(),
                      wrapdateline=True)
    w = bytes(out.collect()[0]["geometry"])
    parts = G.decode_polygons(w)
    assert len(parts) == 2
    expected = [
        [(179.222391385437419, 36.124095832129363),
         (180.0, 36.10605558800065), (180.0, 27.090340569400169),
         (179.017505655195095, 27.107979523625211)],
        [(-180.0, 36.10605558800065),
         (-179.667822828781084, 36.098349195413753),
         (-179.974688335419557, 27.089886143076747),
         (-180.0, 27.090340569400169)],
    ]
    got = sorted(parts, key=lambda p: p[0][:, 0].min(), reverse=True)
    for exp, part in zip(expected, got):
        ring = part[0]
        for ex, ey in exp:
            d = np.min(np.hypot(ring[:, 0] - ex, ring[:, 1] - ey))
            assert d < 1e-6, (ex, ey, d)


def test_ogr2ogr_clipsrc_spat_extent(spark, squares):
    """test_ogr2ogr_19: -clipsrc spat_extent clips with the -spat
    rectangle; output geometry is confined to the extent."""
    from gdal_spark import apps as APP
    out = APP.ogr2ogr(spark, squares, spat=(5.0, 5.0, 25.0, 8.0),
                      clipsrc="spat_extent")
    rows = out.orderBy("fid").collect()
    assert [r["fid"] for r in rows] == [0, 1]
    for r in rows:
        x0, y0, x1, y1 = G.geometry_envelope(bytes(r["geometry"]))
        assert x0 >= 5.0 and x1 <= 25.0 and y0 >= 5.0 and y1 <= 8.0
    with pytest.raises(ValueError, match="requires -spat"):
        APP.ogr2ogr(spark, squares, clipsrc="spat_extent")
