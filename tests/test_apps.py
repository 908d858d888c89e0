"""ogr2ogr / gdal_translate app pipelines (gdal/apps parity)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark import apps as APP
from gdal_spark.functions import geometry as G
from gdal_spark.functions import srs as SRS
from gdal_spark.raster import model as M
from gdal_spark.sources import formats as FMT
from gdal_spark.sources import polygons as PG


def test_ogr2ogr_where_select(spark):
    out = APP.ogr2ogr(
        spark, PG.poly_fixture(spark),
        where="eas_id < 170 AND prfedea LIKE '35043%'",
        select=["fid", "eas_id"])
    assert set(out.columns) == {"fid", "eas_id", "geometry"}
    assert sorted(r["eas_id"] for r in out.collect()) == [158, 165, 166,
                                                          168, 169]


def test_ogr2ogr_spat(spark):
    # squares sit at x = 20*fid .. 20*fid+10; the rect catches fids 2 and 3
    out = APP.ogr2ogr(spark, PG.poly_fixture(spark), spat=(35, 0, 65, 10))
    assert sorted(r["fid"] for r in out.collect()) == [2, 3]


def test_ogr2ogr_sql(spark):
    out = APP.ogr2ogr(
        spark, PG.poly_fixture(spark), layer_name="poly",
        sql="SELECT fid, eas_id FROM poly WHERE eas_id IN (158, 165)")
    assert sorted(r["fid"] for r in out.collect()) == [7, 8]


def test_ogr2ogr_convert_roundtrip(spark, tmp_path):
    poly = PG.poly_fixture(spark)
    gpkg = str(tmp_path / "out.gpkg")
    APP.ogr2ogr(spark, poly, gpkg, layer_name="poly",
                where="eas_id < 170")
    back = APP.read_vector(spark, gpkg, layer="poly")
    assert back.count() == 5
    seq = str(tmp_path / "out.geojsonl")
    APP.ogr2ogr(spark, poly, seq, select=["fid", "eas_id"])
    assert FMT.read_geojson_seq(spark, seq).count() == 10


def test_transform_geometry(spark):
    df = spark.createDataFrame(
        [(1, bytearray(G.encode_point(3.0, 50.0)))],
        "fid long, geometry binary")
    out = APP.transform_geometry(df, SRS.WebMercator())
    x, y = G.decode_point(bytes(out.collect()[0]["geometry"]))
    ex, ey = SRS.WebMercator().forward(np.array([3.0]), np.array([50.0]))
    assert x == pytest.approx(float(ex[0])) and y == pytest.approx(float(ey[0]))
    # round-trip back via s_srs
    back = APP.transform_geometry(out, SRS.Geographic(),
                                  s_srs=SRS.WebMercator())
    lon, lat = G.decode_point(bytes(back.collect()[0]["geometry"]))
    assert lon == pytest.approx(3.0) and lat == pytest.approx(50.0)


@pytest.fixture(scope="module")
def grad16(spark):
    arr = (np.arange(256, dtype=np.uint8).reshape(16, 16))
    meta = M.RasterMeta("g16", 16, 16, gt=(100.0, 2.0, 0.0, 400.0, 0.0, -2.0),
                        dtype="uint8", block=8)
    return M.from_array(spark, arr, meta), meta, arr


def test_translate_srcwin(spark, grad16):
    tiles, meta, arr = grad16
    out, om = APP.gdal_translate(tiles, meta, "w1", srcwin=(4, 4, 8, 8))
    assert (om.width, om.height) == (8, 8)
    assert om.gt[0] == 100.0 + 4 * 2.0 and om.gt[3] == 400.0 - 4 * 2.0
    got = M.to_array(out, om)
    np.testing.assert_array_equal(got, arr[4:12, 4:12])


def test_translate_projwin(spark, grad16):
    tiles, meta, arr = grad16
    # projwin equivalent of srcwin (4,4,8,8) through the geotransform
    out, om = APP.gdal_translate(tiles, meta, "w2",
                                 projwin=(108.0, 392.0, 124.0, 376.0))
    np.testing.assert_array_equal(M.to_array(out, om), arr[4:12, 4:12])


def test_translate_outsize_nearest(spark, grad16):
    tiles, meta, arr = grad16
    out, om = APP.gdal_translate(tiles, meta, "w3", srcwin=(4, 4, 8, 8),
                                 outsize=(4, 4))
    idx = (np.floor((np.arange(4) + 0.5) * 8 / 4).astype(int) + 4)
    np.testing.assert_array_equal(M.to_array(out, om), arr[np.ix_(idx, idx)])


def test_translate_scale_cast(spark, grad16):
    tiles, meta, arr = grad16
    out, om = APP.gdal_translate(tiles, meta, "w4", ot="float64",
                                 scale=(0, 255, 0.0, 1.0))
    assert om.dtype == "float64"
    got = M.to_array(out, om, fill=np.nan)
    np.testing.assert_allclose(got, arr.astype(np.float64) / 255.0)


def test_translate_scale_with_resize(spark, grad16):
    tiles, meta, arr = grad16
    out, om = APP.gdal_translate(tiles, meta, "w5", srcwin=(0, 0, 16, 16),
                                 outsize=(8, 8), ot="uint8",
                                 scale=(0, 255, 0, 100))
    idx = np.floor((np.arange(8) + 0.5) * 2).astype(int)
    exp = np.clip(np.round(arr[np.ix_(idx, idx)].astype(float)
                           / 255.0 * 100.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(M.to_array(out, om), exp)


def test_translate_band_select(spark, grad16):
    tiles, meta, arr = grad16
    two = tiles.unionByName(
        tiles.replace(0, 1, subset=["band"]))  # fake band 1 copy
    out, om = APP.gdal_translate(two, meta, "w6", bands=[0])
    assert out.select("band").distinct().count() == 1


def test_suggested_warp_output_identity():
    def ident(px, py):
        return np.asarray(px) * 0.5, 32.0 - np.asarray(py) * 0.5
    w, h, gt = SRS.suggested_warp_output(64, 64, ident)
    assert (w, h) == (64, 64)
    assert gt == (0.0, 0.5, 0.0, 32.0, 0.0, -0.5)


def test_gdalwarp_identity_window(spark, grad16):
    tiles, meta, arr = grad16   # gt=(100,2,0,400,0,-2)
    out, om = APP.gdalwarp(tiles, meta, "gw1",
                           te=(108.0, 376.0, 124.0, 392.0), tr=(2.0, 2.0),
                           et=0)
    assert (om.width, om.height) == (8, 8)
    np.testing.assert_array_equal(M.to_array(out, om), arr[4:12, 4:12])


def test_gdalwarp_reproject_suggested(spark):
    """Geographic → WebMercator with SuggestedWarpOutput grid: every dst
    pixel must equal the local numpy twin of the same transform chain
    (partitioning independence of the distributed gather)."""
    meta = M.RasterMeta("geo64", 64, 64, gt=(0.0, 0.5, 0.0, 32.0, 0.0, -0.5),
                        dtype="uint8", block=32)
    arr = ((np.arange(64)[:, None] * 7 + np.arange(64)[None, :] * 13)
           % 50 + 1).astype(np.uint8)
    tiles = M.from_array(spark, arr, meta)
    out, om = APP.gdalwarp(tiles, meta, "gw2", t_srs=SRS.WebMercator(), et=0)
    got = M.to_array(out, om)
    tr = SRS.GenImgProjTransform(meta.gt, om.gt, src_crs=SRS.Geographic(),
                                 dst_crs=SRS.WebMercator())
    DX, DY = np.meshgrid(np.arange(om.width) + 0.5,
                         np.arange(om.height) + 0.5)
    sx, sy = tr(DX, DY)
    isx = np.trunc(sx + 1e-10).astype(int)
    isy = np.trunc(sy + 1e-10).astype(int)
    ok = (sx >= 0) & (sy >= 0) & (isx < 64) & (isy < 64)
    exp = np.zeros_like(got)
    exp[ok] = arr[isy[ok], isx[ok]]
    np.testing.assert_array_equal(got, exp)


def test_gdalwarp_approx_tolerance(spark):
    """-et 0.25 lattice approximation stays within 1 px of the exact warp
    on value-changing positions (the autotest maxdiff<=1 contract is on
    values; nearest + smooth transform keeps assignments near-identical)."""
    meta = M.RasterMeta("geo64b", 64, 64, gt=(0.0, 0.5, 0.0, 32.0, 0.0, -0.5),
                        dtype="uint8", block=32)
    arr = ((np.arange(64)[:, None] + np.arange(64)[None, :]) % 97).astype(np.uint8)
    tiles = M.from_array(spark, arr, meta)
    exact, om = APP.gdalwarp(tiles, meta, "gwE", t_srs=SRS.WebMercator(),
                             et=0)
    approx, om2 = APP.gdalwarp(tiles, meta, "gwA", t_srs=SRS.WebMercator(),
                               et=0.25)
    a = M.to_array(exact, om).astype(int)
    b = M.to_array(approx, om2).astype(int)
    # identical grids; the 0.25-px approx error may shift a nearest
    # assignment by at most one pixel at lattice cell borders — every
    # mismatching cell must hold a value from a's 3x3 neighborhood
    assert (om.width, om.height) == (om2.width, om2.height)
    mismatch = np.argwhere(a != b)
    assert len(mismatch) < a.size * 0.05
    pad = np.pad(a, 1, mode="edge")
    for y, x in mismatch:
        assert b[y, x] in pad[y:y + 3, x:x + 3]


def test_path_level_apps(spark, tmp_path):
    """gdal_translate/gdalwarp with file paths on both ends, gdalinfo and
    gdaltindex over headers — the CLI-equivalent surface."""
    from gdal_spark.raster import formats as RF

    arr = ((np.arange(32)[:, None] * 7 + np.arange(32)[None, :]) % 50
           ).astype(np.uint8)
    meta = M.RasterMeta("p1", 32, 32, gt=(10.0, 1.0, 0.0, 42.0, 0.0, -1.0),
                        dtype="uint8", block=16)
    src = str(tmp_path / "p1.tif")
    RF.write_geotiff(M.from_array(spark, arr, meta), meta, src)

    dst = str(tmp_path / "sub.tif")
    om = APP.translate_path(spark, src, dst, srcwin=(8, 8, 16, 16))
    back, bm = APP.open_raster(spark, dst)
    np.testing.assert_array_equal(M.to_array(back, bm), arr[8:24, 8:24])
    assert bm.gt == (18.0, 1.0, 0.0, 34.0, 0.0, -1.0)

    wdst = str(tmp_path / "w.asc")
    APP.warp_path(spark, src, wdst, te=(18.0, 26.0, 34.0, 42.0),
                  tr=(1.0, 1.0), et=0, ot="float64")
    wt, wmeta = APP.open_raster(spark, wdst)
    np.testing.assert_array_equal(M.to_array(wt, wmeta), arr[:16, 8:24])

    info = APP.gdalinfo(spark, src, stats=True, checksum=True)
    assert info["size"] == [32, 32]
    assert info["corners"]["upperLeft"] == [10.0, 42.0]
    assert info["stats"][0]["min"] == 0.0
    from gdal_spark.raster.checksum import py_checksum
    assert info["checksum"][0] == py_checksum(arr)

    idx = APP.gdaltindex(spark, [src, dst])
    rows = {r["location"]: r for r in idx.collect()}
    assert rows[src]["xmin"] == 10.0 and rows[dst]["xmin"] == 18.0


def test_clipdst(spark):
    """-clipdst: geometry clipping per type — polygon area cut, polyline
    split into surviving pieces, outside points dropped."""
    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    line = np.array([[-5.0, 5], [5, 5], [5, 15], [8, 15], [8, 5], [15, 5]])
    df = spark.createDataFrame(
        [(1, bytearray(G.encode_polygon([sq]))),
         (2, bytearray(G.encode_linestring(line))),
         (3, bytearray(G.encode_point(2.0, 2.0))),
         (4, bytearray(G.encode_point(50.0, 50.0)))],
        "fid long, geometry binary")
    out = APP.ogr2ogr(spark, df, clipdst=(1.0, 1.0, 9.0, 9.0))
    rows = {r["fid"]: bytes(r["geometry"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3}          # outside point dropped
    assert G.polygon_area(rows[1]) == 64.0  # 8x8 window of the square
    # the line crosses the rect twice -> two clipped pieces
    d = FMT.geojson_geom_from_wkb(rows[2])
    assert d["type"] == "MultiLineString" and len(d["coordinates"]) == 2
    assert d["coordinates"][0] == [[1.0, 5.0], [5.0, 5.0], [5.0, 9.0]]
    assert d["coordinates"][1] == [[8.0, 9.0], [8.0, 5.0], [9.0, 5.0]]


def test_ogrinfo(spark):
    info = APP.ogrinfo(spark, PG.poly_fixture(spark))
    assert info["feature_count"] == 10
    assert info["extent"] == [0.0, 0.0, 190.0, 10.0]
    assert info["geometry_types"] == {"POLYGON": 10}
    assert ("eas_id", "bigint") in info["fields"]


def test_gdalwarp_tap(spark, grad16):
    """-tap (gdalwarp.cpp target-aligned pixels): the extent snaps
    OUTWARD to multiples of -tr, so the output grid origin is a multiple
    of the resolution and the requested window is fully covered."""
    tiles, meta, arr = grad16   # gt=(100,2,0,400,0,-2), 16x16
    out, om = APP.gdalwarp(tiles, meta, "tap1",
                           te=(107.0, 377.0, 121.0, 391.0), tr=(4.0, 4.0),
                           tap=True, et=0)
    # snapped: xmin=floor(107/4)*4=104, xmax=ceil(121/4)*4=124,
    #          ymin=floor(377/4)*4=376, ymax=ceil(391/4)*4=392
    assert om.gt[0] == 104.0 and om.gt[3] == 392.0
    assert (om.width, om.height) == (5, 4)
    assert om.gt[0] % 4.0 == 0.0 and om.gt[3] % 4.0 == 0.0
    with pytest.raises(ValueError, match="-tap requires -tr"):
        APP.gdalwarp(tiles, meta, "tap2", tap=True)


def test_gdalwarp_crop_to_cutline(spark, grad16):
    """-crop_to_cutline: the cutline polygon's envelope becomes -te and
    pixels outside the polygon stay nodata."""
    from gdal_spark.functions.geometry import wkb_from_wkt
    tiles, meta, arr = grad16
    cl = wkb_from_wkt("POLYGON((108 376,124 376,124 392,108 392,108 376))")
    out, om = APP.gdalwarp(tiles, meta, "ccl", cutline=cl,
                           crop_to_cutline=True, tr=(2.0, 2.0), et=0)
    assert (om.gt[0], om.gt[3]) == (108.0, 392.0)
    assert (om.width, om.height) == (8, 8)
    got = M.to_array(out, om)
    # interior pixel centers: all inside the rectangle -> exact copy
    np.testing.assert_array_equal(got, arr[4:12, 4:12])
    with pytest.raises(ValueError, match="requires -cutline"):
        APP.gdalwarp(tiles, meta, "ccl2", crop_to_cutline=True)
    with pytest.raises(ValueError, match="conflicts"):
        APP.gdalwarp(tiles, meta, "ccl3", cutline=cl, crop_to_cutline=True,
                     te=(0, 0, 1, 1))


def test_gdalwarp_dstalpha(spark, grad16):
    """-dstalpha (GDALWarpDstAlphaMasker, gdalwarper.cpp:573): an alpha
    band of 255 where the pixel received a value, 0 where it stayed
    nodata (outside the cutline / outside the source)."""
    from gdal_spark.functions.geometry import wkb_from_wkt
    tiles, meta, arr = grad16
    cl = wkb_from_wkt("POLYGON((108 376,124 376,124 392,108 392,108 376))")
    out, om = APP.gdalwarp(tiles, meta, "da1", cutline=cl, dstalpha=True,
                           te=(100.0, 368.0, 132.0, 400.0), tr=(2.0, 2.0),
                           et=0)
    data = M.to_array(out, om, band=0)
    alpha = M.to_array(out, om, band=1)
    inside = np.zeros((16, 16), dtype=bool)
    inside[4:12, 4:12] = True
    np.testing.assert_array_equal(alpha, np.where(inside, 255, 0))
    np.testing.assert_array_equal(data[inside], arr[inside])
    assert (data[~inside] == 0).all()


def test_gdalwarp_dstalpha_outside_source(spark, grad16):
    """dst extent larger than the source: alpha is 0 on the uncovered
    frame (blocks without source support stay absent -> transparent)."""
    tiles, meta, arr = grad16
    out, om = APP.gdalwarp(tiles, meta, "da2", dstalpha=True,
                           te=(96.0, 364.0, 136.0, 404.0), tr=(2.0, 2.0),
                           et=0)
    alpha = M.to_array(out, om, band=1)
    assert (om.width, om.height) == (20, 20)
    assert (alpha[2:18, 2:18] == 255).all()
    assert (alpha[:2, :] == 0).all() and (alpha[:, :2] == 0).all()
    assert (alpha[18:, :] == 0).all() and (alpha[:, 18:] == 0).all()
