"""Ports of the reference's own alg test suite (autotest/alg/*.py),
run against the DISTRIBUTED operators over the reference's own data
files, asserting the reference's own golden checksums / feature sets.

Skipped when the reference checkout is not present (the fixtures are
read in place; nothing is copied into this repo)."""

import os

import numpy as np
import pytest

AUTOTEST = "/root/reference/autotest/alg/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(AUTOTEST),
                                reason="reference autotest data not present")


def _pat(spark):
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    bands, meta = FM.parse_geotiff(open(os.path.join(AUTOTEST, "pat.tif"),
                                        "rb").read())
    return RM.from_array(spark, bands[0], meta), meta, bands[0]


def _f32_to_byte(a):
    """GDALCopyWords Float32 -> Byte (clamp + round-half-up)."""
    return np.clip(np.floor(a.astype(np.float64) + 0.5), 0, 255).astype(
        np.uint8)


def test_proximity_1(spark):
    """autotest/alg/proximity.py:proximity_1 — default options, Byte
    output, golden checksum 1941."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import proximity as PX
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, _ = _pat(spark)
    out, out_meta = PX.proximity(tiles, meta,
                                 max_distance=meta.width + meta.height,
                                 nodata=65535.0)
    arr = RM.to_array(out, out_meta, fill=65535.0)
    assert py_checksum(_f32_to_byte(arr)) == 1941


def test_proximity_2(spark):
    """proximity_2 — VALUES=65,64 MAXDIST=12 NODATA=-1 FIXED_BUF_VAL=255,
    Float32 output, golden checksum 3256."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import proximity as PX
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, _ = _pat(spark)
    out, out_meta = PX.proximity(tiles, meta, max_distance=12.0,
                                 target_values=[65.0, 64.0], nodata=-1.0)
    arr = RM.to_array(out, out_meta, fill=-1.0)
    arr = np.where(arr > 0, np.float32(255.0), arr).astype(np.float32)
    assert py_checksum(arr) == 3256


def test_proximity_3(spark):
    """proximity_3 — USE_INPUT_NODATA=YES NODATA=0, Byte output, golden
    checksum 1465 (src nodata 255 pixels forced to the out nodata)."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import proximity as PX
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, src = _pat(spark)
    out, out_meta = PX.proximity(tiles, meta, max_distance=12.0,
                                 target_values=[65.0, 64.0], nodata=0.0)
    arr = RM.to_array(out, out_meta, fill=0.0)
    arr = np.where(src == meta.nodata, np.float32(0.0), arr)
    assert py_checksum(_f32_to_byte(arr)) == 1465


def _grd_tiles(spark, name, nodata):
    from dataclasses import replace

    from gdal_spark.raster import formats as FM
    tiles, meta = FM.read_aaigrid(spark, os.path.join(AUTOTEST, name),
                                  raster_id=name, dtype="uint8")
    return tiles, replace(meta, nodata=nodata)


def test_sieve_1(spark):
    """autotest/alg/sieve.py:sieve_1 — threshold 2, 4-connected, no mask
    (all pixels participate): golden checksum 364."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import sieve as SV
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta = _grd_tiles(spark, "sieve_src.grd", nodata=None)
    out = SV.sieve(tiles, meta, threshold=2)
    assert py_checksum(RM.to_array(out, meta)) == 364


def test_sieve_4(spark):
    """sieve_4 — sieve_2634.grd (the #2634 regression grid), threshold 2,
    4-connected: golden checksum 98."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import sieve as SV
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta = _grd_tiles(spark, "sieve_2634.grd", nodata=None)
    out = SV.sieve(tiles, meta, threshold=2)
    assert py_checksum(RM.to_array(out, meta)) == 98


def test_polygonize_1(spark):
    """autotest/alg/polygonize.py:polygonize_1 — nodata-masked polygonize
    of polygonize_in.grd: 13 features with the expected DN multiset and
    the documented two-ring geometry for DN=156."""
    from gdal_spark.functions import geometry as G
    from gdal_spark.raster import polygonize as PZ
    tiles, meta = _grd_tiles(spark, "polygonize_in.grd", nodata=132.0)
    out = PZ.region_geometries(tiles, meta).collect()
    assert len(out) == 13
    expect = sorted([107, 123, 115, 115, 140, 148, 123, 140, 156,
                     100, 101, 102, 103])
    assert sorted(int(r["value"]) for r in out) == expect
    # the DN=156 region: outer ring + one hole, exact geo coordinates
    r156 = [r for r in out if r["value"] == 156]
    assert len(r156) == 1
    rings = G.decode_polygons(bytes(r156[0]["wkb"]))[0]
    assert len(rings) == 2
    outer = {(x, y) for x, y in rings[0][:-1]}
    hole = {(x, y) for x, y in rings[1][:-1]}
    assert outer == {(440720.0, 3751200.0), (440720.0, 3751020.0),
                     (440900.0, 3751020.0), (440900.0, 3751200.0)}
    assert hole == {(440780.0, 3751140.0), (440840.0, 3751140.0),
                    (440840.0, 3751080.0), (440780.0, 3751080.0)}


def test_polygonize_2(spark):
    """polygonize_2 — unmasked variant: 17 features including the nodata
    (132) regions."""
    from gdal_spark.raster import polygonize as PZ
    tiles, meta = _grd_tiles(spark, "polygonize_in.grd", nodata=None)
    out = PZ.polygonize(tiles, meta).collect()
    assert len(out) == 17
    expect = sorted([107, 123, 115, 132, 115, 132, 140, 132, 148, 123,
                     140, 132, 156, 100, 101, 102, 103])
    assert sorted(int(r["value"]) for r in out) == expect


def test_dither_1(spark):
    """autotest/alg/dither.py:dither_1 — 8-color median-cut palette over
    rgbsmall.tif must equal the reference's color table exactly, and the
    error-diffusion dither must hit golden checksum 8803."""
    from gdal_spark.raster import color as CO
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    path = "/root/reference/autotest/gdrivers/data/rgbsmall.tif"
    if not os.path.exists(path):
        pytest.skip("rgbsmall.tif not present")
    bands, meta = FM.parse_geotiff(open(path, "rb").read())
    tiles = None
    for b in range(3):
        t = RM.from_array(spark, bands[b], meta, band=b)
        tiles = t if tiles is None else tiles.unionByName(t)
    pal = CO.median_cut_pct(tiles, meta, n_colors=8)
    ref_ct = [(36, 48, 32), (92, 120, 20), (88, 96, 20), (92, 132, 56),
              (0, 0, 0), (96, 152, 24), (60, 112, 32), (164, 164, 108)]
    assert [tuple(int(v) for v in row) for row in pal] == ref_ct
    out = CO.dither_rgb_to_pct(tiles, meta, pal)
    from dataclasses import replace
    arr = RM.to_array(out, replace(meta, raster_id=meta.raster_id + "_pct"))
    assert py_checksum(arr) == 8803


def _contour_fixture():
    size = 160
    arr = np.zeros((size, size), dtype=np.int16)
    q, e, s = size // 4, size // 8, size // 16
    arr[q:q + size // 2, q:q + size // 2] = 10
    arr[q + e:q + e + q, q + e:q + e + q] = 20
    arr[q + e + s:q + e + s + e, q + e + s:q + e + s + e] = 25
    return arr, 1.0 / size


def _contour_envelopes(spark, levels):
    from gdal_spark.functions import geometry as G
    from gdal_spark.raster import contour as CT
    from gdal_spark.raster import model as RM
    arr, precision = _contour_fixture()
    meta = RM.RasterMeta("ct", 160, 160,
                         gt=(1.0, precision, 0.0, 50.0, 0.0, -precision),
                         dtype="int16", block=64)
    tiles = RM.from_array(spark, arr, meta)
    rows = CT.contour_lines(tiles, meta, levels).collect()
    env = {}
    for r in rows:
        c = G.decode_linestring(bytes(r["wkb"]))  # geo coords
        gx = c[:, 0]
        gy = c[:, 1]
        lv = r["level"]
        cur = env.get(lv)
        box = [gx.min(), gx.max(), gy.min(), gy.max()]
        if cur is None:
            env[lv] = box
        else:
            env[lv] = [min(cur[0], box[0]), max(cur[1], box[1]),
                       min(cur[2], box[2]), max(cur[3], box[3])]
    return env, precision


def test_contour_1(spark):
    """autotest/alg/contour.py:contour_1 — interval-10 contours of the
    nested-plateau raster: levels 10 and 20 with the documented
    envelopes (tolerance precision/2)."""
    env, precision = _contour_envelopes(spark, [10.0, 20.0])
    expected = {10.0: [1.25, 1.75, 49.25, 49.75],
                20.0: [1.375, 1.625, 49.375, 49.625]}
    assert sorted(env) == sorted(expected)
    for lv, exp in expected.items():
        for a, b in zip(env[lv], exp):
            assert abs(a - b) <= precision / 2 * 1.001, (lv, env[lv], exp)


def test_contour_2(spark):
    """contour_2 — fixed levels [10, 20, 25], adds the innermost plateau
    envelope."""
    env, precision = _contour_envelopes(spark, [10.0, 20.0, 25.0])
    expected = {10.0: [1.25, 1.75, 49.25, 49.75],
                20.0: [1.375, 1.625, 49.375, 49.625],
                25.0: [1.4375, 1.5625, 49.4375, 49.5625]}
    assert sorted(env) == sorted(expected)
    for lv, exp in expected.items():
        for a, b in zip(env[lv], exp):
            assert abs(a - b) <= precision / 2 * 1.001, (lv, env[lv], exp)


def test_rasterize_1(spark):
    """autotest/alg/rasterize.py:rasterize_1 — polygon fill + default
    Bresenham line burn into a 100x100 grid, golden checksum 6452."""
    from gdal_spark.functions.geometry import encode_linestring, encode_polygon
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import rasterize as RZ
    from gdal_spark.raster.checksum import py_checksum
    meta = RM.RasterMeta("r1", 100, 100,
                         gt=(1000.0, 1.0, 0.0, 1100.0, 0.0, -1.0),
                         dtype="uint8", block=64)
    ring = np.array([[1020, 1030], [1020, 1045], [1050, 1045],
                     [1050, 1030], [1020, 1030]], float)
    line = np.array([[1000, 1000], [1100, 1050]], float)
    geoms = spark.createDataFrame(
        [(0, bytearray(encode_polygon([ring])), 220.0),
         (1, bytearray(encode_linestring(line)), 220.0)],
        "geom_id long, wkb binary, burn double")
    tiles = RZ.rasterize(geoms, meta)
    assert py_checksum(RM.to_array(tiles, meta)) == 6452


def test_rasterize_2(spark):
    """rasterize_2 — ALL_TOUCHED=TRUE burn of the cutline.csv polygons
    into a 12x12 grid, golden checksum 121."""
    from gdal_spark.functions.geometry import wkb_from_wkt
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import rasterize as RZ
    from gdal_spark.raster.checksum import py_checksum
    meta = RM.RasterMeta("r2", 12, 12, gt=(0.0, 1.0, 0.0, 12.0, 0.0, -1.0),
                         dtype="uint8", block=12)
    wkts = [
        "POLYGON((6.25 1.25,7.25 1.25,7.25 2.25,6.25 2.25,6.25 1.25))",
        "POLYGON((4.25 4.25,6.25 4.25,6.25 6.25,4.25 6.25,4.25 4.25))",
        "POLYGON((1.001 1.001,3.999 3.999,3.2 1.6,1.001 1.001))",
    ]
    geoms = spark.createDataFrame(
        [(i, bytearray(wkb_from_wkt(w)), 220.0) for i, w in enumerate(wkts)],
        "geom_id long, wkb binary, burn double")
    tiles = RZ.rasterize(geoms, meta, all_touched=True)
    assert py_checksum(RM.to_array(tiles, meta)) == 121


# --- warp kernel goldens (autotest/alg/warp.py warp_1..warp_24 family) ---

_WARP_CASES = [
    # (vrt, golden) pairs compared with the autotest contract maxdiff <= 1
    ("utmsmall_near.vrt", "utmsmall_near.tiff"),
    ("utmsmall_blinear.vrt", "utmsmall_blinear.tiff"),
    ("utmsmall_cubic.vrt", "utmsmall_cubic.tiff"),
    ("utmsmall_cubicspline.vrt", "utmsmall_cubicspline.tiff"),
    ("utmsmall_lanczos.vrt", "utmsmall_lanczos.tiff"),
    ("utmsmall_ds_cubicspline.vrt", "utmsmall_ds_cubicspline.tiff"),
    ("utmsmall_ds_lanczos.vrt", "utmsmall_ds_lanczos.tiff"),
    ("utmsmall_average.vrt", "utmsmall_average.tiff"),
    ("utmsmall_mode.vrt", "utmsmall_mode.tiff"),
    ("utmsmall_max.vrt", "utmsmall_max.tif"),
    ("utmsmall_min.vrt", "utmsmall_min.tif"),
    ("utmsmall_med.vrt", "utmsmall_med.tif"),
    ("utmsmall_Q1.vrt", "utmsmall_Q1.tif"),
    ("utmsmall_Q3.vrt", "utmsmall_Q3.tif"),
    ("utmsmall-int16-neg_max.vrt", "utmsmall-int16-neg_max.tif"),
    ("utmsmall-int16-neg_min.vrt", "utmsmall-int16-neg_min.tif"),
    ("utmsmall-int16-neg_med.vrt", "utmsmall-int16-neg_med.tif"),
    ("utmsmall-int16-neg_Q1.vrt", "utmsmall-int16-neg_Q1.tif"),
    ("utmsmall-int16-neg_Q3.vrt", "utmsmall-int16-neg_Q3.tif"),
    ("utmsmall-int16-neg_mode.vrt", "utmsmall-int16-neg_mode.tiff"),
]


# --- reproject goldens (autotest/alg/reproject.py reproject_1..3) ---

GCORE = "/root/reference/autotest/gcore/data"


def test_reproject_1(spark):
    """reproject_1: identity reprojection (same grid, same SRS) must
    round-trip byte.tif exactly (checksum equality with the source)."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import resample as RS
    from gdal_spark.raster.checksum import py_checksum
    meta = FM.geotiff_meta(os.path.join(GCORE, "byte.tif"))
    tiles = FM.read_geotiff(spark, os.path.join(GCORE, "byte.tif"))
    out = RM.to_array(RS.warp(tiles, meta, meta, method="nearest"), meta)
    src = FM.parse_geotiff(
        open(os.path.join(GCORE, "byte.tif"), "rb").read())[0][0]
    assert py_checksum(out) == py_checksum(src)
    assert np.array_equal(out, src)


def test_reproject_2(spark):
    """reproject_2: byte.tif forced to EPSG:32611 (WGS84 / UTM 11N),
    reprojected to EPSG:4326 on the autotest's 22x18 geographic grid;
    the reference expects checksum 4727 (nearest)."""
    from dataclasses import replace
    from gdal_spark.functions.srs import (GenImgProjTransform, Geographic,
                                          utm_crs)
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import resample as RS
    from gdal_spark.raster.checksum import py_checksum
    src_meta = FM.geotiff_meta(os.path.join(GCORE, "byte.tif"))
    tiles = FM.read_geotiff(spark, os.path.join(GCORE, "byte.tif"))
    dst_meta = RM.RasterMeta(
        "byte_4326", 22, 18,
        gt=(-117.641169915168746, 0.000598105625684, 0,
            33.900668703925191, 0, -0.000598105625684), dtype="uint8")
    tr = GenImgProjTransform(src_meta.gt, dst_meta.gt,
                             src_crs=utm_crs(11), dst_crs=Geographic())
    out = RM.to_array(
        RS.warp(tiles, src_meta, dst_meta, method="nearest",
                src_from_dst=tr), dst_meta)
    assert py_checksum(out) == 4727


def test_reproject_3(spark):
    """reproject_3: bilinear with src nodata 2 / dst nodata 3 — nodata
    source taps get zero weight (density normalization) and unsupported
    dst pixels take the dst nodata; exact byte-for-byte expectation."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import resample as RS
    src = np.array([[2, 127, 127, 2]] * 3, dtype=np.uint8)
    src_meta = RM.RasterMeta("rp3src", 4, 3, gt=(10, 1, 0, 10, 0, -1),
                             dtype="uint8", nodata=2.0)
    dst_meta = RM.RasterMeta("rp3dst", 6, 3,
                             gt=(10, 2.0 / 3.0, 0, 10, 0, -1),
                             dtype="uint8", nodata=3.0)
    tiles = RM.from_array(spark, src, src_meta)
    out = RM.to_array(
        RS.warp(tiles, src_meta, dst_meta, method="bilinear",
                src_nodata=2.0), dst_meta)
    assert np.array_equal(out, np.array([[3, 127, 127, 127, 127, 3]] * 3,
                                        dtype=np.uint8))


# --- cutline goldens (autotest/alg/cutline.py cutline_1..cutline_3) ---

_CUTLINE_CASES = [
    ("cutline_noblend.vrt", 11409),
    ("cutline_blend.vrt", 21395),
    ("cutline_multipolygon.vrt", 20827),
]


@pytest.mark.parametrize("vrt,cksum", _CUTLINE_CASES,
                         ids=[v[:-4] for v, _ in _CUTLINE_CASES])
def test_cutline_golden(spark, vrt, cksum):
    """autotest/alg/cutline.py — warped VRTs carrying a <Cutline> (source
    pixel/line WKT), with and without CutlineBlendDist and with a holed
    multipolygon, must reproduce the reference checksum bit-exactly."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import vrt as VRT
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta = VRT.read_vrt(spark, os.path.join(AUTOTEST, vrt))
    assert py_checksum(RM.to_array(tiles, meta)) == cksum


@pytest.mark.parametrize("vrt,golden", _WARP_CASES,
                         ids=[v[:-4] for v, _ in _WARP_CASES])
def test_warp_golden(spark, vrt, golden):
    """autotest/alg/warp.py — each warped VRT (one per resampling kernel,
    upsample and downsample, byte and negative-int16) opened through the
    engine's VRT driver must match the reference's golden raster within
    the autotest tolerance (max |diff| <= 1)."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import vrt as VRT
    tiles, meta = VRT.read_vrt(spark, os.path.join(AUTOTEST, vrt))
    got = RM.to_array(tiles, meta).astype(np.float64)
    ref_bands, _m = FM.parse_geotiff(
        open(os.path.join(AUTOTEST, golden), "rb").read())
    ref = ref_bands[0].astype(np.float64)
    maxdiff = np.abs(got - ref).max()
    assert maxdiff <= 1, (vrt, maxdiff,
                          int((np.abs(got - ref) > 1).sum()))


# --- transformer goldens (autotest/gcore/transformer.py 1..5) ---

_GCPS_CORNER = [(0.0, 0.0, 440720.0, 3751320.0),
                (100.0, 0.0, 446720.0, 3751320.0),
                (0.0, 100.0, 440720.0, 3745320.0),
                (100.0, 100.0, 446720.0, 3745320.0)]   # gcore/data/gcps.vrt


def test_transformer_1_affine():
    """transformer_1: byte.tif's geotransform, forward and inverse."""
    from gdal_spark.functions.srs import GenImgProjTransform as G
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    x, y = G._px_to_geo(gt, 20.0, 10.0)
    assert abs(x - 441920) <= 1e-8 and abs(y - 3750720) <= 1e-8
    px, py = G._geo_to_px(gt, x, y)
    assert abs(px - 20) <= 1e-8 and abs(py - 10) <= 1e-8


def test_transformer_2_gcp_polynomial():
    """transformer_2: order-1 polynomial fitted to the 4 corner GCPs."""
    from gdal_spark.functions.srs import GCPTransform
    t = GCPTransform(_GCPS_CORNER, order=1)
    x, y = t.forward(np.array([20.0]), np.array([10.0]))
    assert abs(x[0] - 441920) <= 0.001 and abs(y[0] - 3750720) <= 0.001
    px, py = t.inverse(x, y)
    assert abs(px[0] - 20) <= 0.001 and abs(py[0] - 10) <= 0.001


def test_transformer_3_gcp_tps():
    """transformer_3: thin-plate-spline through the same corner GCPs."""
    from gdal_spark.functions.srs import TPSTransform
    t = TPSTransform(_GCPS_CORNER)
    x, y = t.forward(np.array([20.0]), np.array([10.0]))
    assert abs(x[0] - 441920) <= 0.001 and abs(y[0] - 3750720) <= 0.001
    px, py = t.inverse(x, y)
    assert abs(px[0] - 20) <= 0.001 and abs(py[0] - 10) <= 0.001


def test_transformer_4_geoloc():
    """transformer_4: geolocation arrays from gcore/data/sstgeo.tif
    (bands 1/2 are per-pixel lon/lat). Forward matches the reference to
    1e-6. Deviation: the reference's inverse backmap is approximate
    (its own golden is (19.55, 9.19) for a point generated from (20, 10));
    the engine's Newton inverse recovers the true pixel, so we assert the
    exact round-trip instead."""
    from gdal_spark.functions.srs import GeolocTransform
    from gdal_spark.raster import formats as FM
    bands, _m = FM.parse_geotiff(
        open(os.path.join(GCORE, "sstgeo.tif"), "rb").read())
    t = GeolocTransform(bands[0], bands[1])
    lon, lat = t.forward(np.array([20.0]), np.array([10.0]))
    assert abs(lon[0] - -81.961341857910156) <= 1e-6
    assert abs(lat[0] - 29.612689971923828) <= 1e-6
    px, py = t.inverse(lon, lat)
    assert abs(px[0] - 20) <= 1e-4 and abs(py[0] - 10) <= 1e-4


def _rpc_vrt_model():
    import xml.etree.ElementTree as ET
    from gdal_spark.functions.srs import RPCModel
    root = ET.parse(os.path.join(GCORE, "rpc.vrt")).getroot()
    md = {m.get("key"): m.text for m in root.findall("Metadata/MDI")
          if m.get("key")}
    co = lambda k: tuple(float(v) for v in md[k].split())
    return RPCModel(
        line_off=float(md["LINE_OFF"]), samp_off=float(md["SAMP_OFF"]),
        lat_off=float(md["LAT_OFF"]), long_off=float(md["LONG_OFF"]),
        height_off=float(md["HEIGHT_OFF"]),
        line_scale=float(md["LINE_SCALE"]),
        samp_scale=float(md["SAMP_SCALE"]),
        lat_scale=float(md["LAT_SCALE"]), long_scale=float(md["LONG_SCALE"]),
        height_scale=float(md["HEIGHT_SCALE"]),
        line_num=co("LINE_NUM_COEFF"), line_den=co("LINE_DEN_COEFF"),
        samp_num=co("SAMP_NUM_COEFF"), samp_den=co("SAMP_DEN_COEFF"))


def test_transformer_5_rpc():
    """transformer_5: RPC00B from gcore/data/rpc.vrt at heights 0 and 30."""
    from gdal_spark.functions.srs import RPCTransform
    t = RPCTransform(_rpc_vrt_model())
    lon, lat = t.forward(np.array([20.0]), np.array([10.0]))
    assert abs(lon[0] - 125.64830100509131) <= 1e-6
    assert abs(lat[0] - 39.869433991997553) <= 1e-6
    px, py = t.inverse(lon, lat)
    assert abs(px[0] - 20) <= 0.001 and abs(py[0] - 10) <= 0.001
    t30 = RPCTransform(_rpc_vrt_model(), height=30.0)
    lon, lat = t30.forward(np.array([20.0]), np.array([10.0]))
    assert abs(lon[0] - 125.64828521533849) <= 1e-6
    assert abs(lat[0] - 39.869345204440144) <= 1e-6


# --- gcps2geotransform goldens (autotest/gcore/gcps2geotransform.py) ---

def _gt_eq(gt, want, tol):
    return gt is not None and all(abs(a - b) <= tol for a, b in zip(gt, want))


def test_gcps2gt_goldens():
    """gcps2gt_1..8: exact 3-point fit, non-exact least squares, approx_ok
    rejection, degenerate single point, 2-point special case, 4-corner
    special cases (both orderings), and the messy real-world fit."""
    from gdal_spark.functions.srs import gcps_to_geotransform as g2gt
    assert _gt_eq(g2gt([(0, 0, 400000, 370000), (100, 0, 410000, 370000),
                        (100, 200, 410000, 368000)]),
                  (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0), 1e-6)
    assert _gt_eq(g2gt([(0, 0, 400000, 370000), (100, 0, 410000, 370000),
                        (100, 200, 410000, 368000),
                        (0, 200, 400000, 368000.01)]),
                  (400000.0, 100.0, 0.0, 370000.0025, -5e-05, -9.999975),
                  1e-6)
    assert g2gt([(0, 0, 400000, 370000), (100, 0, 410000, 370000),
                 (100, 200, 410000, 368000), (0, 200, 400000, 360000)],
                approx_ok=False) is None
    assert g2gt([(0, 0, 400000, 370000)]) is None
    assert _gt_eq(g2gt([(0, 0, 400000, 370000),
                        (100, 200, 410000, 368000)]),
                  (400000.0, 100.0, 0.0, 370000.0, 0.0, -10.0), 1e-6)
    assert _gt_eq(g2gt([(400000, 370000, 400000, 370000),
                        (410000, 370000, 410000, 370000),
                        (410000, 368000, 410000, 368000),
                        (400000, 368000, 400000, 368000)]),
                  (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 1e-6)
    assert _gt_eq(g2gt([(400000, 370000, 400000, 370000),
                        (410000, 368000, 410000, 368000),
                        (410000, 370000, 410000, 370000),
                        (400000, 368000, 400000, 368000)]),
                  (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 1e-6)
    assert _gt_eq(g2gt([(0.01, 0.04, -87.05528672907, 39.22759504228),
                        (0.01, 2688.02, -86.97079900719, 39.27075713986),
                        (4031.99, 2688.04, -87.05960736744, 39.37569137000),
                        (1988.16, 1540.80,
                         -87.055069186699924, 39.304963106777514),
                        (1477.41, 2400.83,
                         -87.013419295885001, 39.304705030894979),
                        (1466.02, 2376.92,
                         -87.013906298363295, 39.304056190007913)]),
                  (-87.056612873288, -2.232795668658e-05, 3.178617809303e-05,
                   39.227856615716, 2.6091510188921e-05,
                   1.596921026218e-05), 1e-5)


# --- statistics goldens (autotest/gcore/gdal_stats.py) ---

def _stats_row(spark, path=None, arr=None, meta=None):
    from dataclasses import replace
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import stats as ST
    if path is not None:
        arr, meta = None, FM.geotiff_meta(path)
        tiles = FM.read_geotiff(spark, path)
    else:
        tiles = RM.from_array(spark, arr, meta)
    return ST.compute_statistics(tiles, meta).collect()[0]


@pytest.mark.parametrize("fixture,exp", [
    ("nan32.tif", (50.0, 58.0, 54.0, 2.5819888974716)),
    ("nan64.tif", (50.0, 58.0, 54.0, 2.5819888974716)),
], ids=["nan32", "nan64"])
def test_stats_nan(spark, fixture, exp):
    """stats_nan_1/2: NaN pixels are excluded from statistics entirely
    (Float32 and Float64 rasters)."""
    r = _stats_row(spark, path=os.path.join(GCORE, fixture))
    got = (r["min"], r["max"], r["mean"], r["stddev"])
    assert got == pytest.approx(exp, abs=1e-10)


def test_stats_approx_nodata(spark):
    """stats_approx_nodata (#3573): minfloat.tif's -FLT_MAX nodata tag is
    honored; stats/minmax over the remaining pixels are [-3, 5, 1, 4]."""
    from gdal_spark.raster import formats as FM
    meta = FM.geotiff_meta(os.path.join(GCORE, "minfloat.tif"))
    assert meta.nodata == -3.4028234663852886e+38
    r = _stats_row(spark, path=os.path.join(GCORE, "minfloat.tif"))
    assert (r["min"], r["max"], r["mean"], r["stddev"]) == (-3.0, 5.0,
                                                            1.0, 4.0)


def test_stats_nodata_inf(spark):
    """stats_nodata_inf: -inf as the nodata value filters exactly."""
    from gdal_spark.raster import model as RM
    meta = RM.RasterMeta("inf1", 3, 1, dtype="float32",
                         nodata=float("-inf"))
    arr = np.array([[float("-inf"), 1.0, -2.0]], dtype=np.float32)
    r = _stats_row(spark, arr=arr, meta=meta)
    assert (r["min"], r["max"], r["mean"], r["stddev"]) == (-2.0, 1.0,
                                                            -0.5, 1.5)


# --- histogram goldens (autotest/gcore/histogram.py 1..4) ---

def _hist_list(spark, tiles, meta, lo, hi, n, include_oor=False):
    from gdal_spark.raster import stats as ST
    rows = ST.histogram(tiles, meta, lo, hi, n,
                        include_out_of_range=include_oor).collect()
    out = [0] * n
    for r in rows:
        out[r["bucket"]] = r["count"]
    return out


_UTMSMALL_HIST = [
    2, 0, 0, 0, 0, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 23, 0, 0, 0, 0, 0, 0,
    0, 0, 29, 0, 0, 0, 0, 0, 0, 0, 46, 0, 0, 0, 0, 0, 0, 0, 69, 0, 0, 0,
    0, 0, 0, 0, 99, 0, 0, 0, 0, 0, 0, 0, 0, 120, 0, 0, 0, 0, 0, 0, 0, 178,
    0, 0, 0, 0, 0, 0, 0, 193, 0, 0, 0, 0, 0, 0, 0, 212, 0, 0, 0, 0, 0, 0,
    0, 281, 0, 0, 0, 0, 0, 0, 0, 0, 365, 0, 0, 0, 0, 0, 0, 0, 460, 0, 0,
    0, 0, 0, 0, 0, 533, 0, 0, 0, 0, 0, 0, 0, 544, 0, 0, 0, 0, 0, 0, 0, 0,
    626, 0, 0, 0, 0, 0, 0, 0, 653, 0, 0, 0, 0, 0, 0, 0, 673, 0, 0, 0, 0,
    0, 0, 0, 629, 0, 0, 0, 0, 0, 0, 0, 0, 586, 0, 0, 0, 0, 0, 0, 0, 541,
    0, 0, 0, 0, 0, 0, 0, 435, 0, 0, 0, 0, 0, 0, 0, 348, 0, 0, 0, 0, 0, 0,
    0, 341, 0, 0, 0, 0, 0, 0, 0, 0, 284, 0, 0, 0, 0, 0, 0, 0, 225, 0, 0,
    0, 0, 0, 0, 0, 237, 0, 0, 0, 0, 0, 0, 0, 172, 0, 0, 0, 0, 0, 0, 0, 0,
    159, 0, 0, 0, 0, 0, 0, 0, 105, 0, 0, 0, 0, 0, 0, 0, 824]


def test_histogram_1_2(spark):
    """histogram_1/2: default 256-bucket [-0.5, 255.5) histogram of
    utmsmall.tif, then the keyword 16-bucket variant."""
    from gdal_spark.raster import formats as FM
    path = os.path.join(GCORE, "utmsmall.tif")
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    assert _hist_list(spark, tiles, meta, -0.5, 255.5, 256) == _UTMSMALL_HIST
    assert _hist_list(spark, tiles, meta, -0.5, 255.5, 16) == [
        10, 52, 115, 219, 371, 493, 825, 1077, 1279, 1302, 1127, 783,
        625, 462, 331, 929]


def test_histogram_3_4(spark):
    """histogram_3/4: Int32 grid with negatives, 21 buckets over
    [-100, 100], with and without out-of-range clamping."""
    from gdal_spark.raster import formats as FM
    tiles, meta = FM.read_aaigrid(
        spark, os.path.join(AUTOTEST, "..", "..", "gcore", "data",
                            "int32_withneg.grd"),
        raster_id="int32neg", dtype="int32")
    base = [0, 0, 0, 0, 0, 1, 0, 1, 1, 3, 3, 2, 0, 5, 3, 4, 0, 1, 1, 2]
    assert _hist_list(spark, tiles, meta, -100, 100, 21,
                      include_oor=True) == base + [3]
    assert _hist_list(spark, tiles, meta, -100, 100, 21,
                      include_oor=False) == base + [0]


# --- gdal_merge goldens (autotest/pyscripts/test_gdal_merge.py) ---

def test_gdal_merge_1(spark):
    """test_gdal_merge_1: single-input merge round-trips byte.tif
    (checksum 4672)."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import mosaic as MO
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "byte.tif")
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    out, om = MO.gdal_merge([(tiles, meta)], "m1")
    assert (om.width, om.height) == (20, 20)
    assert py_checksum(RM.to_array(out, om)) == 4672


def test_gdal_merge_2(spark):
    """test_gdal_merge_2: four 10x10 tiles at 2x2 grid positions merge to
    a 20x20 union-extent raster, checksum 3508."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import mosaic as MO
    from gdal_spark.raster.checksum import py_checksum
    ins = []
    for gt, fill in [((2, 0.1, 0, 49, 0, -0.1), 0),
                     ((3, 0.1, 0, 49, 0, -0.1), 63),
                     ((2, 0.1, 0, 48, 0, -0.1), 127),
                     ((3, 0.1, 0, 48, 0, -0.1), 255)]:
        meta = RM.RasterMeta(f"in{fill}", 10, 10, gt=gt, dtype="uint8")
        arr = np.full((10, 10), fill, dtype=np.uint8)
        ins.append((RM.from_array(spark, arr, meta), meta))
    out, om = MO.gdal_merge(ins, "m2")
    assert (om.width, om.height) == (20, 20)
    assert om.gt == (2, 0.1, 0, 49, 0, -0.1)
    assert py_checksum(RM.to_array(out, om)) == 3508


# --- rgb2pct / pct2rgb goldens (autotest/pyscripts/test_rgb2pct.py) ---

def _rgbsmall(spark):
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    path = "/root/reference/autotest/gcore/data/rgbsmall.tif"
    bands, meta = FM.parse_geotiff(open(path, "rb").read())
    tiles = None
    for b in range(3):
        t = RM.from_array(spark, bands[b], meta, band=b)
        tiles = t if tiles is None else tiles.unionByName(t)
    return tiles, meta, bands


def test_rgb2pct_1_and_pct2rgb_1(spark):
    """test_rgb2pct_1 + test_pct2rgb_1: 256-color median-cut dither of
    rgbsmall.tif hits checksum 31231; expanding it back through the
    palette hits checksum 20963 on band 1 and stays within maxdiff 18 of
    the original."""
    from dataclasses import replace
    from gdal_spark.raster import color as CO
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, bands = _rgbsmall(spark)
    pal = CO.median_cut_pct(tiles, meta, n_colors=256)
    pct = CO.dither_rgb_to_pct(tiles, meta, pal)
    pct_meta = replace(meta, raster_id=meta.raster_id + "_pct")
    arr = RM.to_array(pct, pct_meta)
    assert py_checksum(arr) == 31231
    from gdal_spark import apps as APP
    rgb, rgb_meta = APP.pct2rgb(RM.from_array(spark, arr, pct_meta),
                                pct_meta, pal)
    r0 = RM.to_array(rgb, rgb_meta, band=0)
    assert py_checksum(r0) == 20963
    # gdaltest.compare_ds examines band 1 only (pymod/gdaltest.py:1128)
    assert np.abs(r0.astype(np.int64) - bands[0].astype(np.int64)).max() <= 18


def test_rgb2pct_2(spark):
    """test_rgb2pct_2: -n 16 variant, checksum 16596."""
    from dataclasses import replace
    from gdal_spark.raster import color as CO
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, _bands = _rgbsmall(spark)
    pal = CO.median_cut_pct(tiles, meta, n_colors=16)
    pct = CO.dither_rgb_to_pct(tiles, meta, pal)
    arr = RM.to_array(pct, replace(meta, raster_id=meta.raster_id + "_pct"))
    assert py_checksum(arr) == 16596


# --- gdal_calc / fillnodata goldens (autotest/pyscripts) ---

def test_gdal_calc_1_2(spark):
    """test_gdal_calc_py_1/2 over stefan_full_rgba.tif: band copy, band
    select, A+B and A*B (uint8 wraparound), driven through the
    distributed pixel-algebra operators."""
    from gdal_spark.raster import algebra as AL
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    path = "/root/reference/autotest/gcore/data/stefan_full_rgba.tif"
    bands, meta = FM.parse_geotiff(open(path, "rb").read())
    tA = RM.from_array(spark, bands[0], meta)
    tB = RM.from_array(spark, bands[1], meta)
    out1, m1 = AL.map_pixels(tA, meta, "calc1", lambda a: a)
    assert py_checksum(RM.to_array(out1, m1)) == 12603
    out2, m2 = AL.map_pixels(tB, meta, "calc2", lambda a: a)
    assert py_checksum(RM.to_array(out2, m2)) == 58561
    add, ma = AL.zip_pixels(tA, tB, meta, "calcadd", lambda a, b: a + b)
    assert py_checksum(RM.to_array(add, ma)) == 12368
    mul, mm = AL.zip_pixels(tA, tB, meta, "calcmul", lambda a, b: a * b)
    assert py_checksum(RM.to_array(mul, mm)) == 62785


def test_gdal_fillnodata_1(spark):
    """test_gdal_fillnodata_1: with no nodata in the source, fillnodata
    must be the identity (byte.tif checksum 4672)."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import proximity as PX
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "byte.tif")
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    out, om = PX.fillnodata(tiles, meta, max_search=100)
    arr = RM.to_array(out, om).astype(np.uint8)
    assert py_checksum(arr) == 4672


# --- overview goldens (autotest/gcore/tiff_ovr.py 1, 5, 7) ---

def test_tiff_ovr_1(spark):
    """tiff_ovr_1: nearest /2 and /4 overviews of the 20x20 Float32 image
    (checksums 1087 and 328)."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import pyramid as PY
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "float32.tif")
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    ov1, m1 = PY.overview_level(tiles, meta, "ovr1", method="nearest")
    assert (m1.width, m1.height) == (10, 10)
    assert py_checksum(RM.to_array(ov1, m1)) == 1087
    ov2, m2 = PY.overview_level(ov1, m1, "ovr2", method="nearest")
    assert (m2.width, m2.height) == (5, 5)
    assert py_checksum(RM.to_array(ov2, m2)) == 328


def test_tiff_ovr_5(spark):
    """tiff_ovr_5: AVERAGE overview honoring the band's 0 nodata
    (checksum 1130) — nodata inputs are excluded, all-nodata boxes stay
    nodata."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import pyramid as PY
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "nodata_byte.tif")
    meta = FM.geotiff_meta(path)
    assert meta.nodata == 0.0
    tiles = FM.read_geotiff(spark, path)
    ov, om = PY.overview_level(tiles, meta, "ovr5", method="average",
                               nodata=meta.nodata)
    assert py_checksum(RM.to_array(ov, om)) == 1130


def test_tiff_ovr_7(spark):
    """tiff_ovr_7: nearest overview of the black/white palette
    chessboard samples only index 0 — checksum 0."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import pyramid as PY
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "test_average_palette.tif")
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    ov, om = PY.overview_level(tiles, meta, "ovr7", method="nearest")
    assert py_checksum(RM.to_array(ov, om)) == 0


# --- format-driver read goldens (gcore/{pnm,bmp,aaigrid}_read.py,
#     gdrivers/{png,gif}.py) ---

GDRIVERS = "/root/reference/autotest/gdrivers/data"


def test_format_read_goldens(spark):
    """Each format decoder reproduces the reference's band checksum on
    its own fixtures. Paletted formats (BMP/GIF/indexed PNG) checksum
    the palette-index band like GDAL does."""
    from gdal_spark.raster import imagecodec as IC
    from gdal_spark.raster.checksum import py_checksum
    rd = lambda p: open(p, "rb").read()
    assert py_checksum(IC.pnm_decode(rd(os.path.join(GCORE,
                                                     "byte.pnm")))) == 4672
    assert py_checksum(IC.pnm_decode(rd(os.path.join(GCORE,
                                                     "uint16.pnm")))) == 4672
    for f, want in [("1bit.bmp", 200), ("4bit_pal.bmp", 2587),
                    ("8bit_pal.bmp", 4672)]:
        idx, _pal = IC.bmp_decode_indexed(rd(os.path.join(GCORE, f)))
        assert py_checksum(idx) == want, f
    idx, _pal = IC.png_decode_indexed(rd(os.path.join(GDRIVERS, "test.png")))
    assert py_checksum(idx) == 57921
    idx, _pal = IC.gif_decode_indexed(rd(os.path.join(GDRIVERS,
                                                      "bug407.gif")))
    assert py_checksum(idx) == 57921


def test_aaigrid_read_golden(spark):
    """aaigrid_read: byte.tif.grd opens to checksum 4672 through the
    distributed AAIGrid reader."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta = FM.read_aaigrid(spark, os.path.join(GCORE, "byte.tif.grd"),
                                  raster_id="bg", dtype="uint8")
    assert py_checksum(RM.to_array(tiles, meta)) == 4672


def test_tiff_ovr_8_14_palette(spark):
    """tiff_ovr_8/14: AVERAGE and GAUSS overviews of a palette band
    average the color-table RGB and requantize to the nearest entry —
    the black/white chessboard becomes uniform grey index (checksum 200
    for both resamplers)."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import pyramid as PY
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "test_average_palette.tif")
    pal = FM.geotiff_color_table(open(path, "rb").read())
    assert pal is not None and len(pal) == 256
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    for method in ("average", "gauss"):
        ov, om = PY.overview_level(tiles, meta, "p_" + method,
                                   method=method, palette=pal)
        assert py_checksum(RM.to_array(ov, om)) == 200, method


def _canon_ring(pts):
    """Ring vertex chain canonicalized up to rotation, direction, and
    collinear-vertex elision (the reference's tracer keeps occasional
    redundant collinear vertices that the engine's merges)."""
    p = [tuple(v) for v in pts]
    if p[0] == p[-1]:
        p = p[:-1]
    out = []
    n = len(p)
    for i in range(n):
        a, b, c = p[i - 1], p[i], p[(i + 1) % n]
        if (b[0] - a[0]) * (c[1] - a[1]) != (b[1] - a[1]) * (c[0] - a[0]):
            out.append(b)
    p = out
    best = None
    for seq in (p, p[::-1]):
        i = seq.index(min(seq))
        cand = tuple(seq[i:] + seq[:i])
        best = cand if best is None or cand < best else best
    return best


def test_polygonize_3(spark):
    """polygonize_3 — polygonize_in_2.grd without masking: 125 features,
    and the DN=0 region's exact three-ring geometry (outer + two holes).
    Rings compare canonicalized: the engine traces the same pixel-edge
    chains as the reference but may start/orient them differently."""
    from gdal_spark.functions import geometry as G
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import polygonize as PZ
    tiles, meta = FM.read_aaigrid(
        spark, os.path.join(AUTOTEST, "polygonize_in_2.grd"),
        raster_id="p2", dtype="uint8")
    rows = PZ.region_geometries(tiles, meta).collect()
    assert len(rows) == 125
    zero = [r for r in rows if r["value"] == 0]
    assert len(zero) == 1
    got = [_canon_ring(r) for r in G.decode_polygons(bytes(zero[0]["wkb"]))[0]]
    exp_wkt = (
        "POLYGON ((6 -3,6 -40,19 -40,19 -39,24 -39,25 -39,25 -38,26 -38,"
        "27 -38,27 -37,28 -37,28 -36,29 -36,29 -35,30 -35,30 -34,31 -34,"
        "31 -25,30 -25,30 -24,29 -24,29 -23,28 -23,28 -22,27 -22,27 -21,"
        "24 -21,24 -20,23 -20,23 -19,25 -19,26 -19,26 -18,27 -18,27 -17,"
        "28 -17,28 -16,29 -16,29 -8,28 -8,28 -7,27 -7,27 -6,26 -6,26 -5,"
        "24 -5,24 -4,18 -4,18 -3,6 -3),"
        "(24 -35,25 -35,26 -35,26 -33,27 -33,27 -25,26 -25,26 -23,24 -23,"
        "24 -22,11 -22,11 -36,24 -36,24 -35),"
        "(11 -7,11 -18,23 -18,23 -17,24 -17,24 -16,25 -16,25 -9,24 -9,"
        "24 -8,23 -8,23 -7,11 -7))")
    exp = [_canon_ring(r)
           for r in G.decode_polygons(G.wkb_from_wkt(exp_wkt))[0]]
    # same ring count; outer ring matches; hole set matches
    assert len(got) == len(exp) == 3
    assert got[0] == exp[0]
    assert sorted(got[1:]) == sorted(exp[1:])


def test_polygonize_4_8connected(spark):
    """polygonize_4 — 8CONNECTED=8 without masking: 16 features with the
    expected DN multiset; verified block-size independent (diagonal
    components crossing block borders merge via the shifted edge keys)."""
    from dataclasses import replace

    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import polygonize as PZ
    expect = sorted([107, 123, 132, 115, 132, 115, 140, 148,
                     123, 140, 132, 156, 100, 101, 102, 103])
    for blk in (256, 4):
        tiles, meta = FM.read_aaigrid(
            spark, os.path.join(AUTOTEST, "polygonize_in.grd"),
            raster_id=f"p8b{blk}", dtype="uint8", block=blk)
        meta = replace(meta, nodata=None)
        rows = PZ.polygonize(tiles, meta, connectedness=8).collect()
        assert len(rows) == 16, blk
        assert sorted(int(r["value"]) for r in rows) == expect, blk


@pytest.mark.parametrize("fixture,conn,want", [
    ("sieve_src.grd", 8, 370),      # sieve_2
    ("unmergable.grd", 8, 472),     # sieve_3: mutually-small clusters
    ("sieve_src.grd", 4, 364),      # sieve_5 (mask = all-valid)
], ids=["sieve_2", "sieve_3", "sieve_5"])
def test_sieve_2_3_5(spark, fixture, conn, want):
    """sieve_2/3/5 — 8-connected sieve and the unmergable-cluster rule:
    a small polygon is only rewritten when its largest neighbour is at
    least threshold-sized (single decision, no cascading)."""
    from dataclasses import replace

    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import sieve as SV
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta = FM.read_aaigrid(
        spark, os.path.join(AUTOTEST, fixture),
        raster_id=f"{fixture}-{conn}", dtype="uint8")
    meta = replace(meta, nodata=None)
    out = SV.sieve(tiles, meta, threshold=2, connectedness=conn)
    assert py_checksum(RM.to_array(out, meta)) == want


def test_sieve_8conn_block_independent(spark):
    """The 8-connected sieve result must not depend on block size."""
    from dataclasses import replace

    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import sieve as SV
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta = FM.read_aaigrid(
        spark, os.path.join(AUTOTEST, "sieve_src.grd"),
        raster_id="s8small", dtype="uint8", block=4)
    meta = replace(meta, nodata=None)
    out = SV.sieve(tiles, meta, threshold=2, connectedness=8)
    assert py_checksum(RM.to_array(out, meta)) == 370


# --- gdal_translate utility goldens (autotest/utilities) ---

def test_gdal_translate_goldens(spark):
    """test_gdal_translate_3/5/6: -ot Int16 keeps checksum 4672;
    -expand rgb on bug407.gif gives band checksums 20615/59147/63052;
    -outsize 40 40 (nearest 2x) gives 18784."""
    from gdal_spark import apps as APP
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import imagecodec as IC
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "byte.tif")
    meta = FM.geotiff_meta(path)
    tiles = FM.read_geotiff(spark, path)
    o, m = APP.gdal_translate(tiles, meta, "t3", ot="int16")
    assert m.dtype == "int16"
    assert py_checksum(RM.to_array(o, m)) == 4672
    o, m = APP.gdal_translate(tiles, meta, "t6", outsize=(40, 40))
    assert py_checksum(RM.to_array(o, m)) == 18784
    idx, pal = IC.gif_decode_indexed(
        open(os.path.join(GDRIVERS, "bug407.gif"), "rb").read())
    gmeta = RM.RasterMeta("g407", idx.shape[1], idx.shape[0], dtype="uint8")
    rgb, rmeta = APP.pct2rgb(RM.from_array(spark, idx, gmeta), gmeta,
                             np.asarray(pal, np.uint8))
    for b, want in [(0, 20615), (1, 59147), (2, 63052)]:
        assert py_checksum(RM.to_array(rgb, rmeta, band=b)) == want, b


# --- gdalwarp utility goldens (autotest/utilities test_gdalwarp_10..14) ---

def test_gdalwarp_ts40_kernels(spark):
    """test_gdalwarp_10..14: byte.tif (via the corner-GCP fit, the same
    grid) warped -ts 40 40 with each kernel: nearest hits checksum 18784;
    bilinear/cubic/cubicspline/lanczos match the reference rasters within
    maxdiff 1."""
    from gdal_spark.functions.srs import gcps_to_geotransform
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import resample as RS
    from gdal_spark.raster.checksum import py_checksum
    path = os.path.join(GCORE, "byte.tif")
    meta = FM.geotiff_meta(path)
    # the fixture replaces the geotransform with 4 corner GCPs; the warp
    # app refits it (approx-OK first-order fit == the original grid)
    gcps = [(0, 0, 440720.0, 3751320.0), (20, 0, 441920.0, 3751320.0),
            (20, 20, 441920.0, 3750120.0), (0, 20, 440720.0, 3750120.0)]
    assert gcps_to_geotransform(gcps) == meta.gt
    tiles = FM.read_geotiff(spark, path)
    dst = RM.RasterMeta("w40", 40, 40,
                        gt=(440720.0, 30.0, 0.0, 3751320.0, 0.0, -30.0),
                        dtype="uint8")
    got = RM.to_array(RS.warp(tiles, meta, dst, method="nearest"), dst)
    assert py_checksum(got) == 18784
    ref_dir = "/root/reference/autotest/utilities/ref_data"
    for method, ref in [("bilinear", "testgdalwarp11.tif"),
                        ("cubic", "testgdalwarp12.tif"),
                        ("cubicspline", "testgdalwarp13.tif"),
                        ("lanczos", "testgdalwarp14.tif")]:
        got = RM.to_array(RS.warp(tiles, meta, dst, method=method), dst)
        refa = FM.parse_geotiff(
            open(os.path.join(ref_dir, ref), "rb").read())[0][0]
        maxdiff = np.abs(got.astype(np.int64)
                         - refa.astype(np.int64)).max()
        assert maxdiff <= 1, (method, maxdiff)


# --- gdal_grid utility goldens (autotest/utilities/test_gdal_grid.py) ---

UTILDATA = "/root/reference/autotest/utilities/data"
REFDATA = "/root/reference/autotest/utilities/ref_data"


def _grid_points(spark):
    pts = [(i, *map(float, line.strip().split(",")))
           for i, line in enumerate(open(os.path.join(UTILDATA, "grid.csv")))]
    return spark.createDataFrame(pts, "pid long, x double, y double, z double")


def test_gdal_grid_goldens(spark):
    """test_gdal_grid_2/5/6/7/9/10 over grid.csv on the byte.tif grid:
    nearest reproduces byte.tif (4672); minimum/maximum/range (whole
    dataset via a radius covering the extent), windowed maximum and
    count match the reference rasters' checksums; average_distance
    matches the Float64 reference rasters to 1e-11."""
    from gdal_spark.operators import gridding as GR
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    pdf = _grid_points(spark)
    meta = RM.RasterMeta("g", 20, 20,
                         gt=(440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0),
                         dtype="uint8")

    def to_byte(df):
        a = np.zeros((20, 20))
        for r in df.collect():
            a[int(r["py"]), int(r["px"])] = r["val"]
        return np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)

    ref = lambda f: FM.parse_geotiff(
        open(os.path.join(REFDATA, f), "rb").read())[0][0]
    assert py_checksum(to_byte(GR.grid_nearest(pdf, meta,
                                               radius=2000.0))) == 4672
    for metric, rad, f in [("minimum", 2000.0, "grid_minimum.tif"),
                           ("maximum", 2000.0, "grid_maximum.tif"),
                           ("range", 2000.0, "grid_range.tif"),
                           ("maximum", 100.0, "grid_maximum_100_100.tif"),
                           ("count", 70.0, "grid_count_70_70.tif")]:
        got = to_byte(GR.grid_metric(pdf, meta, radius=rad, metric=metric))
        assert py_checksum(got) == py_checksum(ref(f)), (metric, rad)
    for rad, f in [(2000.0, "grid_avdist.tif"),
                   (150.0, "grid_avdist_150_150.tif")]:
        a = np.zeros((20, 20))
        for r in GR.grid_metric(pdf, meta, radius=rad,
                                metric="average_distance").collect():
            a[int(r["py"]), int(r["px"])] = r["val"]
        assert np.abs(a - ref(f)).max() <= 1e-11, f


# --- gdaldem utility goldens over the DTED tile (autotest/utilities) ---

def _n43(spark):
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster import model as RM
    arr, meta = FM.parse_dted(
        open(os.path.join(GDRIVERS, "n43.dt0"), "rb").read())
    return RM.from_array(spark, arr, meta), meta, arr


def test_dted_read(spark):
    """The DTED reader: n43.dt0 parses to the 121x121 point-registered
    tile with the reference's geotransform."""
    from gdal_spark.raster import formats as FM
    arr, meta = FM.parse_dted(
        open(os.path.join(GDRIVERS, "n43.dt0"), "rb").read())
    assert arr.shape == (121, 121) and arr.dtype == np.int16
    assert meta.gt == (-80.00416666666666, 0.008333333333333333, 0.0,
                       44.00416666666667, 0.0, -0.008333333333333333)


def test_gdaldem_goldens(spark):
    """test_gdaldem_hillshade / _combined / _slope / _aspect over n43.dt0
    (-s 111120 -z 30): exact reference checksums 45587 / 43876 / 63748 /
    54885, computed through the distributed stencil with the reference's
    nodata borders."""
    from gdal_spark.raster import dem as D
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, _arr = _n43(spark)

    def run(fn, border, cast, **kw):
        out, om = D.stencil_apply(
            tiles, meta, "o", lambda w, gt: fn(w, gt, **kw), halo=1)
        a = RM.to_array(out, om, fill=border).astype(np.float64)
        a[0, :] = border
        a[-1, :] = border
        a[:, 0] = border
        a[:, -1] = border
        return cast(a)

    byte = lambda a: np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)
    f32 = lambda a: a.astype(np.float32)
    assert py_checksum(run(D.hillshade, 0.0, byte,
                           z=30.0, scale=111120.0)) == 45587
    assert py_checksum(run(D.hillshade, 0.0, byte, z=30.0, scale=111120.0,
                           variant="combined")) == 43876
    assert py_checksum(run(D.slope, -9999.0, f32,
                           scale=111120.0)) == 63748
    assert py_checksum(run(D.aspect, -9999.0, f32)) == 54885


def test_gdaldem_color_relief_golden(spark):
    """test_gdaldem_color_relief: the 7-knot ramp over n43.dt0 with the
    reference's 0.45-offset truncation — band checksums
    55009/37543/47711 bit-exact."""
    from gdal_spark.raster import algebra as AL
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, _arr = _n43(spark)
    ramp = [(-32768, 200, 230, 255), (75, 200, 230, 255), (76, 50, 180, 50),
            (150, 240, 250, 150), (300, 190, 185, 135),
            (450, 235, 220, 175), (500, 255, 255, 255)]
    out, om = AL.color_relief(tiles, meta, "cr", ramp)
    for b, want in [(0, 55009), (1, 37543), (2, 47711)]:
        got = RM.to_array(out, om, band=b).astype(np.uint8)
        assert py_checksum(got) == want, b


def test_nearblack_1(spark):
    """test_nearblack_1: rgbsmall.tif with -nb 0 (near 15) — the collar
    floods to exact black; band checksums 21106/20736/21309 bit-exact."""
    from dataclasses import replace

    from gdal_spark.raster import color as CO
    from gdal_spark.raster import model as RM
    from gdal_spark.raster.checksum import py_checksum
    tiles, meta, _bands = _rgbsmall(spark)
    out = CO.nearblack(tiles, meta, near_dist=15, max_non_black=0,
                       n_bands=3)
    om = replace(meta, raster_id=meta.raster_id + "_nb")
    for b, want in [(0, 21106), (1, 20736), (2, 21309)]:
        assert py_checksum(RM.to_array(out, om, band=b)) == want, b


def test_gdal_rasterize_utility_1(spark):
    """utilities/test_gdal_rasterize_1: polygon + linestring burned at 220
    onto the 100x100 (1000,1,0,1100,0,-1) grid — checksum 6452."""
    from gdal_spark.functions import geometry as G
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import rasterize as RZ
    from gdal_spark.raster.checksum import py_checksum
    meta = RM.RasterMeta("r1", 100, 100, gt=(1000, 1, 0, 1100, 0, -1),
                         dtype="uint8")
    geoms = spark.createDataFrame(
        [(1, bytearray(G.wkb_from_wkt(
            "POLYGON((1020 1030,1020 1045,1050 1045,1050 1030,"
            "1020 1030))")), 220.0),
         (2, bytearray(G.wkb_from_wkt(
             "LINESTRING(1000 1000, 1100 1050)")), 220.0)],
        "geom_id long, wkb binary, burn double")
    tiles = RZ.rasterize(geoms, meta)
    assert py_checksum(RM.to_array(tiles, meta)) == 6452


# --- tiff_read dtype/layout goldens (autotest/gcore/tiff_read.py) ---

@pytest.mark.parametrize("fixture,band,want", [
    ("byte.tif", 1, 4672), ("int16.tif", 1, 4672), ("uint16.tif", 1, 4672),
    ("int10.tif", 1, 4672), ("int12.tif", 1, 4672), ("int24.tif", 1, 4672),
    ("float16.tif", 1, 4672), ("float24.tif", 1, 4672),
    ("int32.tif", 1, 4672), ("uint32.tif", 1, 4672),
    ("float32.tif", 1, 4672), ("float32_minwhite.tif", 1, 1),
    ("float64.tif", 1, 4672),
    ("cint16.tif", 1, 5028), ("cint32.tif", 1, 5028),
    ("cfloat32.tif", 1, 5028), ("cfloat64.tif", 1, 5028),
    ("separate_tiled.tif", 2, 15234), ("seperate_strip.tif", 2, 15234),
    ("contig_tiled.tif", 2, 15234), ("contig_strip.tif", 2, 15234),
    ("empty1bit.tif", 1, 0),
], ids=lambda v: str(v))
def test_tiff_read_goldens(spark, fixture, band, want):
    """tiff_read init_list: every sample format (incl complex int/float
    pairs, 1-bit, packed 10/12-bit, 24-bit int, half-float and FLOAT24),
    planar/chunky x strip/tile layouts with truncated final chunks
    (#1179), checksummed against the reference."""
    from gdal_spark.raster import formats as FM
    from gdal_spark.raster.checksum import py_checksum
    bands, _meta = FM.parse_geotiff(
        open(os.path.join(GCORE, fixture), "rb").read())
    assert py_checksum(bands[band - 1]) == want


def test_png_rgba16_golden(spark):
    """gdrivers/png.py png_5/_6: 16-bit RGBA PNG band checksums
    (1815 / 4873)."""
    from gdal_spark.raster import imagecodec as IC
    from gdal_spark.raster.checksum import py_checksum
    a = IC.png_decode(open(os.path.join(GDRIVERS, "rgba16.png"),
                           "rb").read())
    assert a.dtype == np.uint16 and a.shape == (20, 20, 4)
    assert py_checksum(a[:, :, 2]) == 1815
    assert py_checksum(a[:, :, 3]) == 4873


def test_shapefile_poly_read(spark):
    """ogr/data/poly.shp through the distributed shapefile reader: 10
    features, the known EAS_ID set, and the shoelace area of every parsed
    polygon equals its DBF AREA attribute (the reference's own numbers)."""
    import json

    from gdal_spark.functions import geometry as G
    from gdal_spark.sources import formats as SF
    df = SF.read_shapefile(
        spark, "/root/reference/autotest/ogr/data/poly.shp")
    rows = df.collect()
    assert len(rows) == 10
    eas = set()
    for r in rows:
        props = json.loads(r["properties"])
        eas.add(int(props["EAS_ID"]))
        area = G.polygon_area(bytes(r["geometry"]))
        assert abs(area - float(props["AREA"])) <= 0.05, props
    assert eas == {168, 179, 171, 173, 172, 169, 166, 158, 165, 170}
