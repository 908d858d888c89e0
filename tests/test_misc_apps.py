"""Utility apps: gdal2xyz, gdalcompare, gdalmove, pct2rgb, mkgraticule,
ogrtindex."""

import numpy as np

from gdal_spark import apps as APP
from gdal_spark.functions import geometry as G
from gdal_spark.raster import model as RM


def _raster(spark, seed=0):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 9, size=(8, 12)).astype(np.uint8)
    meta = RM.RasterMeta("m", 12, 8, gt=(100.0, 0.5, 0.0, 40.0, 0.0, -0.5),
                        dtype="uint8", block=4)
    return RM.from_array(spark, arr, meta), meta, arr


def test_gdal2xyz(spark):
    tiles, meta, arr = _raster(spark)
    rows = APP.gdal2xyz(tiles, meta, skip=2).collect()
    exp = {(100.0 + (x + 0.5) * 0.5, 40.0 - (y + 0.5) * 0.5, float(arr[y, x]))
           for y in range(0, 8, 2) for x in range(0, 12, 2) if arr[y, x] != 0}
    assert {(r["geo_x"], r["geo_y"], r["val"]) for r in rows} == exp
    # window restricts and re-anchors the skip grid
    win = APP.gdal2xyz(tiles, meta, srcwin=(1, 1, 6, 4), skip=3).collect()
    for r in win:
        x = int((r["geo_x"] - 100.0) / 0.5 - 0.5)
        y = int((40.0 - r["geo_y"]) / 0.5 - 0.5)
        assert 1 <= x < 7 and 1 <= y < 5 and (x - 1) % 3 == 0


def test_gdalcompare(spark):
    t1, m1, arr = _raster(spark, seed=1)
    t2, m2, _ = _raster(spark, seed=1)
    same = APP.gdalcompare(t1, m1, t2, m2)
    assert same["differences"] == 0
    arr2 = arr.copy()
    arr2[3, 3] += 1
    t3 = RM.from_array(spark, arr2, m2)
    diff = APP.gdalcompare(t1, m1, t3, m2)
    assert diff["differences"] == 1 and "checksum" in diff


def test_gdalmove():
    meta = RM.RasterMeta("m", 4, 4, gt=(10.0, 1.0, 0.0, 20.0, 0.0, -1.0),
                        dtype="uint8")
    # pure shift
    out = APP.gdalmove(meta, (5.0, 1.0, 0.0, -3.0, 0.0, 1.0))
    assert out.gt == (15.0, 1.0, 0.0, 17.0, 0.0, -1.0)
    # scale by 2 about origin
    out = APP.gdalmove(meta, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0))
    assert out.gt == (20.0, 2.0, 0.0, 40.0, 0.0, -2.0)


def test_pct2rgb(spark):
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    meta = RM.RasterMeta("p", 2, 2, gt=(0, 1, 0, 0, 0, -1), dtype="uint8",
                        block=2)
    pal = np.array([[10, 20, 30], [200, 100, 0], [5, 5, 255]], np.uint8)
    tiles = RM.from_array(spark, idx, meta)
    rgb, rgb_meta = APP.pct2rgb(tiles, meta, pal)
    for b in range(3):
        band = RM.to_array(rgb, rgb_meta, band=b)
        np.testing.assert_array_equal(band, pal[idx, b])


def test_mkgraticule(spark):
    df = APP.mkgraticule(spark, step=90.0, lat_min=-90, lat_max=90,
                         densify=30.0)
    rows = df.collect()
    meridians = [r for r in rows if r["kind"] == "meridian"]
    parallels = [r for r in rows if r["kind"] == "parallel"]
    assert len(meridians) == 5 and len(parallels) == 3
    c = G.decode_linestring(bytes(meridians[0]["wkb"]))
    assert (c[:, 0] == -180.0).all() and c[0, 1] == -90.0 and c[-1, 1] == 90.0


def test_ogrtindex(spark, tmp_path):
    pts = spark.createDataFrame(
        [(1, bytearray(G.encode_point(2.0, 3.0))),
         (2, bytearray(G.encode_point(-1.0, 7.0)))],
        "fid long, geometry binary")
    path = str(tmp_path / "pts.geojsonl")
    APP.write_vector(pts, path)
    idx = APP.ogrtindex(spark, [path]).collect()
    assert len(idx) == 1 and idx[0]["n"] == 2
    env = G.polygon_envelope(bytes(idx[0]["wkb"]))
    assert env == (-1.0, 3.0, 2.0, 7.0)


def test_gdaltransform_batch(spark):
    """gdaltransform: UTM->geographic point batch through the composed
    chain, exact against the transformer_1 affine expectations."""
    from gdal_spark import apps as APP
    from gdal_spark.functions.srs import GenImgProjTransform
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    df = spark.createDataFrame([(20.0, 10.0), (0.0, 0.0)],
                               "x double, y double")
    out = {(r["x"], r["y"]): (r["tx"], r["ty"])
           for r in APP.gdaltransform(
               df, lambda x, y: GenImgProjTransform._px_to_geo(gt, x, y)
           ).collect()}
    assert out[(20.0, 10.0)] == (441920.0, 3750720.0)
    assert out[(0.0, 0.0)] == (440720.0, 3751320.0)


def test_gcps2wld():
    """gcps2wld.py: world-file coefficients from the gcps2gt_1 fixture
    (pixel-center origin per the .wld convention)."""
    from gdal_spark import apps as APP
    w = APP.gcps2wld([(0, 0, 400000, 370000), (100, 0, 410000, 370000),
                      (100, 200, 410000, 368000)])
    assert w == (100.0, 0.0, 0.0, -10.0, 400050.0, 369995.0)


def test_gdalsrsinfo_report():
    from gdal_spark import apps as APP
    from gdal_spark.functions.srs import crs_from_wkt, utm_crs
    info = APP.gdalsrsinfo(utm_crs(11))
    assert info["wkt"].startswith("PROJCS")
    # the emitted WKT must round-trip through the engine's own codec
    crs2 = crs_from_wkt(info["wkt"])
    import numpy as np
    lon = np.array([-117.5]); lat = np.array([33.9])
    np.testing.assert_allclose(crs2.forward(lon, lat),
                               utm_crs(11).forward(lon, lat), atol=1e-6)
