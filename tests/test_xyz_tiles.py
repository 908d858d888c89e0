"""gdal2tiles-style XYZ pyramid tests: world-grid addressing, base warp,
overview chain, manifest quadkeys."""

import numpy as np
import pytest

from gdal_spark.functions import tiles as TM
from gdal_spark.raster import model as M
from gdal_spark.raster import xyz_tiles as XT


def test_world_meta_addressing():
    wm = XT.world_meta(3, "z3")
    assert wm.width == 2048 and wm.n_block_x == 8
    # block (0,0) top-left corner = (-OS, +OS)
    assert wm.pixel_to_geo(0, 0) == (-TM.ORIGIN_SHIFT, TM.ORIGIN_SHIFT)
    # google tile (x, y) ↔ TMS: block y downward from north
    minx, miny, maxx, maxy = TM.py_tile_bounds(2, (2 ** 3 - 1) - 1, 3)  # tms ty
    gx, gy = wm.pixel_to_geo(2 * 256, 1 * 256)
    assert gx == pytest.approx(minx) and gy == pytest.approx(maxy)


def test_zoom_for_meta():
    # source at exactly zoom-5 resolution
    res5 = TM.py_resolution(5)
    meta = M.RasterMeta("s", 100, 100, gt=(0, res5, 0, 0, 0, -res5))
    assert XT.zoom_for_meta(meta) == 5


@pytest.fixture(scope="module")
def merc_src(spark):
    """Small mercator source: 512x512 px at zoom-4 resolution, positioned
    on an exact tile boundary (tiles (4,5)..(5,6) at z4)."""
    res = TM.py_resolution(4)
    x0 = -TM.ORIGIN_SHIFT + 4 * 256 * res
    y0 = TM.ORIGIN_SHIFT - 5 * 256 * res
    meta = M.RasterMeta("src", 512, 512, gt=(x0, res, 0.0, y0, 0.0, -res),
                        dtype="uint8", nodata=0, block=128)
    X, Y = np.meshgrid(np.arange(512), np.arange(512))
    arr = ((X // 256) * 2 + (Y // 256) * 4 + 10).astype(np.uint8)
    return M.from_array(spark, arr, meta), meta, arr


def test_base_zoom_exact(spark, merc_src):
    tiles_df, meta, arr = merc_src
    levels = XT.build_xyz_pyramid(tiles_df, meta, zmin=2, zmax=4,
                                  base_method="nearest")
    z, base, wmeta = levels[0]
    assert z == 4
    rows = {(r["bx"], r["by"]): r for r in base.collect()}
    # exactly the 2x2 tile window at (4..5, 5..6)
    assert set(rows) == {(4, 5), (5, 5), (4, 6), (5, 6)}
    # grid-aligned nearest warp reproduces the source quadrants exactly
    t = np.frombuffer(bytes(rows[(5, 6)]["data"]), dtype=np.uint8).reshape(256, 256)
    np.testing.assert_array_equal(t, arr[256:, 256:])


def test_overview_chain_and_manifest(spark, merc_src):
    tiles_df, meta, arr = merc_src
    levels = XT.build_xyz_pyramid(tiles_df, meta, zmin=2, zmax=4)
    assert [z for z, _, _ in levels] == [4, 3, 2]
    z3 = {(r["bx"], r["by"]): r for z, df, _ in levels if z == 3
          for r in df.collect()}
    # z4 tiles (4..5, 5..6) parent to z3 x=2, y∈{2,3}
    assert set(z3) == {(2, 2), (2, 3)}
    man = XT.tile_manifest(levels).collect()
    by_zoom = {}
    for r in man:
        by_zoom.setdefault(r["zoom"], []).append(r)
    assert len(by_zoom[4]) == 4
    # quadkey cross-check against the reference formula
    for r in man:
        assert r["quadkey"] == TM.py_quadkey(r["x"], r["tms_y"], r["zoom"])
        assert r["tms_y"] == (1 << r["zoom"]) - 1 - r["y"]


def test_geodetic_profile_pyramid(spark):
    """-profile geodetic: z1 world is 4x2 tiles over [-180,180]x[-90,90];
    a source covering one geodetic tile lands in exactly that tile and the
    z0 overview parents it."""
    res = TM.py_geodetic_resolution(1)          # 90/256 deg/px at z1
    # source = geodetic tile (x=1, google-y=0): lon [-90, 0], lat [0, 90]
    meta = M.RasterMeta("geo_src", 256, 256,
                        gt=(-90.0, res, 0.0, 90.0, 0.0, -res), block=64)
    arr = ((np.arange(256 * 256).reshape(256, 256)) % 200 + 1).astype(np.uint8)
    levels = XT.build_xyz_pyramid(M.from_array(spark, arr, meta), meta,
                                  zmin=0, zmax=1, base_method="nearest",
                                  profile="geodetic")
    assert [z for z, _, _ in levels] == [1, 0]
    z1 = {(r["bx"], r["by"]): r for r in levels[0][1].collect()}
    assert set(z1) == {(1, 0)}
    t = np.frombuffer(bytes(z1[(1, 0)]["data"]), dtype=np.uint8).reshape(256, 256)
    np.testing.assert_array_equal(t, arr)       # 1:1 resolution, same grid
    z0 = {(r["bx"], r["by"]) for r in levels[1][1].collect()}
    assert z0 == {(0, 0)}                       # parent tile at z0

    # tile addressing agrees with the GlobalGeodetic twin (TMS y flip)
    gtx, gty_tms = TM.py_geodetic_tile(-45.0, 45.0, 1)
    assert (gtx, (1 << 1) - 1 - gty_tms) == (1, 0)


def test_write_xyz_png_sink(spark, merc_src, tmp_path):
    """Distributed PNG tile sink: gdal2tiles' {z}/{x}/{y}.png layout,
    written by executors, decodable with any PNG reader, byte-exact
    against the tile DataFrame."""
    from gdal_spark.raster import imagecodec as IC

    tiles_df, meta, arr = merc_src
    levels = XT.build_xyz_pyramid(tiles_df, meta, zmin=3, zmax=4,
                                  base_method="nearest")
    man = {(r["zoom"], r["x"], r["y"]): r
           for r in XT.write_xyz_png(levels, str(tmp_path)).collect()}
    assert len(man) == 4 + 2  # 2x2 base window + z3 parents (2,2),(2,3)
    # file layout + content check against the in-plan tile rows
    z, base, _m = levels[0]
    for r in base.collect():
        key = (4, r["bx"], r["by"])
        assert key in man
        img = IC.png_decode(open(man[key]["path"], "rb").read())
        want = np.zeros((256, 256), dtype=np.uint8)
        want[:r["h"], :r["w"]] = np.frombuffer(
            bytes(r["data"]), dtype=np.uint8).reshape(r["h"], r["w"])
        np.testing.assert_array_equal(img, want)
    assert man[(4, 4, 5)]["path"].endswith("4/4/5.png")
