"""DEM focal-op tests: distributed halo-exchange stencil vs direct global
numpy evaluation, plus golden values hand-computed from the gdaldem
formulas (gdal/apps/gdaldem.cpp)."""

import math

import numpy as np
import pytest

from gdal_spark.raster import dem as D
from gdal_spark.raster import model as M

GT = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)


def direct(arr, fn, edges="nodata", dst_nodata=-9999.0, **kw):
    """Global single-array twin of stencil_apply."""
    h, w = arr.shape
    pad = np.full((h + 2, w + 2), np.nan)
    pad[1:-1, 1:-1] = arr
    if edges == "interpolate":
        pad[0, :] = 2 * pad[1, :] - pad[2, :]
        pad[h + 1, :] = 2 * pad[h, :] - pad[h - 1, :]
        pad[:, 0] = 2 * pad[:, 1] - pad[:, 2]
        pad[:, w + 1] = 2 * pad[:, w] - pad[:, w - 1]
    out = fn(D._win_planes(pad), GT, **kw) if kw or True else None
    if edges == "nodata":
        bad = np.zeros((h, w), dtype=bool)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                bad |= np.isnan(pad[dy:dy + h, dx:dx + w])
        out = np.where(bad, dst_nodata, out)
    else:
        out = np.where(np.isnan(out), dst_nodata, out)
    return out.astype(np.float32)


DEM_ARR = (np.sin(np.arange(60)[:, None] / 7.0) * 40
           + np.cos(np.arange(90)[None, :] / 11.0) * 25
           + np.arange(90)[None, :] * 0.3).astype(np.float32)
META = M.RasterMeta("dem", 90, 60, gt=GT, dtype="float32", block=16)


@pytest.fixture(scope="module")
def dem_tiles(spark):
    return M.from_array(spark, DEM_ARR, META).cache()


ALGS = [
    ("hillshade", D.hillshade, {}),
    ("hillshade_zt", D.hillshade, {"variant": "zt"}),
    ("hillshade_comb", D.hillshade, {"variant": "combined"}),
    ("slope", D.slope, {}),
    ("slope_pct", D.slope, {"percent": True}),
    ("aspect", D.aspect, {}),
    ("tri", D.tri, {}),
    ("tpi", D.tpi, {}),
    ("roughness", D.roughness, {}),
]


@pytest.mark.parametrize("name,fn,kw", ALGS, ids=[a[0] for a in ALGS])
def test_stencil_matches_direct(spark, dem_tiles, name, fn, kw):
    def bound(w, gt, _fn=fn, _kw=kw):
        return _fn(w, gt, **_kw)
    out, om = D.stencil_apply(dem_tiles, META, name, bound)
    got = M.to_array(out, om)
    want = direct(DEM_ARR.astype(np.float64), fn, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # border is nodata in default mode
    assert (got[0, :] == om.nodata).all() and (got[:, 0] == om.nodata).all()


def test_stencil_interpolate_edges(spark, dem_tiles):
    out, om = D.stencil_apply(dem_tiles, META, "sl", D.slope,
                              edges="interpolate")
    got = M.to_array(out, om)
    want = direct(DEM_ARR.astype(np.float64), D.slope, edges="interpolate")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    assert not (got[0, :] == om.nodata).any()


def test_hillshade_golden():
    """Hand-computed 3×3 window: flat plane tilted in x only."""
    # afWin planes for a ramp z = 2*x: row [0,2,4] everywhere
    pad = np.array([[0.0, 2, 4], [0, 2, 4], [0, 2, 4]])
    big = np.tile(pad, (3, 3))[:5, :5]  # not used; direct window below
    w = [np.array([[v]]) for v in (0, 2, 4, 0, 2, 4, 0, 2, 4)]
    got = D.hillshade(w, GT, alt=45.0, az=315.0)[0, 0]
    # x = ((0+0+0+0)-(4+4+4+4))/1 = -16, y = 0
    x = -16.0
    zfac = 1.0 / 8
    sin_alt = math.sin(math.radians(45))
    aspect = math.atan2(0.0, x)
    cang = (sin_alt - math.cos(math.radians(45)) * zfac * 16.0
            * math.sin(aspect - math.radians(315))) / math.sqrt(1 + zfac ** 2 * 256.0)
    want = 1.0 + 254.0 * cang if cang > 0 else 1.0
    assert got == pytest.approx(want, rel=1e-12)


def test_slope_golden():
    w = [np.array([[v]]) for v in (0, 2, 4, 0, 2, 4, 0, 2, 4)]
    # dx = -16 → slope = atan(16/8) in degrees
    assert D.slope(w, GT)[0, 0] == pytest.approx(math.degrees(math.atan(2.0)))
    assert D.slope(w, GT, percent=True)[0, 0] == pytest.approx(200.0)


def test_aspect_flat_nodata():
    w = [np.array([[5.0]])] * 9
    assert D.aspect(w, GT)[0, 0] == -9999.0


def test_tri_tpi_roughness_golden():
    vals = [1.0, 2, 3, 4, 5, 6, 7, 8, 9]
    w = [np.array([[v]]) for v in vals]
    assert D.tri(w, GT)[0, 0] == pytest.approx(
        sum(abs(v - 5) for v in (1, 2, 3, 4, 6, 7, 8, 9)) / 8)
    assert D.tpi(w, GT)[0, 0] == pytest.approx(5 - 40 / 8)
    assert D.roughness(w, GT)[0, 0] == 8.0
