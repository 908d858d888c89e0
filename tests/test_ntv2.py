"""NTv2 datum-shift grid reader/writer + shift application.

Geometry golden from the reference autotest (gdrivers/ntv2.py
ntv2_online_1: the NZGD2000 grid's header maps to geotransform
(165.95, 0.1, 0, -33.95, 0, -0.1)) re-created synthetically with the
same header values; roundtrip and bilinear checks are exact."""

import numpy as np
import pytest

from gdal_spark.raster.model import to_array
from gdal_spark.raster.ntv2 import (NTv2Grid, apply_shift, read_ntv2,
                                    read_ntv2_grids, write_ntv2)


def _nz_grid():
    # nzgd2kgrid0005 header: lat -34..-48 step 0.1 deg? Use the
    # documented gt: gt0=165.95 -> w_long=-166*3600 (positive west),
    # gt3=-33.95 -> n_lat=-34*3600 + inc/2 ... n_lat=-34*3600
    lat_inc = long_inc = 0.1 * 3600
    n_lat = -34.0 * 3600
    s_lat = -48.0 * 3600
    w_long = -166.0 * 3600     # = 166 E in positive-west convention
    e_long = -179.0 * 3600
    g = NTv2Grid("NZGD", s_lat, n_lat, e_long, w_long, lat_inc,
                 long_inc, np.zeros((1, 1, 4), "f4"))
    h, w = g.height, g.width
    rng = np.random.default_rng(7)
    g.data = rng.random((h, w, 4)).astype("float32")
    return g


def test_geotransform_golden():
    g = _nz_grid()
    gt = g.geotransform()
    want = (165.95, 0.1, 0.0, -33.95, 0.0, -0.1)
    assert max(abs(a - b) for a, b in zip(gt, want)) < 1e-12
    assert (g.width, g.height) == (131, 141)


def test_roundtrip(tmp_path):
    g = _nz_grid()
    p = str(tmp_path / "grid.gsb")
    write_ntv2(p, [g])
    g2 = read_ntv2_grids(p)[0]
    assert g2.name == "NZGD"
    assert (g2.width, g2.height) == (g.width, g.height)
    np.testing.assert_array_equal(g2.data, g.data)
    assert g2.geotransform() == g.geotransform()


def test_raster_view(spark, tmp_path):
    g = _nz_grid()
    p = str(tmp_path / "grid.gsb")
    write_ntv2(p, [g])
    df, meta, g2 = read_ntv2(spark, p)
    assert (meta.width, meta.height) == (131, 141)
    np.testing.assert_allclose(to_array(df, meta, band=1),
                               g.data[:, :, 1])


def test_bilinear_shift(tmp_path):
    # constant-shift grid: every point shifts by exactly that amount
    g = _nz_grid()
    g.data[:, :, 0] = 3.6     # +3.6 arcsec lat
    g.data[:, :, 1] = 7.2     # 7.2 arcsec west
    lon, lat = apply_shift(g, np.array([170.0]), np.array([-40.0]))
    assert abs(lat[0] - (-40.0 + 0.001)) < 1e-9
    assert abs(lon[0] - (170.0 - 0.002)) < 1e-9
    # out-of-grid points pass through
    lon, lat = apply_shift(g, np.array([10.0]), np.array([50.0]))
    assert lon[0] == 10.0 and lat[0] == 50.0


def test_bilinear_interpolation_exact():
    # linear field: bilinear must reproduce it exactly
    g = _nz_grid()
    H, W = g.data.shape[:2]
    yy, xx = np.mgrid[0:H, 0:W]
    g.data[:, :, 0] = (xx * 0.5 + yy * 0.25).astype("float32")
    g.data[:, :, 1] = 0
    gt = g.geotransform()
    # a point 30% of a cell east and 60% south of node (10, 10)
    lon = gt[0] + gt[1] * (10 + 0.3 + 0.5)
    lat = gt[3] + gt[5] * (10 + 0.6 + 0.5)
    _lon2, lat2 = apply_shift(g, np.array([lon]), np.array([lat]))
    want = (10.3 * 0.5 + 10.6 * 0.25) / 3600.0
    assert abs((lat2[0] - lat) - want) < 1e-9
