"""Transverse Mercator / UTM (Krüger n^6): invariant-based validation —
round trips, meridian-arc oracle, scale factor, antisymmetry — plus the
distributed warp-to-UTM path."""

import numpy as np
import pytest

from gdal_spark.functions import proj as P


def test_roundtrip_nanometer():
    rng = np.random.RandomState(1)
    lat = rng.uniform(-80, 84, 500)
    lon0 = -75.0
    lon = lon0 + rng.uniform(-3, 3, 500)   # inside a UTM zone
    e, n = P.tm_forward(lat, lon, lon0)
    lat2, lon2 = P.tm_inverse(e, n, lon0)
    assert np.abs(lat2 - lat).max() < 1e-11   # ~1e-6 m
    assert np.abs(lon2 - lon).max() < 1e-11


def test_central_meridian_maps_to_meridian_arc():
    """On the CM: easting = FE exactly; northing = k0 * meridian arc,
    checked against an independent Simpson integration."""
    for lat in (0.0, 23.5, 45.0, 67.8):
        e, n = P.tm_forward(lat, -75.0, -75.0)
        assert e == pytest.approx(500000.0, abs=1e-6)
        arc = P.meridian_arc_numeric(lat)
        assert n == pytest.approx(P.UTM_K0 * arc, abs=1e-3)


def test_scale_factor_at_cm():
    """d(easting)/d(ground distance) at the CM = k0 = 0.9996."""
    lat, lon0 = 40.0, -75.0
    d = 1e-6  # degrees
    e1, _ = P.tm_forward(lat, lon0 - d, lon0)
    e2, _ = P.tm_forward(lat, lon0 + d, lon0)
    # ground distance of 2d degrees of longitude at lat on the ellipsoid
    e2_ecc = P.WGS84_F * (2 - P.WGS84_F)
    nu = P.WGS84_A / np.sqrt(1 - e2_ecc * np.sin(np.radians(lat)) ** 2)
    ground = np.radians(2 * d) * nu * np.cos(np.radians(lat))
    assert (e2 - e1) / ground == pytest.approx(0.9996, abs=1e-8)


def test_east_west_antisymmetry_and_hemispheres():
    e_w, n_w = P.tm_forward(30.0, -77.0, -75.0)
    e_e, n_e = P.tm_forward(30.0, -73.0, -75.0)
    assert e_e - 500000.0 == pytest.approx(-(e_w - 500000.0), abs=1e-9)
    assert n_e == pytest.approx(n_w, abs=1e-9)
    # southern hemisphere false northing
    _, n_s = P.utm_from_latlon(-30.0, -73.0, P.utm_zone(-75.0), north=False)
    assert 0 < n_s < P.UTM_FN_SOUTH


def test_utm_zone_numbers():
    assert P.utm_zone(-75.0) == 18
    assert P.utm_zone(0.5) == 31
    assert P.utm_zone(-180.0) == 1
    assert P.utm_central_meridian(18) == -75.0


def test_warp_latlon_to_utm(spark):
    """Distributed gdalwarp EPSG:4326 → UTM18N over the NYC window:
    nearest-neighbor warp must equal a direct numpy re-lookup."""
    from gdal_spark.raster import model as M
    from gdal_spark.raster import resample as R

    src_meta = M.RasterMeta("ll", 120, 100,
                            gt=(-75.5, 0.01, 0.0, 41.3, 0.0, -0.01), block=32)
    rng = np.random.RandomState(7)
    src = rng.randint(1, 255, size=(100, 120)).astype(np.uint8)
    # dst: 2km pixels around the same area in UTM18N
    e0, n1 = P.utm_from_latlon(41.3, -75.5, 18)
    dst_meta = M.RasterMeta("utm", 24, 20,
                            gt=(float(e0), 2000.0, 0.0, float(n1), 0.0, -2000.0),
                            block=16)
    tr = P.UtmWarpTransform(src_meta.gt, dst_meta.gt, zone=18)
    out = R.warp(M.from_array(spark, src, src_meta), src_meta, dst_meta,
                 "nearest", src_from_dst=tr)
    got = M.to_array(out, dst_meta)
    DX, DY = np.meshgrid(np.arange(24) + 0.5, np.arange(20) + 0.5)
    sx, sy = tr(DX, DY)
    ix = np.trunc(sx + 1e-10).astype(int)
    iy = np.trunc(sy + 1e-10).astype(int)
    ok = (ix >= 0) & (ix < 120) & (iy >= 0) & (iy < 100)
    want = np.zeros_like(got)
    want[ok] = src[iy[ok], ix[ok]]
    np.testing.assert_array_equal(got, want)
    assert ok.any() and got[ok].min() >= 1
