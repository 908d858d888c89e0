"""Round-3 SRS family additions: Polar Stereographic, Lambert Azimuthal
Equal-Area, ellipsoidal Mercator, Sinusoidal, arbitrary-ellipsoid
Transverse Mercator (British National Grid), and the TOWGS84 geocentric
Helmert datum path.

Validation strategy (no PROJ in this container, so no library oracle):

- exact anchors (pole/origin points whose coordinates are definitional),
- forward/inverse round trips to ~1e-9 degrees,
- the defining *differential* property of each projection checked by
  numeric differentiation against the ellipsoid's metric — conformality
  (isotropic scale) for Polar Stereographic/Mercator, unit Jacobian
  (equal-area) for LAEA/Sinusoidal, true scale along the standard
  parallel for the variant-B forms,
- the EPSG Guidance Note 7-2 worked examples for geographic↔geocentric
  (EPSG method 9602) and the position-vector Helmert (9606) — published
  numeric cases, reproduced to the printed precision,
- WKT1 round trips through crs_to_wkt/crs_from_wkt including TOWGS84.

Reference analog: gdal/ogr/ogrct.cpp (PROJ-backed OGRCreateCoordinate-
Transformation); gdal/autotest/osr/osr_ct.py exercises the same
transforms against PROJ.
"""

import math

import numpy as np
import pytest

from gdal_spark.functions import srs as S

WGS84_A, WGS84_F = S.WGS84
E2 = WGS84_F * (2.0 - WGS84_F)


def _grid(lon_rng, lat_rng, n=13):
    lon = np.linspace(*lon_rng, n)
    lat = np.linspace(*lat_rng, n)
    return np.meshgrid(lon, lat)


def _roundtrip(crs, lon_rng, lat_rng, tol=1e-9):
    LO, LA = _grid(lon_rng, lat_rng)
    X, Y = crs.forward(LO, LA)
    lo, la = crs.inverse(X, Y)
    dlon = (np.abs(lo - LO) + 180.0) % 360.0 - 180.0  # wrap at the antimeridian
    assert np.abs(dlon).max() < tol
    assert np.abs(la - LA).max() < tol


def _meridian_scale(crs, lon, lat, a=WGS84_A, f=WGS84_F):
    e2 = f * (2.0 - f)
    h = 5e-7
    x1, y1 = crs.forward(lon, lat - h)
    x2, y2 = crs.forward(lon, lat + h)
    rho_m = a * (1 - e2) / (1 - e2 * math.sin(math.radians(lat)) ** 2) ** 1.5
    return math.hypot(x2 - x1, y2 - y1) / (math.radians(2 * h) * rho_m)


def _parallel_scale(crs, lon, lat, a=WGS84_A, f=WGS84_F):
    e2 = f * (2.0 - f)
    h = 5e-7
    x1, y1 = crs.forward(lon - h, lat)
    x2, y2 = crs.forward(lon + h, lat)
    nu = a / math.sqrt(1 - e2 * math.sin(math.radians(lat)) ** 2)
    return (math.hypot(x2 - x1, y2 - y1)
            / (math.radians(2 * h) * nu * math.cos(math.radians(lat))))


def _area_ratio(crs, lon, lat, a=WGS84_A, f=WGS84_F):
    """|det J| of (x,y) wrt (lon,lat) over the ellipsoid area element —
    exactly 1 everywhere iff the projection is equal-area."""
    e2 = f * (2.0 - f)
    h = 1e-5
    x0, y0 = crs.forward(lon - h, lat)
    x1, y1 = crs.forward(lon + h, lat)
    x2, y2 = crs.forward(lon, lat - h)
    x3, y3 = crs.forward(lon, lat + h)
    det = abs((x1 - x0) * (y3 - y2) - (y1 - y0) * (x3 - x2)) / (2 * h) ** 2
    det *= (180.0 / math.pi) ** 2
    p = math.radians(lat)
    elem = a * a * (1 - e2) * math.cos(p) / (1 - e2 * math.sin(p) ** 2) ** 2
    return det / elem


class TestPolarStereographic:
    def test_ups_north_pole_is_false_origin(self):
        ups = S.crs_from_epsg(5041)
        x, y = ups.forward(0.0, 90.0)
        assert (float(x), float(y)) == (2000000.0, 2000000.0)

    def test_roundtrip_north_and_south(self):
        _roundtrip(S.crs_from_epsg(5041), (-179, 179), (60, 89.5))
        _roundtrip(S.crs_from_epsg(3031), (-179, 179), (-89.5, -60))
        _roundtrip(S.crs_from_epsg(3413), (-179, 179), (55, 89))

    def test_true_scale_at_standard_parallel(self):
        aps = S.crs_from_epsg(3031)
        for lon in (-120.0, 0.0, 77.0):
            assert abs(_meridian_scale(aps, lon, -71.0) - 1.0) < 1e-6

    def test_conformal(self):
        aps = S.crs_from_epsg(3031)
        for lon, lat in ((0.0, -75.0), (100.0, -65.0), (-45.0, -85.0)):
            km = _meridian_scale(aps, lon, lat)
            kp = _parallel_scale(aps, lon, lat)
            assert abs(km / kp - 1.0) < 1e-6

    def test_ups_variant_a_scale_at_pole(self):
        # variant A: k0 is the central scale — 0.994 exactly at the pole
        ups = S.crs_from_epsg(5041)
        k = _meridian_scale(ups, 0.0, 89.9999999)
        assert abs(k - 0.994) < 1e-6

    def test_longitude_orientation(self):
        # north aspect: x grows along lon0+90 (east of grid north)
        ps = S.PolarStereographic(lat_ts=70.0, lon0=-45.0)
        # at lon = lon0 the point lies on the -y axis (grid south of
        # the pole); at lon0+180 on +y; at lon0+90 on +x
        x0, y0 = ps.forward(-45.0, 80.0)
        assert abs(float(x0)) < 1e-6 and float(y0) < 0
        xa, ya = ps.forward(135.0, 80.0)
        assert abs(float(xa)) < 1e-6 and float(ya) > 0
        xe, ye = ps.forward(45.0, 80.0)
        assert abs(float(ye)) < 1e-6 and float(xe) > 0


class TestLAEA:
    def test_3035_false_origin(self):
        laea = S.crs_from_epsg(3035)
        x, y = laea.forward(10.0, 52.0)
        assert abs(float(x) - 4321000.0) < 1e-6
        assert abs(float(y) - 3210000.0) < 1e-6

    def test_roundtrip(self):
        _roundtrip(S.crs_from_epsg(3035), (-10, 30), (35, 70))

    def test_equal_area(self):
        laea = S.crs_from_epsg(3035)
        grs80_f = 1.0 / 298.257222101
        for lon, lat in ((0.0, 40.0), (20.0, 60.0), (-9.0, 36.0), (25.0, 70.0)):
            assert abs(_area_ratio(laea, lon, lat, f=grs80_f) - 1.0) < 1e-7

    def test_polar_aspect(self):
        pl = S.LambertAzimuthalEqualArea(lat0=90.0)
        x, y = pl.forward(0.0, 90.0)
        assert (float(x), float(y)) == (0.0, 0.0)
        _roundtrip(pl, (-179, 179), (40, 89.9))
        assert abs(_area_ratio(pl, 30.0, 75.0) - 1.0) < 1e-7
        ps = S.LambertAzimuthalEqualArea(lat0=-90.0)
        _roundtrip(ps, (-179, 179), (-89.9, -40))

    def test_equatorial_aspect(self):
        eq = S.LambertAzimuthalEqualArea(lat0=0.0, lon0=20.0)
        _roundtrip(eq, (-60, 100), (-70, 70))
        assert abs(_area_ratio(eq, 40.0, 10.0) - 1.0) < 1e-7


class TestMercator:
    def test_roundtrip(self):
        _roundtrip(S.crs_from_epsg(3395), (-170, 170), (-80, 80))

    def test_conformal(self):
        m = S.crs_from_epsg(3395)
        for lon, lat in ((10.0, 40.0), (-120.0, -55.0), (0.0, 0.0)):
            assert abs(_meridian_scale(m, lon, lat)
                       / _parallel_scale(m, lon, lat) - 1.0) < 1e-6

    def test_equator_is_unit_scale_variant_a(self):
        m = S.Mercator()
        assert abs(_parallel_scale(m, 30.0, 1e-7) - 1.0) < 1e-6

    def test_variant_b_true_at_lat_ts(self):
        m = S.Mercator(lat_ts=42.0)
        assert abs(_parallel_scale(m, 7.0, 42.0) - 1.0) < 1e-8

    def test_differs_from_spherical_webmercator(self):
        # the y of the true-ellipsoid Mercator differs from EPSG 3857 by
        # the well-known ~0.7% latitude-dependent amount
        m, w = S.Mercator(), S.WebMercator()
        _, ym = m.forward(0.0, 45.0)
        _, yw = w.forward(0.0, 45.0)
        assert 0.002 < (yw - ym) / ym < 0.01


class TestSinusoidal:
    def test_modis_roundtrip_and_area(self):
        sn = S.MODIS_SINU
        _roundtrip(sn, (-170, 170), (-80, 80), tol=1e-9)
        for lon, lat in ((120.0, -33.0), (0.0, 0.0), (-60.0, 70.0)):
            assert abs(_area_ratio(sn, lon, lat, a=6371007.181, f=0.0)
                       - 1.0) < 1e-7

    def test_ellipsoidal_roundtrip_and_area(self):
        ws = S.Sinusoidal()
        # series truncation leaves ~1e-7 deg; document that bound
        _roundtrip(ws, (-170, 170), (-80, 80), tol=5e-7)
        assert abs(_area_ratio(ws, 120.0, -33.0) - 1.0) < 1e-7

    def test_central_meridian_is_meridian_arc(self):
        ws = S.Sinusoidal()
        _, y = ws.forward(0.0, 48.0)
        from gdal_spark.functions.proj import meridian_arc_numeric
        # Snyder 3-21 truncates at e^6: sub-mm agreement
        assert abs(float(y) - meridian_arc_numeric(48.0)) < 1e-3


class TestGeneralEllipsoidTM:
    def test_bng_true_origin(self):
        bng = S.crs_from_epsg(27700)
        x, y = bng.crs.forward(-2.0, 49.0)
        assert abs(float(x) - 400000.0) < 1e-6
        assert abs(float(y) - (-100000.0)) < 1e-6

    def test_bng_scale_on_central_meridian(self):
        bng = S.crs_from_epsg(27700).crs
        k = _meridian_scale(bng, -2.0, 53.0, a=6377563.396,
                            f=1.0 / 299.3249646)
        assert abs(k - 0.9996012717) < 1e-8

    def test_wgs84_kruger_constants_unchanged(self):
        # generalization must not move the precomputed WGS84 constants
        # (the warp_utm oracle embeds them as exact doubles)
        from gdal_spark.functions import proj as PJ
        abar_f, alpha, beta, delta, e2s = PJ.kruger_coefficients(PJ.WGS84_F)
        assert PJ.A_BAR == PJ.WGS84_A * abar_f
        assert np.array_equal(PJ.ALPHA, alpha)
        assert np.array_equal(PJ.BETA, beta)
        assert np.array_equal(PJ.DELTA, delta)

    def test_roundtrip_airy(self):
        bng = S.crs_from_epsg(27700).crs
        _roundtrip(bng, (-8, 2), (50, 61))


class TestDatumTransforms:
    def test_geodetic_to_geocentric_epsg_worked_example(self):
        # EPSG Guidance Note 7-2, method 9602 worked example (WGS84):
        # lat 53°48'33.82"N lon 2°07'46.38"E h 73.0 m
        X, Y, Z = S.geodetic_to_geocentric(2.12955, 53.80939444, 73.0)
        assert abs(float(X) - 3771793.968) < 0.01
        assert abs(float(Y) - 140253.342) < 0.01
        assert abs(float(Z) - 5124304.349) < 0.01

    def test_geocentric_roundtrip(self):
        lon = np.linspace(-179, 179, 11)
        lat = np.linspace(-89.99, 89.99, 11)
        LO, LA = np.meshgrid(lon, lat)
        H = np.full_like(LO, 321.5)
        X, Y, Z = S.geodetic_to_geocentric(LO, LA, H)
        lo, la, h = S.geocentric_to_geodetic(X, Y, Z)
        assert np.abs(lo - LO).max() < 1e-9
        assert np.abs(la - LA).max() < 1e-9
        assert np.abs(h - H).max() < 1e-6

    def test_helmert_epsg_worked_example(self):
        # EPSG Guidance Note 7-2, method 9606 (position vector) worked
        # example: WGS72 -> WGS84, tz=4.5 m, rz=0.554", ds=0.219 ppm
        p = (0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219)
        X, Y, Z = S.helmert(3657660.66, 255768.55, 5201382.11, p)
        assert abs(float(X) - 3657660.78) < 0.01
        assert abs(float(Y) - 255778.43) < 0.01
        assert abs(float(Z) - 5201387.75) < 0.01
        # the EPSG small-angle reversal is approximate to O(r^2) ~ 0.03 mm
        x, y, z = S.helmert(X, Y, Z, p, inverse=True)
        assert abs(float(x) - 3657660.66) < 1e-3
        assert abs(float(y) - 255768.55) < 1e-3
        assert abs(float(z) - 5201382.11) < 1e-3

    def test_datum_shifted_roundtrip(self):
        bng = S.crs_from_epsg(27700)
        lo, la = bng.inverse(*bng.forward(-0.1276, 51.5072))
        assert abs(lo - (-0.1276)) < 1e-7
        assert abs(la - 51.5072) < 1e-7

    def test_datum_shift_magnitude(self):
        # OSGB36 grid coords of a WGS84 point must differ from the
        # no-shift projection by the ~100 m datum offset, not ~0
        bng = S.crs_from_epsg(27700)
        x1, y1 = bng.forward(-0.1276, 51.5072)
        x0, y0 = bng.crs.forward(-0.1276, 51.5072)
        d = math.hypot(float(x1 - x0), float(y1 - y0))
        assert 50.0 < d < 200.0


class TestWktCodec:
    @pytest.mark.parametrize("code", [5041, 3031, 3413, 3035, 3395, 27700])
    def test_epsg_wkt_roundtrip(self, code):
        crs = S.crs_from_epsg(code)
        back = S.crs_from_wkt(S.crs_to_wkt(crs))
        lo, la = (12.3, 47.6) if code in (3035, 3395) else \
                 ((-1.5, 52.0) if code == 27700 else
                  ((30.0, 80.0) if code in (5041, 3413) else (30.0, -75.0)))
        assert np.allclose(crs.forward(lo, la), back.forward(lo, la),
                           atol=1e-9)

    def test_sphere_wkt(self):
        back = S.crs_from_wkt(S.crs_to_wkt(S.MODIS_SINU))
        assert isinstance(back, S.Sinusoidal)
        assert back.f == 0.0 and back.a == 6371007.181

    def test_towgs84_node_roundtrip(self):
        wkt = S.crs_to_wkt(S.crs_from_epsg(27700))
        assert "TOWGS84[" in wkt
        back = S.crs_from_wkt(wkt)
        assert isinstance(back, S.DatumShifted)
        assert back.towgs84 == S.OSGB36_TOWGS84

    def test_geogcs_with_towgs84(self):
        wkt = ('GEOGCS["OSGB36",DATUM["OSGB_1936",'
               'SPHEROID["Airy 1830",6377563.396,299.3249646],'
               'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.8421,'
               '-20.4894]],PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433]]')
        crs = S.crs_from_wkt(wkt)
        assert isinstance(crs, S.DatumShifted)
        assert isinstance(crs.crs, S.Geographic)
        # forward: WGS84 lon/lat -> OSGB36 lon/lat (shift ~ 1e-3 deg)
        lo, la = crs.forward(-0.1276, 51.5072)
        assert 1e-4 < abs(lo - (-0.1276)) < 5e-3
        assert 1e-5 < abs(la - 51.5072) < 5e-3
