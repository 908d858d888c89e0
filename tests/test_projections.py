"""Round-4 projection long tail: EPSG Guidance Note 7-2 worked
examples, independent numeric oracles (meridian-arc integration,
conformality by numeric differentiation), and WKT codec round-trips.

Reference analog: GDAL delegates these projections to PROJ
(gdal/ogr/ogrct.cpp); expectations here are the *published* EPSG
worked examples, not reference outputs.
"""

import math

import numpy as np
import pytest

from gdal_spark.functions import projections as PX
from gdal_spark.functions import srs as S


def dms(d, m=0.0, s=0.0):
    sign = -1.0 if d < 0 else 1.0
    return sign * (abs(d) + m / 60.0 + s / 3600.0)


CLARKE_1866_F = 1.0 - 6356583.8 / 6378206.4
BESSEL = dict(a=6377397.155, f=1.0 / 299.15281)


# ---------------------------------------------------------------------------
# EPSG GN7-2 worked examples (published numbers)
# ---------------------------------------------------------------------------

def test_lcc1sp_jamaica_worked_example():
    crs = PX.LambertConformalConic1SP(
        lat0=18.0, lon0=-77.0, k0=1.0, fe=250000.0, fn=150000.0,
        a=6378206.4, f=CLARKE_1866_F)
    x, y = crs.forward(dms(-76, 56, 37.26), dms(17, 55, 55.80))
    assert abs(float(x) - 255966.58) < 0.02
    assert abs(float(y) - 142493.51) < 0.02
    lo, la = crs.inverse(x, y)
    assert abs(float(lo) - dms(-76, 56, 37.26)) < 1e-9
    assert abs(float(la) - dms(17, 55, 55.80)) < 1e-9


def test_hom_variant_b_timbalai_worked_example():
    crs = PX.HotineObliqueMercator(
        latc=4.0, lonc=115.0, alphac=dms(53, 18, 56.9537),
        gammac=dms(53, 7, 48.3685), k0=0.99984,
        fe=590476.87, fn=442857.65,
        a=6377298.556, f=1.0 / 300.8017, variant_b=True)
    x, y = crs.forward(dms(115, 48, 19.8196), dms(5, 23, 14.1129))
    assert abs(float(x) - 679245.73) < 0.02
    assert abs(float(y) - 596562.78) < 0.02
    lo, la = crs.inverse(x, y)
    assert abs(float(lo) - dms(115, 48, 19.8196)) < 1e-9
    assert abs(float(la) - dms(5, 23, 14.1129)) < 1e-9


def test_hom_variant_b_centre_maps_to_ec_nc():
    crs = PX.HotineObliqueMercator(
        latc=4.0, lonc=115.0, alphac=dms(53, 18, 56.9537),
        gammac=dms(53, 7, 48.3685), k0=0.99984,
        fe=590476.87, fn=442857.65,
        a=6377298.556, f=1.0 / 300.8017, variant_b=True)
    x, y = crs.forward(115.0, 4.0)
    assert abs(float(x) - 590476.87) < 1e-6
    assert abs(float(y) - 442857.65) < 1e-6


def test_oblique_stereographic_rd_new_worked_example():
    crs = PX.ObliqueStereographic(
        lat0=dms(52, 9, 22.178), lon0=dms(5, 23, 15.500),
        k0=0.9999079, fe=155000.0, fn=463000.0, **BESSEL)
    x, y = crs.forward(6.0, 53.0)
    assert abs(float(x) - 196105.283) < 0.002
    assert abs(float(y) - 557057.739) < 0.002
    lo, la = crs.inverse(x, y)
    assert abs(float(lo) - 6.0) < 1e-9
    assert abs(float(la) - 53.0) < 1e-9


def test_cassini_trinidad_worked_example():
    # Trinidad 1903, Clarke 1858 in Clarke's links
    crs = PX.CassiniSoldner(
        lat0=dms(10, 26, 30), lon0=dms(-61, 20, 0),
        fe=430000.0, fn=325000.0,
        a=31706587.88, f=1.0 / 294.2606764)
    x, y = crs.forward(-62.0, 10.0)
    assert abs(float(x) - 66644.94) < 0.02
    assert abs(float(y) - 82536.22) < 0.02
    lo, la = crs.inverse(x, y)
    assert abs(float(lo) + 62.0) < 1e-9
    assert abs(float(la) - 10.0) < 1e-8


def test_krovak_worked_example():
    # EPSG GN7-2: S-JTSK gridpoint; native axes (southing, westing)
    crs = PX.Krovak(east_north=False)
    x, y = crs.forward(dms(16, 50, 59.1790), dms(50, 12, 32.4416))
    assert abs(float(x) - 1050538.64) < 0.02
    assert abs(float(y) - 568991.00) < 0.02
    # East-North variant (EPSG 5514 axes)
    en = PX.Krovak(east_north=True)
    e, n = en.forward(dms(16, 50, 59.1790), dms(50, 12, 32.4416))
    assert abs(float(e) + 568991.00) < 0.02
    assert abs(float(n) + 1050538.64) < 0.02
    lo, la = en.inverse(e, n)
    assert abs(float(lo) - dms(16, 50, 59.1790)) < 1e-9
    assert abs(float(la) - dms(50, 12, 32.4416)) < 1e-9


def test_lcc_2sp_belgium_worked_example():
    # parameters as in the EPSG registry row for 31300
    crs = PX.LambertConformalConic2SPBelgium(
        lat1=dms(49, 50), lat2=dms(51, 10),
        lat0=90.0, lon0=dms(4, 21, 24.983),
        fe=150000.01256, fn=5400088.4378, a=6378388.0, f=1.0 / 297.0)
    x, y = crs.forward(dms(5, 48, 26.533), dms(50, 40, 46.461))
    assert abs(float(x) - 251763.20) < 0.02
    assert abs(float(y) - 153034.13) < 0.02


def test_swiss_bern_origin_exact():
    crs = PX.SwissObliqueMercator(
        lat0=dms(46, 57, 8.66), lon0=dms(7, 26, 22.50),
        k0=1.0, fe=600000.0, fn=200000.0, **BESSEL)
    x, y = crs.forward(dms(7, 26, 22.50), dms(46, 57, 8.66))
    assert abs(float(x) - 600000.0) < 1e-6
    assert abs(float(y) - 200000.0) < 1e-6
    # round-trip across Switzerland
    lon = np.linspace(6.0, 10.5, 7)
    lat = np.linspace(45.8, 47.8, 7)
    e, n = crs.forward(lon, lat)
    lo, la = crs.inverse(e, n)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


# ---------------------------------------------------------------------------
# independent numeric oracles
# ---------------------------------------------------------------------------

def numeric_meridian_arc(phi_deg, a, e2, n=200001):
    """Trapezoidal integration of the meridian integral — shares no
    code with projections.meridian_arc's series."""
    phi = np.linspace(0.0, math.radians(phi_deg), n)
    integrand = a * (1.0 - e2) / (1.0 - e2 * np.sin(phi) ** 2) ** 1.5
    return float(np.trapz(integrand, phi))


def test_meridian_arc_vs_numeric_integration():
    a, f = PX.WGS84
    e2 = f * (2.0 - f)
    for lat in (10.0, 35.0, 55.0, 80.0):
        series = float(PX.meridian_arc(math.radians(lat), a, e2))
        numeric = numeric_meridian_arc(lat, a, e2)
        assert abs(series - numeric) < 1e-3  # integration-limited
        # footpoint inverts the series to sub-nanometre
        back = float(PX.footpoint_latitude(np.float64(series), a, e2))
        assert abs(back - math.radians(lat)) < 1e-14


def test_equidistant_cylindrical_northing_is_meridian_arc():
    a, f = PX.WGS84
    e2 = f * (2.0 - f)
    crs = PX.EquidistantCylindrical(lat1=0.0, lon0=0.0, a=a, f=f)
    x, y = crs.forward(10.0, 55.0)
    assert abs(float(y) - numeric_meridian_arc(55.0, a, e2)) < 1e-3
    assert abs(float(x) - a * math.radians(10.0)) < 1e-9


def test_cassini_central_meridian_is_meridian_arc():
    a, f = PX.WGS84
    e2 = f * (2.0 - f)
    crs = PX.CassiniSoldner(lat0=10.0, lon0=20.0, a=a, f=f)
    x, y = crs.forward(20.0, 47.0)
    assert abs(float(x)) < 1e-9
    expect = numeric_meridian_arc(47.0, a, e2) - numeric_meridian_arc(
        10.0, a, e2)
    assert abs(float(y) - expect) < 2e-3


def test_equidistant_conic_meridian_distance_preserved():
    crs = PX.EquidistantConic(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0)
    a, f = PX.WGS84
    e2 = f * (2.0 - f)
    x1, y1 = crs.forward(-96.0, 30.0)
    x2, y2 = crs.forward(-96.0, 44.0)
    d = math.hypot(float(x2) - float(x1), float(y2) - float(y1))
    expect = numeric_meridian_arc(44.0, a, e2) - numeric_meridian_arc(
        30.0, a, e2)
    assert abs(d - expect) < 2e-3
    # scale along both standard parallels is 1 (numeric)
    for latsp in (29.5, 45.5):
        x1, y1 = crs.forward(-96.0, latsp)
        x2, y2 = crs.forward(-96.0 + 1e-4, latsp)
        dproj = math.hypot(float(x2) - float(x1), float(y2) - float(y1))
        s = math.sin(math.radians(latsp))
        nu = PX.WGS84[0] / math.sqrt(1.0 - e2 * s * s)
        dell = nu * math.cos(math.radians(latsp)) * math.radians(1e-4)
        assert abs(dproj / dell - 1.0) < 1e-6


def test_polyconic_parallels_are_circles():
    crs = PX.Polyconic(lat0=30.0, lon0=-96.0)
    a, f = PX.WGS84
    e2 = f * (2.0 - f)
    lat = 40.0
    s = math.sin(math.radians(lat))
    nu = a / math.sqrt(1.0 - e2 * s * s)
    r = nu / math.tan(math.radians(lat))
    # circle centre: on the central meridian at y(phi) + R
    x0, y0 = crs.forward(-96.0, lat)
    cx, cy = float(x0), float(y0) + r
    for dlon in (2.0, 5.0, 9.0, -7.0):
        x, y = crs.forward(-96.0 + dlon, lat)
        dist = math.hypot(float(x) - cx, float(y) - cy)
        assert abs(dist - r) < 1e-6
    # inverse round-trip
    lon = np.array([-100.0, -96.0, -88.5])
    latv = np.array([25.0, 30.0, 41.0])
    x, y = crs.forward(lon, latv)
    lo, la = crs.inverse(x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, latv, atol=1e-9)


def _numeric_scale(crs, lon, lat, a, f):
    """Local scale factors along meridian/parallel by central
    differences over the ellipsoid — independent of the projection's
    own math."""
    e2 = f * (2.0 - f)
    s = math.sin(math.radians(lat))
    nu = a / math.sqrt(1.0 - e2 * s * s)
    rho = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
    h = 1e-6
    x1, y1 = crs.forward(lon, lat - h)
    x2, y2 = crs.forward(lon, lat + h)
    k_mer = (math.hypot(float(x2) - float(x1), float(y2) - float(y1))
             / (2.0 * h * math.radians(1.0) * rho))
    x1, y1 = crs.forward(lon - h, lat)
    x2, y2 = crs.forward(lon + h, lat)
    k_par = (math.hypot(float(x2) - float(x1), float(y2) - float(y1))
             / (2.0 * h * math.radians(1.0) * nu
                * math.cos(math.radians(lat))))
    return k_mer, k_par


@pytest.mark.parametrize("name,crs,pts", [
    ("sterea", PX.ObliqueStereographic(
        lat0=52.15616056, lon0=5.38763889, k0=0.9999079,
        fe=155000.0, fn=463000.0, **BESSEL),
     [(5.4, 52.2), (6.8, 53.1), (4.2, 51.2)]),
    ("somerc", PX.SwissObliqueMercator(
        lat0=46.95240556, lon0=7.43958333, k0=1.0,
        fe=600000.0, fn=200000.0, **BESSEL),
     [(7.5, 47.0), (9.8, 46.2), (6.1, 46.4)]),
    ("krovak", PX.Krovak(),
     [(15.0, 50.0), (17.5, 49.2), (13.2, 50.6)]),
    ("omerc", PX.HotineObliqueMercator(
        latc=4.0, lonc=115.0, alphac=53.31582, gammac=53.13010,
        k0=0.99984, a=6377298.556, f=1.0 / 300.8017, variant_b=True),
     [(115.0, 4.0), (117.0, 5.5), (113.5, 3.0)]),
])
def test_conformality_numeric(name, crs, pts):
    """Conformal projections must have isotropic local scale — catches
    virtually any formula transcription error."""
    a = crs.a
    f = crs.f
    for lon, lat in pts:
        k_mer, k_par = _numeric_scale(crs, lon, lat, a, f)
        assert abs(k_mer / k_par - 1.0) < 1e-6, (name, lon, lat)


def test_swiss_scale_at_origin_is_k0():
    for k0 in (1.0, 0.99994):
        crs = PX.SwissObliqueMercator(
            lat0=46.95240556, lon0=7.43958333, k0=k0, **BESSEL)
        k_mer, k_par = _numeric_scale(crs, 7.43958333, 46.95240556,
                                      crs.a, crs.f)
        assert abs(k_mer - k0) < 1e-7
        assert abs(k_par - k0) < 1e-7


def test_krovak_scale_on_pseudo_standard_parallel():
    # scale along the pseudo standard parallel equals kp = 0.9999:
    # verify at the projection-centre meridian where U ≈ T.
    crs = PX.Krovak(east_north=False)
    # find the lon/lat whose oblique latitude T hits the pseudo
    # standard parallel along lon0: U = latp - alphac shift — probe
    # numerically instead: scan latitudes, take min |k-0.9999|
    best = 1.0
    for lat in np.linspace(48.0, 51.5, 36):
        k_mer, k_par = _numeric_scale(crs, crs.lon0 - 7.0, float(lat),
                                      crs.a, crs.f)
        best = min(best, abs(k_mer - 0.9999))
    assert best < 2e-5


def test_tm_south_orientated_axes():
    # Hartebeesthoek94 / Lo29: westing/southing positive in the
    # south-west quadrant of (lon0, equator)
    crs = PX.TransverseMercatorSouth(lon0=29.0)
    x, y = crs.forward(28.28, -25.73)
    assert float(x) > 0 and float(y) > 0  # west of lon0, south of 0
    assert abs(float(x) - 72000) < 4000   # ~0.72 deg of longitude
    assert abs(float(y) - 2847000) < 5000  # ~25.73 deg meridian arc
    lo, la = crs.inverse(x, y)
    assert abs(float(lo) - 28.28) < 1e-9
    assert abs(float(la) + 25.73) < 1e-9


def test_lcc_west_orientated():
    base = PX.LambertConformalConic1SP(lat0=60.0, lon0=-45.0, k0=1.0,
                                       fe=0.0, fn=0.0)
    west = PX.LambertConformalConicWest(lat0=60.0, lon0=-45.0, k0=1.0,
                                        fe=500000.0, fn=0.0)
    xb, yb = base.forward(-43.0, 61.0)
    xw, yw = west.forward(-43.0, 61.0)
    assert abs((500000.0 - float(xw)) - float(xb)) < 1e-9
    assert abs(float(yw) - float(yb)) < 1e-9
    lo, la = west.inverse(xw, yw)
    assert abs(float(lo) + 43.0) < 1e-9 and abs(float(la) - 61.0) < 1e-9


def test_unit_scaled_wrapper():
    inner = PX.CassiniSoldner(lat0=10.0, lon0=-61.0)
    ft = PX.UnitScaled(inner, 0.3048)
    xm, ym = inner.forward(-61.5, 10.5)
    xf, yf = ft.forward(-61.5, 10.5)
    assert abs(float(xf) * 0.3048 - float(xm)) < 1e-9
    lo, la = ft.inverse(xf, yf)
    assert abs(float(lo) + 61.5) < 1e-9 and abs(float(la) - 10.5) < 1e-9


# ---------------------------------------------------------------------------
# WKT codec round-trips for every new class
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("crs", [
    PX.LambertConformalConic1SP(lat0=18, lon0=-77, fe=250000, fn=150000,
                                a=6378206.4, f=CLARKE_1866_F),
    PX.LambertConformalConic2SPBelgium(
        lat1=49.83334, lat2=51.16667, lat0=90.0, lon0=4.367486,
        fe=150000.013, fn=5400088.438, a=6378388.0, f=1.0 / 297.0),
    PX.CassiniSoldner(lat0=10.44167, lon0=-61.33333, fe=86501.46,
                      fn=65379.01),
    PX.TransverseMercatorSouth(lon0=29.0),
    PX.ObliqueStereographic(lat0=52.15616, lon0=5.38764, k0=0.9999079,
                            fe=155000, fn=463000, **BESSEL),
    PX.HotineObliqueMercator(latc=4, lonc=115, alphac=53.31582,
                             gammac=53.13010, k0=0.99984, fe=590476.87,
                             fn=442857.65, a=6377298.556,
                             f=1.0 / 300.8017, variant_b=True),
    PX.HotineObliqueMercator(latc=45.30916, lonc=-86, alphac=337.25556,
                             gammac=337.25556, k0=0.9996,
                             fe=2546731.496, fn=-4354009.816),
    PX.SwissObliqueMercator(lat0=46.952406, lon0=7.439583, fe=600000,
                            fn=200000, **BESSEL),
    PX.Polyconic(lat0=0.0, lon0=-54.0, fe=5000000, fn=10000000),
    PX.Krovak(),
    PX.EquidistantCylindrical(lat1=30.0, lon0=10.0),
    PX.EquidistantConic(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0),
])
def test_wkt_roundtrip(crs):
    wkt = S.crs_to_wkt(crs)
    back = S.crs_from_wkt(wkt)
    lat0 = getattr(crs, "lat0", None)
    if lat0 is None:
        lat0 = getattr(crs, "latc", 0.0)
    if lat0 == 90.0:
        lat0 = 50.0
    lon0 = getattr(crs, "lon0", None)
    if lon0 is None:
        lon0 = getattr(crs, "lonc", 0.0)
    lon = np.array([lon0 + 0.5, lon0 - 0.3])
    lat = np.array([lat0 + 0.4, lat0 - 0.2])
    x1, y1 = crs.forward(lon, lat)
    x2, y2 = back.forward(lon, lat)
    np.testing.assert_allclose(x1, x2, atol=1e-9)
    np.testing.assert_allclose(y1, y2, atol=1e-9)
