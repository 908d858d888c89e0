"""Data-driven importFromEPSG (functions/epsg.py over the bundled EPSG
Geodetic Parameter Dataset tables).

Reference analog: gdal/ogr/ogr_fromepsg.cpp reads the same pcs.csv /
gcs.csv / ellipsoid.csv / prime_meridian.csv / unit_of_measure.csv
tables; tests assert the assembly rules GDAL applies (sexagesimal DMS
parse, prime-meridian folding, 9607→9606 rotation negation, linear
units) plus a full-registry round-trip sweep.
"""

import math

import numpy as np
import pytest

from gdal_spark.functions import epsg as E
from gdal_spark.functions import projections as PX
from gdal_spark.functions import srs as S


def test_sexagesimal_dms_parse():
    assert E.parse_sexagesimal_dms("46.5707966") == pytest.approx(
        46 + 57 / 60 + 7.966 / 3600, abs=1e-12)
    assert E.parse_sexagesimal_dms("-17.4") == pytest.approx(
        -(17 + 40 / 60), abs=1e-12)
    assert E.parse_sexagesimal_dms("30.1717303") == pytest.approx(
        30 + 17 / 60 + 17.303 / 3600, abs=1e-12)
    assert E.parse_sexagesimal_dms("49.3") == pytest.approx(49.5, abs=0)
    assert E.parse_sexagesimal_dms("0") == 0.0
    assert E.parse_sexagesimal_dms("-0.52") == pytest.approx(
        -(52 / 60), abs=1e-12)


def test_unit_factors():
    assert E.length_factor("9001") == 1.0
    assert E.length_factor("9002") == 0.3048
    assert E.length_factor("9003") == pytest.approx(1200 / 3937, rel=0)
    assert E.angle_deg("200", "9105") == pytest.approx(180.0)  # grads
    assert E.angle_deg("3600", "9104") == pytest.approx(1.0)  # arcsec


def test_registry_has_expected_coverage():
    codes = E.supported_projected_codes()
    assert len(codes) > 3800
    for must in (32633, 27700, 28992, 5514, 21781, 2056, 31300, 2263,
                 29371, 30200, 2154, 3035, 5070, 27561):
        assert must in codes, must


def test_utm_matches_handbuilt():
    reg = E.build_projected(32633)
    hand = S.utm_crs(33, north=True)
    lon = np.array([14.2, 16.8])
    lat = np.array([48.1, 55.3])
    np.testing.assert_allclose(reg.forward(lon, lat),
                               hand.forward(lon, lat), atol=2e-8)


def test_ferro_prime_meridian_folding():
    """EPSG 2065 (S-JTSK Ferro / Krovak) and 5513 (Greenwich source)
    define the same projection; after PM folding both must accept
    Greenwich longitudes and agree."""
    a = E.build_projected(2065)
    b = E.build_projected(5513)
    while isinstance(a, S.DatumShifted):
        a = a.crs
    while isinstance(b, S.DatumShifted):
        b = b.crs
    lon, lat = 15.0, 50.0
    xa, ya = a.forward(lon, lat)
    xb, yb = b.forward(lon, lat)
    assert abs(float(xa) - float(xb)) < 1e-6
    assert abs(float(ya) - float(yb)) < 1e-6


def test_krovak_5514_east_north_worked_example():
    crs = E.build_projected(5514)
    while isinstance(crs, S.DatumShifted):
        crs = crs.crs
    lon = 16 + 50 / 60 + 59.1790 / 3600
    lat = 50 + 12 / 60 + 32.4416 / 3600
    e, n = crs.forward(lon, lat)
    assert abs(float(e) + 568991.00) < 0.05
    assert abs(float(n) + 1050538.64) < 0.05


def test_rd_new_28992_worked_example():
    crs = E.build_projected(28992)
    while isinstance(crs, S.DatumShifted):
        crs = crs.crs
    x, y = crs.forward(6.0, 53.0)
    assert abs(float(x) - 196105.283) < 0.01
    assert abs(float(y) - 557057.739) < 0.01


def test_ch1903_bern_origin():
    crs = E.build_projected(21781)
    while isinstance(crs, S.DatumShifted):
        crs = crs.crs
    x, y = crs.forward(7 + 26 / 60 + 22.50 / 3600,
                       46 + 57 / 60 + 8.66 / 3600)
    assert abs(float(x) - 600000.0) < 1e-5
    assert abs(float(y) - 200000.0) < 1e-5
    # LV95 (EPSG 2056) shifts the false origin by +2,000,000/+1,000,000
    lv95 = E.build_projected(2056)
    while isinstance(lv95, S.DatumShifted):
        lv95 = lv95.crs
    x2, y2 = lv95.forward(8.0, 47.0)
    x1, y1 = crs.forward(8.0, 47.0)
    assert abs((float(x2) - float(x1)) - 2000000.0) < 1e-6
    assert abs((float(y2) - float(y1)) - 1000000.0) < 1e-6


def test_ftus_state_plane_unit():
    """NAD83 / New York Long Island (ftUS): the central meridian maps
    to the published false easting 984250 ftUS exactly."""
    crs = E.build_projected(2263)
    base = crs.crs if isinstance(crs, S.DatumShifted) else crs
    assert isinstance(base, PX.UnitScaled)
    assert base.metres_per_unit == pytest.approx(1200 / 3937, rel=0)
    x, y = base.forward(-74.0, 40.7)
    assert abs(float(x) - 984250.0) < 1e-6


def test_towgs84_9607_rotation_negation():
    """gcs.csv 3819 (HD1909) ships a 9607 coordinate-frame shift
    (rx=-4.115...); the loader must negate rotations into the
    position-vector convention."""
    crs = E.build_geographic(3819)
    assert isinstance(crs, S.DatumShifted)
    dx, dy, dz, rx, ry, rz, ds = crs.towgs84
    assert (dx, dy, dz) == (595.48, 121.69, 515.35)
    assert rx == pytest.approx(4.115)
    assert ry == pytest.approx(-2.9383)
    assert rz == pytest.approx(0.853)
    assert ds == pytest.approx(-3.408)


def test_geographic_codes():
    g = E.from_epsg(4326)
    base = g.crs if isinstance(g, S.DatumShifted) else g
    assert isinstance(base, S.Geographic)
    assert base.a == 6378137.0
    assert base.f == pytest.approx(1 / 298.257223563, rel=1e-9)
    nad27 = E.from_epsg(4267)
    b27 = nad27.crs if isinstance(nad27, S.DatumShifted) else nad27
    assert b27.a == pytest.approx(6378206.4)


def test_crs_from_epsg_falls_through_to_registry():
    crs = S.crs_from_epsg(2154)  # RGF93 / Lambert-93 (not hand-built)
    base = crs.crs if isinstance(crs, S.DatumShifted) else crs
    assert isinstance(base, S.LambertConformalConic)
    # Paris is around (652 km, 6 862 km) in Lambert-93
    x, y = base.forward(2.3522, 48.8566)
    assert abs(float(x) - 652000) < 2000
    assert abs(float(y) - 6862000) < 2000


def test_full_registry_roundtrip_sweep():
    """Every supported projected code: build, project two points near
    the projection origin, invert, and require < 1e-8 deg closure
    (datum wrapper unwrapped — the 2-D TOWGS84 convention itself is
    only reversible to ~cm)."""
    codes = E.supported_projected_codes()
    assert len(codes) > 3800
    failures = []
    for c in codes:
        crs = E.build_projected(c)
        while isinstance(crs, S.DatumShifted):
            crs = crs.crs
        inner = crs.crs if isinstance(crs, PX.UnitScaled) else crs
        lat0 = None
        for attr in ("lat0", "latc", "lat_ts", "lat1"):
            v = getattr(inner, attr, None)
            if v is not None:
                lat0 = v
                break
        lat0 = 0.0 if lat0 is None else max(min(lat0, 84.0), -84.0)
        lon0 = getattr(inner, "lon0", None)
        if lon0 is None:
            lon0 = getattr(inner, "lonc", 0.0)
        lon = np.array([lon0 + 0.4, lon0 - 0.3])
        lat = np.array([lat0 + 0.3, lat0 - 0.4])
        with np.errstate(divide="ignore", invalid="ignore"):
            x, y = crs.forward(lon, lat)
            lo, la = crs.inverse(x, y)
        dlon = np.abs((lo - lon + 180.0) % 360.0 - 180.0)
        err = max(float(np.max(dlon)), float(np.max(np.abs(la - lat))))
        if not math.isfinite(err) or err > 1e-8:
            failures.append((c, err))
    assert not failures, failures[:10]
