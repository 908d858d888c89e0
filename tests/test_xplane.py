"""X-Plane apt/nav/awy/fix readers vs the reference's autotest
expectations (autotest/ogr/ogr_xplane.py)."""

import os

import pytest

from gdal_spark.sources.xplane import (parse_apt, parse_awy, parse_fix,
                                       parse_nav, read_xplane)

D = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{D}/apt.dat"),
    reason="reference autotest data not present")

APT_850 = [
    ("APT", 8, "E46"), ("RunwayPolygon", 19, "E46"),
    ("RunwayThreshold", 44, "E46"), ("WaterRunwayPolygon", 1, "I38"),
    ("WaterRunwayThreshold", 2, "I38"), ("Helipad", 2, "CYXX"),
    ("HelipadPolygon", 2, "CYXX"), ("TaxiwayRectangle", 437, "LFPG"),
    ("Pavement", 11, "CYXX"), ("APTBoundary", 1, "VTX2"),
    ("APTLinearFeature", 45, "CYXX"), ("ATCFreq", 42, "CYXX"),
    ("StartupLocation", 110, "CYXX"), ("APTLightBeacon", 3, "CYXX"),
    ("APTWindsock", 25, "E46"), ("TaxiwaySign", 17, "CYXX"),
    ("VASI_PAPI_WIGWAG", 30, "CYXX"), ("Stopway", 6, "LFPM"),
]

APT_810 = [
    ("APT", 6, "UHP1"), ("RunwayPolygon", 6, "UHP1"),
    ("RunwayThreshold", 13, "UHP1"), ("WaterRunwayPolygon", 2, "6MA8"),
    ("WaterRunwayThreshold", 4, "6MA8"), ("Helipad", 1, "9FD6"),
    ("HelipadPolygon", 1, "9FD6"), ("TaxiwayRectangle", 54, "UHP1"),
    ("Pavement", 0, None), ("APTBoundary", 0, None),
    ("APTLinearFeature", 0, None), ("ATCFreq", 10, "EHVB"),
    ("StartupLocation", 0, None), ("APTLightBeacon", 2, "7I6"),
    ("APTWindsock", 9, "UHP1"), ("TaxiwaySign", 0, None),
    ("VASI_PAPI_WIGWAG", 12, "UHP1"), ("Stopway", 4, "EKYT"),
]


@pytest.mark.parametrize("path,expected", [
    (f"{D}/apt.dat", APT_850),              # ogr_xplane_apt_dat
    (f"{D}/apt810/apt.dat", APT_810),       # ogr_xplane_apt_v810_dat
])
def test_apt_layers(path, expected):
    layers = parse_apt(path)
    for name, count, icao in expected:
        rows = layers[name]
        assert len(rows) == count, name
        if count:
            assert rows[0][0]["apt_icao"] == icao, name


def test_nav_layers():
    # ogr_xplane_nav_dat
    layers = parse_nav(f"{D}/nav.dat")
    for name, count, field, value in [
            ("ILS", 6, "navaid_id", "IMQS"),
            ("VOR", 3, "navaid_id", "AAL"),
            ("NDB", 4, "navaid_id", "APH"),
            ("GS", 1, "navaid_id", "IMQS"),
            ("Marker", 3, "apt_icao", "40N"),
            ("DME", 6, "navaid_id", "AAL"),
            ("DMEILS", 1, "navaid_id", "IWG")]:
        rows = layers[name]
        assert len(rows) == count, name
        assert rows[0][0][field] == value, name


def test_awy_layers():
    # ogr_xplane_awy_dat
    layers = parse_awy(f"{D}/awy.dat")
    assert len(layers["AirwaySegment"]) == 11
    assert layers["AirwaySegment"][0][0]["segment_name"] == "R464"
    assert len(layers["AirwayIntersection"]) == 14
    assert layers["AirwayIntersection"][0][0]["name"] == "00MKK"


def test_fix_layer():
    # ogr_xplane_fix_dat
    layers = parse_fix(f"{D}/fix.dat")
    assert len(layers["FIX"]) == 1
    assert layers["FIX"][0][0]["fix_name"] == "00MKK"


def test_read_xplane_spark(spark):
    df = read_xplane(spark, f"{D}/apt.dat", "RunwayThreshold")
    assert df.count() == 44
