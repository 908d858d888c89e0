"""SDTS TVP reader vs the reference's autotest expectations
(autotest/ogr/ogr_sdts.py ogr_sdts_1)."""

import os

import pytest

from gdal_spark.sources.sdts import open_sdts, read_sdts

CATD = ("/root/reference/autotest/ogr/data/"
        "D3607551_rd0s_1_sdts_truncated/TR01CATD.DDF")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CATD), reason="reference autotest data not present")


def test_layers():
    t = open_sdts(CATD)
    expected = [
        ("ARDF", 164, "None", "ENTITY_LABEL", "1700005"),
        ("ARDM", 21, "None", "ROUTE_NUMBER", "SR 1200"),
        ("AHDR", 1, "None", "BANNER",
         "USGS-NMD  DLG DATA - CHARACTER FORMAT - 09-29-87 VERSION"
         "                "),
        ("NP01", 4, "Point", "RCID", 1),
        ("NA01", 34, "Point", "RCID", 2),
        ("NO01", 88, "Point", "RCID", 1),
        ("LE01", 27, "LineString", "RCID", 1),
        ("PC01", 35, "Polygon", "RCID", 1),
    ]
    for name, count, kind, field, value in expected:
        rows = t.layer(name)
        assert len(rows) == count, name
        assert t.layer_kind(name) == kind, name
        assert rows[0][0][field] == value, name


def test_line_geometry():
    t = open_sdts(CATD)
    rows = t.layer("LE01")
    assert all(wkb is not None for _, wkb in rows)
    # IREF scaling: BI32 * 0.01 (UTM metres)
    from gdal_spark.functions.geometry import decode_linestring
    pts = decode_linestring(rows[0][1])
    assert 100000 < pts[0][0] < 1000000        # plausible easting
    assert 3000000 < pts[0][1] < 5000000       # plausible northing


def test_read_sdts_spark(spark):
    df = read_sdts(spark, CATD, "NP01")
    assert df.count() == 4
