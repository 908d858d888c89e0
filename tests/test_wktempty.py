"""Port of autotest/ogr/ogr_wktempty.py: every 'EMPTY' WKT spelling
round-trips to the canonical '<TYPE> EMPTY' emission."""

import pytest

from gdal_spark.functions.geometry import wkb_from_wkt, wkt_from_wkb

CASES = [
    ("GEOMETRYCOLLECTION(EMPTY)", "GEOMETRYCOLLECTION EMPTY"),
    ("MULTIPOLYGON( EMPTY )", "MULTIPOLYGON EMPTY"),
    ("MULTILINESTRING(EMPTY)", "MULTILINESTRING EMPTY"),
    ("MULTIPOINT(EMPTY)", "MULTIPOINT EMPTY"),
    ("POINT ( EMPTY )", "POINT EMPTY"),
    ("LINESTRING(EMPTY)", "LINESTRING EMPTY"),
    ("POLYGON ( EMPTY )", "POLYGON EMPTY"),
    ("GEOMETRYCOLLECTION EMPTY", "GEOMETRYCOLLECTION EMPTY"),
    ("MULTIPOLYGON EMPTY", "MULTIPOLYGON EMPTY"),
    ("MULTILINESTRING EMPTY", "MULTILINESTRING EMPTY"),
    ("MULTIPOINT EMPTY", "MULTIPOINT EMPTY"),
    ("POINT EMPTY", "POINT EMPTY"),
    ("LINESTRING EMPTY", "LINESTRING EMPTY"),
    ("POLYGON EMPTY", "POLYGON EMPTY"),
]


@pytest.mark.parametrize("src,want", CASES)
def test_empty_roundtrip(src, want):
    assert wkt_from_wkb(wkb_from_wkt(src)) == want


def test_non_empty_still_works():
    assert wkt_from_wkb(wkb_from_wkt("POINT (1 2)")) == "POINT (1 2)"
    assert wkt_from_wkb(wkb_from_wkt("MULTIPOINT (1 1)")) == \
        "MULTIPOINT (1 1)"
