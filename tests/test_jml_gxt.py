"""JML (OpenJUMP) and Geoconcept Export readers vs the reference's
autotest expectations (autotest/ogr/ogr_jml.py, ogr_geoconcept.py)."""

import os

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.formats import (parse_gxt, parse_jml, read_gxt,
                                        read_jml)

D = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{D}/test.jml"),
    reason="reference autotest data not present")


def test_jml():
    # ogr_jml_1: field list order, first feature values, style, geometry
    fields, feats = parse_jml(f"{D}/test.jml")
    assert fields == ["first_property", "another_property", "objectAttr",
                      "attr2", "attr3", "int", "double", "date",
                      "datetime", "R_G_B", "not_ignored"]
    props, style, wkb = feats[0]
    assert props["first_property"] == "even"
    assert props["another_property"] == "rouault"
    assert props["objectAttr"] == "foo"
    assert props["attr2"] == "bar"
    assert props["attr3"] == "baz"
    assert props["int"] == 123
    assert props["double"] == 1.23
    assert props["date"] == "2014/10/18 00:00:00"
    assert props["datetime"] == "2014/10/18 21:36:45"
    assert props["R_G_B"] == "0000FF"
    assert "not_ignored" not in props        # empty body = unset
    assert "ignored" not in props            # outside the template
    assert style == "BRUSH(fc:#0000FF)"
    assert wkt_from_wkb(wkb) == "POLYGON ((0 0,0 10,10 10,10 0,0 0))"
    # second feature: ISO datetime with timezone
    assert feats[1][0]["datetime"] == "2014/10/18 21:36:45+02"
    assert feats[1][0]["R_G_B"] == "FF00FF"
    assert feats[1][1] == "PEN(c:#FF00FF)"
    assert wkt_from_wkb(feats[1][2]) == "POINT (-1 -1)"
    # third feature has no geometry (ogr_jml_1 tail)
    assert len(feats) == 3 and feats[2][2] is None


def test_gxt_grd():
    # ogr_gxt_1: 10 polygons, idSel values, multipolygon geometry
    layers = parse_gxt(f"{D}/expected_000_GRD.gxt")
    fields, feats = layers["000_GRD.000_GRD"]
    assert len(feats) == 10
    assert feats[0][0]["idSel"] == "000-2007-0050-7130-LAMB93"
    assert wkt_from_wkb(feats[0][1]) == (
        "MULTIPOLYGON (((50000 7130000,600000 7130000,600000 6580000,"
        "50000 6580000,50000 7130000)))")


def test_gxt_tab_delimiter():
    # ogr_gxt_2: 'tab' spelled-out delimiter variant
    layers = parse_gxt(f"{D}/expected_000_GRD_TAB.txt")
    _, feats = layers["000_GRD.000_GRD"]
    assert len(feats) == 5


def test_gxt_points():
    layers = parse_gxt(f"{D}/points.gxt")
    _, feats = layers["points.points"]
    assert wkt_from_wkb(feats[0][1]) == "POINT (0 1)"
    assert wkt_from_wkb(feats[1][1]) == "POINT (2 3)"
    assert feats[0][0]["Primary_ID"] == "PID1"


def test_read_spark(spark):
    assert read_jml(spark, f"{D}/test.jml").count() == 3
    assert read_gxt(spark, f"{D}/expected_000_GRD.gxt").count() == 10
