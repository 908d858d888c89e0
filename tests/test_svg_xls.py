"""SVG and XLS readers vs the reference's autotest expectations
(autotest/ogr/ogr_svg.py ogr_svg_1, ogr_xls.py ogr_xls_1)."""

import json
import os

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb, polygon_area
from gdal_spark.sources.formats import read_svg
from gdal_spark.sources.xls import read_xls, xls_field_types, xls_sheets

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/test.svg"),
    reason="reference autotest data not present")


def test_svg_points(spark):
    rows = read_svg(spark, f"{DATA}/test.svg", "points").collect()
    assert len(rows) == 1
    props = json.loads(rows[0]["properties"])
    assert props["building"] == "yes"
    assert props["name"] == "Northwest Animal Facility"
    wkt = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert wkt.startswith("POINT (-13610535.695")
    assert "4561593.9305" in wkt


def test_svg_lines(spark):
    rows = read_svg(spark, f"{DATA}/test.svg", "lines").collect()
    assert len(rows) == 1
    wkt = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert wkt.startswith("LINESTRING (-13609855.59 4561479.26,")
    assert wkt.endswith("-13609869.54 4561465.06)")


def test_svg_polygons(spark):
    rows = read_svg(spark, f"{DATA}/test.svg", "polygons").collect()
    assert len(rows) == 1
    wkt = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert wkt.startswith("POLYGON ((-13610027.72 4562403.66,")
    assert json.loads(rows[0]["properties"])["landuse"] == "residential"
    # ring closes back to the first vertex
    assert polygon_area(bytes(rows[0]["geometry"])) > 0


def test_xls_layer(spark):
    p = f"{DATA}/test972000xp.xls"
    assert xls_sheets(p)[0] == "Feuille1"
    assert xls_field_types(p) == ["Integer", "Real", "String", "Date",
                                  "DateTime"]
    df = read_xls(spark, p)
    rows = df.orderBy("fid").collect()
    assert len(rows) == 3
    assert df.columns[1:] == ["FirstCol", "SecondCol", "ThirdCol",
                              "FourthCol", "FifthCol"]
    assert rows[0]["FirstCol"] == 1
    assert rows[0]["SecondCol"] == 1.0
    assert rows[0]["ThirdCol"] is None
    assert str(rows[0]["FourthCol"]).startswith("1980/01/01")
    assert rows[1]["SecondCol"] == 2.5
    assert rows[1]["ThirdCol"] == "Val2"
    assert str(rows[1]["FifthCol"]).startswith("1980/01/02 12:34:56")
    assert rows[2]["ThirdCol"] == "Val_avec_é"
