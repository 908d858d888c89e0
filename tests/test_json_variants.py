"""ESRI JSON + TopoJSON readers vs the reference's autotest
expectations (autotest/ogr/ogr_geojson.py ogr_geojson_16..19 and
ogr_geojson_25)."""

import json
import os

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.jsonvariants import (esrijson_wkid, read_esrijson,
                                             read_topojson,
                                             topojson_layers)

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/esripoint.json"),
    reason="reference autotest data not present")


def test_esri_point(spark):
    # ogr_geojson_16
    rows = read_esrijson(spark, f"{DATA}/esripoint.json").collect()
    assert len(rows) == 1
    assert esrijson_wkid(f"{DATA}/esripoint.json") == 4326
    assert rows[0]["fid"] == 1                 # objectid is the FID
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == "POINT (2 49)"
    props = json.loads(rows[0]["properties"])
    assert props["fooInt"] == 2
    assert props["fooDouble"] == 3.4
    assert props["fooString"] == "56"


def test_esri_linestring(spark):
    # ogr_geojson_17
    rows = read_esrijson(spark, f"{DATA}/esrilinestring.json").collect()
    assert len(rows) == 1
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "LINESTRING (2 49,3 50)"


def test_esri_polygon_ring_grouping(spark):
    # ogr_geojson_18: 2 outer rings + 1 hole -> MULTIPOLYGON
    rows = read_esrijson(spark, f"{DATA}/esripolygon.json").collect()
    assert len(rows) == 1
    wkt = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert wkt == ("MULTIPOLYGON (((2 49,2 50,3 50,3 49,2 49),"
                   "(2.1 49.1,2.1 49.9,2.9 49.9,2.9 49.1,2.1 49.1)),"
                   "((-2 49,-2 50,-3 50,-3 49,-2 49)))")


def test_esri_multipoint(spark):
    # ogr_geojson_19
    rows = read_esrijson(spark, f"{DATA}/esrimultipoint.json").collect()
    assert len(rows) == 1
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "MULTIPOINT (2 49,3 50)"


def test_topojson_named_layer(spark):
    # ogr_geojson_25: layer list + a_layer geometry
    for fix in ("topojson1.topojson", "topojson2.topojson"):
        assert topojson_layers(f"{DATA}/{fix}")[0] == "a_layer"
        rows = read_topojson(spark, f"{DATA}/{fix}",
                             "a_layer").collect()
        assert len(rows) == 1
        assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
            "LINESTRING (100 1000,110 1000,110 1100)"


def test_topojson_catchall_geometries(spark):
    # ogr_geojson_25's valid-geometry expectations in the TopoJSON layer
    rows = read_topojson(spark, f"{DATA}/topojson1.topojson",
                         "TopoJSON").collect()
    wkts = [wkt_from_wkb(bytes(r["geometry"])) for r in rows
            if r["geometry"] is not None]
    for want in [
        "POINT (100 1010)",
        "LINESTRING (100 1000,110 1000,110 1100)",
        "LINESTRING (110 1100,110 1000,100 1000)",      # arcs [-1]
        "POLYGON ((100 1000,110 1000,110 1100,100 1100,100 1000),"
        "(101 1010,101 1090,109 1090,109 1010,101 1010))",
        "POLYGON ((110 1100,110 1000,100 1000,100 1100,110 1100),"
        "(101 1010,109 1010,109 1090,101 1090,101 1010))",
        "MULTIPOINT (100 1010,101 1020)",
        "MULTIPOLYGON (((110 1100,110 1000,100 1000,100 1100,"
        "110 1100)),((101 1010,109 1010,109 1090,101 1090,101 1010)))",
        "MULTILINESTRING ((100 1000,110 1000,110 1100))",
        "MULTILINESTRING ((100 1000,110 1000,110 1100,100 1100,"
        "100 1000))",
        "MULTILINESTRING ((100 1000,110 1000,110 1100,100 1100,"
        "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))",
    ]:
        assert want in wkts, want
    # id/name fields survive (features with id 1 / '2', name 'foo')
    ids = [json.loads(r["properties"]).get("id") for r in rows]
    names = [json.loads(r["properties"]).get("name") for r in rows]
    assert "1" in ids and "2" in ids
    assert "foo" in names and "0" in names


def test_topojson2_object_layer(spark):
    # topojson2: dict-keyed objects; 'foo' LineString lands in TopoJSON
    rows = read_topojson(spark, f"{DATA}/topojson2.topojson",
                         "TopoJSON").collect()
    wkts = [wkt_from_wkb(bytes(r["geometry"])) for r in rows
            if r["geometry"] is not None]
    assert "LINESTRING (100 1000,110 1000,110 1100)" in wkts


def test_esri_z_point(spark):
    # ogr_geojson_20 family: z member -> 25D point
    rows = read_esrijson(spark, f"{DATA}/esrizpoint.json").collect()
    assert len(rows) == 1
    wkt = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert wkt.startswith("POINT (") and wkt.count(" ") >= 3  # has z


def test_open_sweep_no_crash(spark):
    # ogr_geojson_20: every json/geojson fixture parses without raising
    import glob
    for gj in sorted(glob.glob(f"{DATA}/*.json")
                     + glob.glob(f"{DATA}/*.geojson")):
        head = open(gj, "rb").read(4096).decode("utf-8", "replace")
        try:
            if '"Topology"' in head:
                read_topojson(spark, gj).collect()
            elif '"esriGeometry' in head or '"objectIdFieldName"' in head:
                read_esrijson(spark, gj).collect()
            else:
                from gdal_spark.sources.formats import read_geojson
                read_geojson(spark, gj).collect()
        except Exception as e:          # noqa: BLE001
            raise AssertionError(f"{gj}: {e}") from e
