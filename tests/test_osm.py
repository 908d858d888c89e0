"""OSM reader (.pbf + .osm) vs the reference's own autotest
expectations (autotest/ogr/ogr_osm.py ogr_osm_1/2/8/10/11/12)."""

import os

import pytest
from pyspark.sql import functions as F

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.osm import read_osm, read_osm_tables, scan_pbf

DATA = "/root/reference/autotest/ogr/data"
PBF = f"{DATA}/test.pbf"
XML = f"{DATA}/test.osm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PBF), reason="reference autotest data not present")


def _rows(df, order="osm_id"):
    return [r.asDict() for r in df.orderBy(order).collect()]


# ogr_osm_1 (pbf) / ogr_osm_2 (xml)
@pytest.mark.parametrize("path", [PBF, XML])
def test_points(spark, path):
    rows = _rows(read_osm(spark, path, "points"))
    assert len(rows) == 1
    f = rows[0]
    assert f["osm_id"] == "3"
    assert f["name"] == "Some interesting point"
    assert f["other_tags"] == '"foo"=>"bar","bar"=>"baz"'
    assert wkt_from_wkb(bytes(f["geometry"])) == "POINT (3 49.5)"


@pytest.mark.parametrize("path", [PBF, XML])
def test_lines(spark, path):
    rows = _rows(read_osm(spark, path, "lines"))
    assert [f["osm_id"] for f in rows] == ["1", "6"]
    assert rows[0]["highway"] == "motorway"
    assert rows[0]["z_order"] == 9
    assert rows[0]["other_tags"] == '"foo"=>"bar"'
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "LINESTRING (2 49,3 50)"
    # way 6 drops its missing node (ref 900) but keeps the rest
    assert wkt_from_wkb(bytes(rows[1]["geometry"])) == \
        "LINESTRING (2 49,3 49,3 50,2 50,2 49)"


@pytest.mark.parametrize("path", [PBF, XML])
def test_multipolygons(path, spark):
    df = read_osm(spark, path, "multipolygons")
    rows = [r.asDict() for r in
            df.orderBy(F.coalesce("osm_id", "osm_way_id")).collect()]
    assert [(f["osm_id"], f["osm_way_id"]) for f in rows] == \
        [("1", None), ("5", None), (None, "8")]
    mp = ("MULTIPOLYGON (((2 49,3 49,3 50,2 50,2 49),"
          "(2.1 49.1,2.2 49.1,2.2 49.2,2.1 49.2,2.1 49.1)))")
    # relation 1 keeps its own tags
    assert rows[0]["type"] == "multipolygon"
    assert rows[0]["natural"] == "forest"
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == mp
    # relation 5 has no interesting tags -> inherits the outer way's
    assert rows[1]["type"] == "multipolygon"
    assert rows[1]["natural"] == "wood"
    assert wkt_from_wkb(bytes(rows[1]["geometry"])) == mp
    # standalone closed way 8 (area=yes); ways 2/3 consumed by the
    # relations; way 3 (only area=yes) has no tags left -> dropped
    assert rows[2]["name"] == "standalone_polygon"
    assert wkt_from_wkb(bytes(rows[2]["geometry"])) == \
        "MULTIPOLYGON (((2 49,3 49,3 50,2 50,2 49)))"
    # relation 2 (missing way member) skipped entirely
    assert len(rows) == 3


@pytest.mark.parametrize("path", [PBF, XML])
def test_multilinestrings_other_relations(path, spark):
    rows = _rows(read_osm(spark, path, "multilinestrings"))
    assert len(rows) == 1
    assert rows[0]["osm_id"] == "3"
    assert rows[0]["type"] == "route"
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "MULTILINESTRING ((2 49,3 50))"
    rows = _rows(read_osm(spark, path, "other_relations"))
    assert len(rows) == 1
    assert rows[0]["osm_id"] == "4"
    assert rows[0]["type"] == "other_type"
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "GEOMETRYCOLLECTION (POINT (2 49),LINESTRING (2 49,3 50))"


# ogr_osm_8: 64-bit ids
def test_base64_pbf(spark):
    path = f"{DATA}/base-64.osm.pbf"
    pts = read_osm(spark, path, "points") \
        .filter(F.col("osm_id") == "4294967934").collect()
    assert len(pts) == 1
    assert pts[0]["name"] == "Treetops"
    assert wkt_from_wkb(bytes(pts[0]["geometry"])) == \
        "POINT (-61.7964321 17.1498319)"
    mp = read_osm(spark, path, "multipolygons") \
        .filter(F.col("osm_way_id") == "1113").collect()
    assert len(mp) == 1
    assert wkt_from_wkb(bytes(mp[0]["geometry"])) == (
        "MULTIPOLYGON (((-61.7780345 17.140634,-61.7777002 17.1406069,"
        "-61.7776854 17.1407739,-61.7779131 17.1407923,"
        "-61.7779158 17.1407624,-61.7780224 17.140771,"
        "-61.7780345 17.140634)))")


# ogr_osm_11: all_tags config
def test_all_tags_config(spark, tmp_path):
    conf = tmp_path / "osmconf.ini"
    conf.write_text("[points]\nosm_id=yes\nattributes=name\n"
                    "all_tags=yes\n")
    rows = _rows(read_osm(spark, PBF, "points",
                          config_path=str(conf)))
    assert rows[0]["osm_id"] == "3"
    assert rows[0]["name"] == "Some interesting point"
    assert rows[0]["all_tags"] == ('"name"=>"Some interesting point",'
                                   '"foo"=>"bar","bar"=>"baz"')


# ogr_osm_12: attribute filter on the lines layer
def test_attribute_filter(spark):
    df = read_osm(spark, PBF, "lines")
    assert df.filter("highway IS NOT NULL").count() == 1


# ogr_osm_10: invalid inputs error out
def test_invalid_inputs(spark, tmp_path):
    empty = tmp_path / "foo.pbf"
    empty.write_bytes(b"")
    with pytest.raises(Exception):
        scan_pbf(str(empty))
    bad = tmp_path / "bad.pbf"
    bad.write_bytes(b"OSMHeader\n")
    with pytest.raises(Exception):
        scan_pbf(str(bad))
    with pytest.raises(Exception):
        read_osm_tables(spark, f"{DATA}/billionlaugh.osm")


def test_pbf_blob_index():
    blobs = scan_pbf(PBF)
    assert blobs[0][0] == "OSMHeader"
    assert all(t == "OSMData" for t, _, _ in blobs[1:])
