"""MapInfo TAB binary reader vs the reference's read-only autotest
expectations (autotest/ogr/ogr_mitab.py ogr_mitab_19/32/33/37)."""

import os

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.mitab import read_tab

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/utm31.TAB"),
    reason="reference autotest data not present")


def test_utm31_precision(spark):
    # ogr_mitab_19: strict text comparison to check coord precision
    rows = read_tab(spark, f"{DATA}/utm31.TAB").collect()
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "POINT (485248.12 2261.45)"


def test_aspatial(spark):
    # ogr_mitab_32: .tab/.dat without .map/.id
    rows = read_tab(spark, f"{DATA}/aspatial-table.tab").collect()
    assert len(rows) == 2
    assert rows[0]["a"] == 1 and rows[0]["b"] == 2
    assert rows[0]["d"] == "hello"
    assert rows[1]["a"] == 4
    assert rows[0]["geometry"] is None


def test_single_point(spark):
    # ogr_mitab_33: single object block, no index block
    rows = read_tab(spark, f"{DATA}/single_point_mapinfo.tab").collect()
    assert len(rows) == 1
    assert rows[0]["toto"] == ""
    assert wkt_from_wkb(bytes(rows[0]["geometry"])).startswith("POINT (")


def test_seamless_fids(spark):
    # ogr_mitab_37: part FIDs offset by (partId+1)<<32
    rows = read_tab(spark, f"{DATA}/seamless.tab").orderBy("fid").collect()
    assert [(r["fid"], r["id"]) for r in rows] == \
        [(4294967297, "1"), (4294967298, "2"),
         (8589934593, "3"), (8589934594, "4")]


def test_region_read(spark):
    # polygon_without_index.tab: region objects decode to polygons
    rows = read_tab(spark, f"{DATA}/polygon_without_index.tab").collect()
    assert len(rows) == 4
    for r in rows:
        assert wkt_from_wkb(bytes(r["geometry"])).startswith("POLYGON")
