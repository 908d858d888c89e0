"""Idrisi vector (.vct) + PDS vector table readers vs the reference's
autotest expectations (autotest/ogr/ogr_idrisi.py ogr_idrisi_1/2/3,
ogr_pds.py ogr_pds_1)."""

import os

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.formats import read_idrisi_vct, read_pds_table

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/points.vct"),
    reason="reference autotest data not present")


def test_idrisi_points(spark):
    rows = read_idrisi_vct(spark, f"{DATA}/points.vct").collect()
    assert len(rows) == 2
    f = rows[0]
    assert f["id"] == 1.0
    assert f["IntegerField"] == 2
    assert f["RealField"] == 3.45
    assert f["StringField"] == "foo"
    assert wkt_from_wkb(bytes(f["geometry"])) == "POINT (400000 5000000)"
    assert wkt_from_wkb(bytes(rows[1]["geometry"])) == \
        "POINT (600000 4000000)"


def test_idrisi_lines(spark):
    rows = read_idrisi_vct(spark, f"{DATA}/lines.vct").collect()
    assert len(rows) == 2
    assert wkt_from_wkb(bytes(rows[0]["geometry"])).startswith(
        "LINESTRING (400000 5000000,600000 4500000")


def test_idrisi_polygons(spark):
    rows = read_idrisi_vct(spark, f"{DATA}/polygons.vct").collect()
    assert len(rows) == 2
    w = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert w.startswith("POLYGON ((400000 4000000,400000 5000000,"
                        "600000 5000000,600000 4000000")


def test_pds_table(spark):
    df = read_pds_table(spark, f"{DATA}/ap01578l.lbl")
    rows = df.collect()
    # the label says 74786 rows; the shipped payload is truncated
    assert rows[0]["_label_rows"] == 74786
    assert rows[0]["NOISE_COUNTS_1"] == 96
    assert rows[1]["MARS_RADIUS"] == 3385310.2
    assert wkt_from_wkb(bytes(rows[0]["geometry"])) == \
        "POINT (146.1325 -55.648)"


def test_rec(spark):
    # autotest/ogr/ogr_rec.py walks data/test.rec via test_ogrsf
    from gdal_spark.sources.formats import read_rec
    df = read_rec(spark, f"{DATA}/test.rec")
    assert df.columns == ["A", "B"]
    assert [(r["A"], r["B"]) for r in df.collect()] == [(1, 2), (3, 4)]
