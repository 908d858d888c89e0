"""SpatiaLite aggregate functions (MakeLine / Collect / Extent) over the
SQLite-dialect helper surface (ogr_sql_sqlite.dox SpatiaLite section)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.functions import sqlite_dialect as SD


@pytest.fixture(scope="module")
def points(spark):
    rows = [(g, i, G.encode_point(float(i), float(i * i)))
            for g in ("a", "b") for i in range(4)]
    return spark.createDataFrame(rows, "grp string, seq int, wkb binary")


def test_make_line_agg(points, spark):
    out = {r["grp"]: r["line_wkb"]
           for r in SD.make_line_agg(points, ["grp"], "wkb",
                                     order_col="seq").collect()}
    assert G.wkt_from_wkb(bytes(out["a"])) == \
        "LINESTRING (0 0,1 1,2 4,3 9)"
    assert G.wkt_from_wkb(bytes(out["b"])) == \
        "LINESTRING (0 0,1 1,2 4,3 9)"


def test_make_line_respects_order(points, spark):
    rev = points.withColumn("seq", F.lit(10) - F.col("seq"))
    out = {r["grp"]: r["line_wkb"]
           for r in SD.make_line_agg(rev, ["grp"], "wkb",
                                     order_col="seq").collect()}
    assert G.wkt_from_wkb(bytes(out["a"])) == \
        "LINESTRING (3 9,2 4,1 1,0 0)"


def test_collect_agg_uniform_points(points, spark):
    out = SD.collect_agg(points, ["grp"], "wkb", order_col="seq").collect()
    for r in out:
        wkt = G.wkt_from_wkb(bytes(r["collect_wkb"]))
        assert wkt == "MULTIPOINT (0 0,1 1,2 4,3 9)"


def test_collect_agg_polygons_and_mixed(spark):
    import numpy as np
    sq = G.encode_polygon([np.array([(0, 0), (2, 0), (2, 2), (0, 2),
                                     (0, 0)])])
    pt = G.encode_point(5.0, 5.0)
    uniform = spark.createDataFrame([("a", 0, sq), ("a", 1, sq)],
                                    "grp string, seq int, wkb binary")
    r = SD.collect_agg(uniform, ["grp"], "wkb", "seq").collect()[0]
    assert G.wkt_from_wkb(bytes(r["collect_wkb"])).startswith(
        "MULTIPOLYGON")
    mixed = spark.createDataFrame([("a", 0, sq), ("a", 1, pt)],
                                  "grp string, seq int, wkb binary")
    r = SD.collect_agg(mixed, ["grp"], "wkb", "seq").collect()[0]
    assert G.wkt_from_wkb(bytes(r["collect_wkb"])).startswith(
        "GEOMETRYCOLLECTION (POLYGON")


def test_extent_agg(spark):
    import numpy as np
    g1 = G.encode_polygon([np.array([(1, 1), (3, 1), (3, 4), (1, 4),
                                     (1, 1)])])
    g2 = G.encode_point(10.0, -2.0)
    df = spark.createDataFrame([("a", g1), ("a", g2)],
                               "grp string, wkb binary")
    r = SD.extent_agg(df, ["grp"], "wkb").collect()[0]
    assert (r["minx"], r["miny"], r["maxx"], r["maxy"]) == (1, -2, 10, 4)
    assert G.wkt_from_wkb(bytes(r["extent_wkb"])) == \
        "POLYGON ((1 -2,10 -2,10 4,1 4,1 -2))"
