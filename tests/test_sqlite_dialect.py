"""SQLite-dialect layer functions (gdal/ogr/ogr_sql_sqlite.dox:103-207):
introspection helpers and blob compression."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.functions import sqlite_dialect as SD
from gdal_spark.sources import polygons as PG


def test_wkb_type_name_jvm(spark):
    rows = [
        (bytearray(G.encode_point(1.0, 2.0)), "POINT"),
        (bytearray(G.encode_linestring(np.array([[0.0, 0], [1, 1]]))),
         "LINESTRING"),
        (bytearray(G.encode_polygon([np.array([[0.0, 0], [1, 0], [1, 1],
                                               [0, 0]])])), "POLYGON"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "wkb binary")
    got = [r[0] for r in
           df.select(SD.wkb_type_name(F.col("wkb"))).collect()]
    assert got == [r[1] for r in rows]


def test_layer_feature_count_and_extent(spark):
    grid = PG.admin_grid(spark, nx=4, ny=2)
    assert SD.ogr_layer_feature_count(grid).collect()[0][0] == 8
    ext = SD.ogr_layer_extent(
        grid, bbox=("xmin", "ymin", "xmax", "ymax")).collect()[0]
    assert (ext.minx, ext.miny, ext.maxx, ext.maxy) == (-180, -85, 180, 85)


def test_layer_geometry_type_single_and_mixed(spark):
    grid = PG.admin_grid(spark, nx=2, ny=1)
    assert SD.ogr_layer_geometry_type(grid, "wkb").collect()[0][0] == "POLYGON"
    mixed = grid.select("wkb").union(spark.createDataFrame(
        [(bytearray(G.encode_point(0.0, 0.0)),)], "wkb binary"))
    assert SD.ogr_layer_geometry_type(mixed, "wkb").collect()[0][0] == "GEOMETRY"


def test_layer_info_union(spark):
    pts = spark.createDataFrame([(1, 10.0, 20.0), (2, -10.0, 5.0)],
                                "id long, x double, y double")
    grid = PG.admin_grid(spark, nx=2, ny=1)
    info = SD.layer_info({
        "p": {"df": pts, "x": "x", "y": "y", "geom_type": "POINT"},
        "g": {"df": grid, "wkb": "wkb",
              "bbox": ("xmin", "ymin", "xmax", "ymax"), "srid": 3857},
    }).orderBy("layer_name").collect()
    g, p = info
    assert (p.layer_name, p.n_features, p.geom_type, p.srid) == (
        "p", 2, "POINT", 4326)
    assert (p.minx, p.maxy) == (-10.0, 20.0)
    assert (g.n_features, g.geom_type, g.srid, g.minx) == (
        2, "POLYGON", 3857, -180.0)


def test_deflate_inflate_roundtrip(spark):
    payloads = [b"hello world " * 50, b"", b"\x00\xff" * 33]
    df = spark.createDataFrame([(bytearray(p),) for p in payloads],
                               "b binary")
    out = df.select(
        SD.ogr_inflate(SD.ogr_deflate(F.col("b"))).alias("rt"),
        F.length(SD.ogr_deflate(F.col("b"))).alias("clen"),
        F.length("b").alias("olen")).collect()
    for row, p in zip(out, payloads):
        assert bytes(row.rt) == p
    # compressible payload actually shrinks
    assert out[0].clen < out[0].olen


def test_inflate_malformed_is_null(spark):
    df = spark.createDataFrame([(bytearray(b"not zlib"),)], "b binary")
    assert df.select(SD.ogr_inflate(F.col("b"))).collect()[0][0] is None
