"""Dialect function registrar (SWQ_CUSTOM_FUNC analog,
gdal/ogr/swq_op_registrar.cpp / ogrsqlitesqlfunctions.cpp): the OGR/
SQLite scalar surface callable from spark.sql() text queries."""

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.functions.registry import register_dialect_functions


def test_register_and_call_sql(spark):
    names = register_dialect_functions(spark)
    assert "ogr_geom_area" in names
    sq = G.encode_polygon([np.array([[0.0, 0], [4, 0], [4, 4], [0, 4],
                                     [0, 0]])])
    spark.createDataFrame([(bytearray(sq), "a=>1,b=>2")],
                          "wkb binary, tags string") \
        .createOrReplaceTempView("feat")
    row = spark.sql(
        "SELECT ogr_geom_area(wkb) AS a, ogr_geom_wkt(wkb) AS t, "
        "hstore_get_value(tags, 'b') AS hv, "
        "ogr_wkb_geometrytype(wkb) AS gt FROM feat").collect()[0]
    assert row.a == 16.0
    assert row.t.startswith("POLYGON")
    assert row.hv == "2"
    assert row.gt == G.WKB_POLYGON


def test_sql_roundtrip_compression(spark):
    register_dialect_functions(spark)
    spark.createDataFrame([(bytearray(b"payload " * 100),)], "b binary") \
        .createOrReplaceTempView("blobs")
    row = spark.sql(
        "SELECT ogr_inflate(ogr_deflate(b)) AS rt, "
        "length(ogr_deflate(b)) < length(b) AS shrank FROM blobs").collect()[0]
    assert bytes(row.rt) == b"payload " * 100
    assert row.shrank
