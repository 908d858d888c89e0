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


def test_geocode_agrees_with_pages_geocoder(spark):
    from pyspark.sql import functions as F

    from gdal_spark.functions.registry import register_geocode_functions
    from gdal_spark.sources.pages import geo_micro_cols
    register_geocode_functions(spark)
    hosts = spark.createDataFrame(
        [(f"host{i}.example.com",) for i in range(200)], "host string")
    lon_e6, lat_e6 = geo_micro_cols(F.col("host"))
    ref = hosts.select("host", (lon_e6 / 1e6).alias("lon"),
                       (lat_e6 / 1e6).alias("lat"))
    hosts.createOrReplaceTempView("hosts_v")
    got = spark.sql("SELECT host, ogr_geocode(host).lon AS lon, "
                    "ogr_geocode(host).lat AS lat FROM hosts_v")
    diff = ref.join(got, "host") \
        .filter((F.abs(ref.lon - got.lon) > 1e-9)
                | (F.abs(ref.lat - got.lat) > 1e-9)).count()
    assert diff == 0


def test_geocode_reverse_city_and_miss(spark):
    from gdal_spark.functions.registry import register_geocode_functions
    register_geocode_functions(spark)
    rows = spark.sql(
        "SELECT ogr_geocode_reverse(-73.985, 40.748) AS nyc, "
        "ogr_geocode_reverse(2.36, 48.86) AS paris, "
        "ogr_geocode_reverse(0.0, 0.0) AS ocean").collect()[0]
    assert rows.nyc == "city0"
    assert rows.paris == "city1"
    assert rows.ocean is None
