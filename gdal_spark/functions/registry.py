"""Dialect function registrar — SWQ_CUSTOM_FUNC analog.

The reference lets drivers plug scalar functions into its SQL dialects
(``swq_custom_func_registrar``, gdal/ogr/swq.h + swq_op_registrar.cpp;
the SQLite dialect registers its own set in
gdal/ogr/ogrsqlitesqlfunctions.cpp). The Spark-first equivalent is the
session UDF registry: :func:`register_dialect_functions` installs the
engine's OGR/SQLite-dialect scalar surface under their dialect names so
``spark.sql(...)`` text queries can call them exactly as OGR SQL would.

Functions that are pure column math (HSTORE_GET_VALUE, the WKB type
decoders) register as SQL expressions via a temp-view-free
``spark.udf.register`` of a column-builder where possible; per-row
geometry scalars register as pandas UDFs (Arrow-batched)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession

from gdal_spark.functions import geometry as G


def _wkt_series(wkb: pd.Series) -> pd.Series:
    out = []
    for b in wkb:
        if b is None:
            out.append(None)
            continue
        try:
            out.append(G.wkt_from_wkb(bytes(b)))
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype=object)


def _area_series(wkb: pd.Series) -> pd.Series:
    return pd.Series([0.0 if b is None else G.polygon_area(bytes(b))
                      for b in wkb])


def _length_series(wkb: pd.Series) -> pd.Series:
    return pd.Series([0.0 if b is None else G.geometry_length(bytes(b))
                      for b in wkb])


def _deflate_series(blob: pd.Series) -> pd.Series:
    import zlib
    return blob.map(lambda b: None if b is None else zlib.compress(bytes(b)))


def _inflate_series(blob: pd.Series) -> pd.Series:
    import zlib

    def un(b):
        if b is None:
            return None
        try:
            return zlib.decompress(bytes(b))
        except zlib.error:
            return None
    return blob.map(un)


def register_dialect_functions(spark: SparkSession) -> list[str]:
    """Install the dialect scalar functions on this session's SQL
    registry. Returns the registered names. Idempotent (re-registering
    replaces)."""
    from pyspark.sql.functions import pandas_udf

    spark.udf.register("ogr_geom_wkt", pandas_udf(_wkt_series, "string"))
    spark.udf.register("ogr_geom_area", pandas_udf(_area_series, "double"))
    spark.udf.register("ogr_geom_length",
                       pandas_udf(_length_series, "double"))
    spark.udf.register("ogr_deflate", pandas_udf(_deflate_series, "binary"))
    spark.udf.register("ogr_inflate", pandas_udf(_inflate_series, "binary"))
    # pure-SQL shims (Spark SQL scalar UDFs — JVM expressions, no Python)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION hstore_get_value"
        "(s STRING, k STRING) RETURNS STRING "
        "RETURN element_at(str_to_map(s, ',', '=>'), k)")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ogr_wkb_geometrytype"
        "(wkb BINARY) RETURNS INT RETURN CASE "
        "WHEN conv(hex(substring(wkb, 1, 1)), 16, 10) = '1' "
        "THEN CAST(conv(hex(substring(wkb, 2, 1)), 16, 10) AS INT) "
        "ELSE CAST(conv(hex(substring(wkb, 5, 1)), 16, 10) AS INT) END")
    return ["ogr_geom_wkt", "ogr_geom_area", "ogr_geom_length",
            "ogr_deflate", "ogr_inflate", "hstore_get_value",
            "ogr_wkb_geometrytype"]


def register_geocode_functions(spark: SparkSession) -> list[str]:
    """ogr_geocode / ogr_geocode_reverse (SQLite dialect,
    gdal/ogr/ogr_sql_sqlite.dox:141-188; gdal/ogr/ogrgeocoding.cpp).

    The reference calls live OSM/Nominatim services with an on-disk
    SQLite cache — network, so out of reach here. The engine's geocoder
    is the deterministic xxhash64 host→(lon, lat) map the pages source
    uses (sources/pages.py geo_micro_cols — 70% city-cluster skew, 30%
    uniform); the SQL text below is generated from the same constants,
    so ogr_geocode(host) in a text query agrees EXACTLY with the
    distributed point-extraction path (asserted in tests). Forward
    returns struct(lon, lat) in degrees; reverse names the nearest skew
    city within 0.5° or NULL (the dialect returns NULL on a reverse
    miss). Both are pure JVM SQL expressions."""
    from gdal_spark.sources.pages import (CITIES, CITY_SPREAD_E6, SEED,
                                          SKEW_PCT)

    def hpos(salt, lo, hi):
        span = hi - lo
        return (f"(pmod(xxhash64(host, '{salt}', {SEED}), {span}) "
                f"+ ({lo}))")

    city = f"CAST(pmod(xxhash64(host, 'city', {SEED}), {len(CITIES)}) AS INT)"
    lon_arr = "array(" + ", ".join(str(c[0]) for c in CITIES) + ")"
    lat_arr = "array(" + ", ".join(str(c[1]) for c in CITIES) + ")"
    pick = f"pmod(xxhash64(host, 'pick', {SEED}), 100)"
    jlon = hpos("jlon", -CITY_SPREAD_E6, CITY_SPREAD_E6)
    jlat = hpos("jlat", -CITY_SPREAD_E6, CITY_SPREAD_E6)
    ulon = hpos("ulon", -179_500_000, 179_500_000)
    ulat = hpos("ulat", -85_000_000, 85_000_000)
    lon_e6 = (f"CASE WHEN {pick} < {SKEW_PCT} THEN "
              f"element_at({lon_arr}, {city} + 1) + {jlon} "
              f"ELSE {ulon} END")
    lat_e6 = (f"CASE WHEN {pick} < {SKEW_PCT} THEN "
              f"element_at({lat_arr}, {city} + 1) + {jlat} "
              f"ELSE {ulat} END")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ogr_geocode"
        "(host STRING) RETURNS STRUCT<lon: DOUBLE, lat: DOUBLE> RETURN "
        f"named_struct('lon', CAST({lon_e6} AS DOUBLE) / 1e6, "
        f"'lat', CAST({lat_e6} AS DOUBLE) / 1e6)")

    names = "array(" + ", ".join(f"'city{i}'" for i in range(len(CITIES))) + ")"
    dists = ("array(" + ", ".join(
        f"abs(lon - ({c[0]}/1e6)) + abs(lat - ({c[1]}/1e6))"
        for c in CITIES) + ")")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ogr_geocode_reverse"
        "(lon DOUBLE, lat DOUBLE) RETURNS STRING RETURN "
        f"CASE WHEN array_min({dists}) <= 0.5 THEN "
        f"element_at({names}, CAST(array_position({dists}, "
        f"array_min({dists})) AS INT)) ELSE NULL END")
    return ["ogr_geocode", "ogr_geocode_reverse"]
