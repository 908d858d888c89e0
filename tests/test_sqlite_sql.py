"""SQLite-dialect SQL-string surface — ports of the high-traffic slice
of autotest/ogr/ogr_sql_sqlite.py (ogr_sql_sqlite_1/2/3 semantics) over
SQLiteDialectEngine (gdal_spark/sqlite_sql.py)."""

import pytest

from gdal_spark.functions.geometry import (encode_point, wkb_from_wkt,
                                           wkt_from_wkb)
from gdal_spark.sqlite_sql import SQLiteDialectEngine


@pytest.fixture()
def eng(spark):
    return SQLiteDialectEngine(spark)


SCHEMA = ("intfield int, int64field bigint, doublefield double, "
          "strfield string, binaryfield binary, nullablefield int, "
          "datetimefield string, datefield string, timefield string, "
          "`from` string, boolfield boolean, int16field int, "
          "float32field double, intlistfield array<int>, "
          "int64listfield array<bigint>, doublelistfield array<double>, "
          "strlistfield array<string>")

KINDS = {"datetimefield": "datetime", "datefield": "date",
         "timefield": "time"}


def _mk_layer(eng):
    eng.create_layer("my_layer", SCHEMA, kinds=KINDS)
    eng.execute(
        "INSERT INTO my_layer (intfield, int64field, nullablefield, "
        "doublefield, strfield, binaryfield, datetimefield, datefield, "
        "timefield, \"from\", boolfield, int16field, float32field, "
        "intlistfield, int64listfield, doublelistfield, strlistfield) "
        "VALUES (1,1234567890123456,NULL,2.34,'foo',x'0001FF', "
        "'2012-08-23 21:24', '2012-08-23', '21:24', 'from_val', 1, "
        "-32768, 1.23, '(2:2,3)', '(1:1234567890123456)', '(1:1.23)', "
        "'(1:a)')")


def test_sqlite_1_insert_update_select(eng):
    # ogr_sql_sqlite_1: INSERT literal forms
    _mk_layer(eng)
    feat = eng.execute("SELECT * FROM my_layer").collect()[0]
    assert feat["intfield"] == 1
    assert feat["int64field"] == 1234567890123456
    assert feat["nullablefield"] is None
    assert feat["doublefield"] == 2.34
    assert feat["strfield"] == "foo"
    assert bytes(feat["binaryfield"]) == bytes.fromhex("0001FF")
    assert feat["datetimefield"] == "2012/08/23 21:24:00"
    assert feat["datefield"] == "2012/08/23"
    assert feat["timefield"] == "21:24:00"
    assert feat["from"] == "from_val"
    assert list(feat["intlistfield"]) == [2, 3]
    assert list(feat["int64listfield"]) == [1234567890123456]
    assert list(feat["doublelistfield"]) == [1.23]
    assert list(feat["strlistfield"]) == ["a"]

    # UPDATE ... WHERE ROWID = 0
    eng.execute("UPDATE my_layer SET intfield = 2, "
                "int64field = 234567890123, doublefield = 3.45, "
                "strfield = 'bar', timefield = '12:34' WHERE ROWID = 0")
    feat = eng.execute("SELECT * FROM my_layer").collect()[0]
    assert feat["intfield"] == 2
    assert feat["int64field"] == 234567890123
    assert feat["doublefield"] == 3.45
    assert feat["strfield"] == "bar"
    assert feat["datetimefield"] == "2012/08/23 21:24:00"
    assert feat["timefield"] == "12:34:00"


def test_sqlite_1_filters(eng):
    _mk_layer(eng)
    eng.execute("UPDATE my_layer SET intfield = 2, "
                "int64field = 234567890123, doublefield = 3.45, "
                "strfield = 'bar' WHERE ROWID = 0")
    eng.execute("UPDATE my_layer SET ogr_style = 'cool_style'")
    success = ["intfield = 2", "intfield > 1", "intfield >= 2",
               "intfield < 3", "intfield <= 2",
               "int64field = 234567890123",
               "doublefield = 3.45", "doublefield > 3",
               "doublefield >= 3.45", "doublefield < 3.46",
               "doublefield <= 3.45",
               "strfield = 'bar'", "strfield > 'baq'",
               "strfield >= 'bar'", "strfield < 'bas'",
               "strfield <= 'bar'",
               "nullablefield IS NULL",
               "binaryfield = x'0001FF'",
               "OGR_STYLE = 'cool_style'",
               "intfield = 2 AND doublefield = 3.45",
               "ROWID = 0",
               "\"from\" = 'from_val'"]
    for cond in success:
        rows = eng.execute(
            f"SELECT * FROM my_layer WHERE {cond}").collect()
        assert rows, cond
    failed = ["intfield = 0", "intfield > 3", "intfield >= 3",
              "intfield < 0", "intfield <= 0",
              "doublefield = 0", "doublefield > 3.46",
              "doublefield >= 3.46", "doublefield < 3.45",
              "doublefield <= 0",
              "strfield = 'XXX'", "strfield > 'bas'",
              "strfield >= 'bas'", "strfield < 'bar'",
              "strfield <= 'baq'",
              "intfield = 2 AND doublefield = 0",
              "ROWID = 10000",
              "\"from\" = 'other_val'"]
    for cond in failed:
        rows = eng.execute(
            f"SELECT * FROM my_layer WHERE {cond}").collect()
        assert not rows, cond


def test_sqlite_1_rowid_insert_delete(eng):
    _mk_layer(eng)
    eng.execute("INSERT INTO my_layer (intfield, ROWID) "
                "VALUES (100, 1000)")
    rows = eng.execute(
        "SELECT intfield FROM my_layer WHERE ROWID = 1000").collect()
    assert rows[0]["intfield"] == 100
    eng.execute("DELETE FROM my_layer WHERE intfield = 1")
    eng.execute("DELETE FROM my_layer WHERE ROWID = 1000")
    assert eng.execute("SELECT * FROM my_layer").count() == 0


def test_sqlite_2_geometry(eng):
    # ogr_sql_sqlite_2: geometry column + SRS + OGR_STYLE
    eng.create_layer("geo_layer",
                     "intfield int, doublefield double, strfield string",
                     srs="EPSG:4326")
    eng.insert_rows("geo_layer", [
        {"intfield": 1, "doublefield": 2.34, "strfield": "foo",
         "geometry": wkb_from_wkt("POINT (0 1)"),
         "ogr_style": "cool_style"}])
    eng.execute("UPDATE geo_layer SET intfield = 2, doublefield = 3.45, "
                "strfield = 'bar' WHERE ROWID = 0")
    feat = eng.execute("SELECT * FROM geo_layer").collect()[0]
    assert feat["intfield"] == 2 and feat["doublefield"] == 3.45
    assert feat["strfield"] == "bar"
    assert wkt_from_wkb(bytes(feat["geometry"])) == "POINT (0 1)"
    assert eng.layer_srs("geo_layer") == "EPSG:4326"
    feat = eng.execute(
        "SELECT *, OGR_STYLE FROM geo_layer").collect()[0]
    assert feat["ogr_style"] == "cool_style"


def test_sqlite_3_join(eng):
    # ogr_sql_sqlite_3 shape: join two layers through plain SQL text
    eng.create_layer("a", "k int, name string")
    eng.create_layer("b", "k int, v double")
    eng.insert_rows("a", [{"k": 1, "name": "one"},
                          {"k": 2, "name": "two"}])
    eng.insert_rows("b", [{"k": 1, "v": 10.0}, {"k": 2, "v": 20.0}])
    rows = eng.execute(
        "SELECT a.name AS name, b.v AS v FROM a JOIN b ON a.k = b.k "
        "ORDER BY b.v").collect()
    assert [(r["name"], r["v"]) for r in rows] == [("one", 10.0),
                                                  ("two", 20.0)]


def test_st_functions_in_text(eng):
    eng.create_layer("sq", "doc_id int")
    sq = wkb_from_wkt("POLYGON ((0 0,4 0,4 4,0 4,0 0))")
    eng.insert_rows("sq", [{"doc_id": 1, "geometry": sq}])
    row = eng.execute(
        "SELECT doc_id, ST_Area(GEOMETRY) AS area, "
        "ST_X(ST_Centroid(GEOMETRY)) AS cx, "
        "ST_Y(ST_Centroid(GEOMETRY)) AS cy, "
        "ST_AsText(ST_Centroid(GEOMETRY)) AS wkt, "
        "ST_Intersects(GEOMETRY, ST_GeomFromText('POINT (1 1)')) AS hit "
        "FROM sq").collect()[0]
    assert row["area"] == 16.0
    assert (row["cx"], row["cy"]) == (2.0, 2.0)
    assert row["wkt"] == "POINT (2 2)"
    assert row["hit"] is True
