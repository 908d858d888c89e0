"""ExecuteSQL / OGR SQL dialect: ported autotest expectations.

Cases transcribed from /root/reference/autotest/ogr/ogr_sql_test.py and
ogr_join_test.py over the poly/idlink fixtures (expected value lists kept
verbatim; DISTINCT result order is sorted here — the engine's distributed
DISTINCT is unordered, documented deviation)."""

from __future__ import annotations

import pytest

from gdal_spark.ogrsql import OGRSQLEngine, execute_sql
from gdal_spark.sources import polygons as PG


@pytest.fixture(scope="module")
def eng(spark):
    e = OGRSQLEngine(spark)
    e.register("poly", PG.poly_fixture(spark))
    e.register("idlink", PG.idlink_fixture(spark), geometry_col=None)
    e.register("misc", spark.createDataFrame(
        [(1, "Alpha", "a=>1,b=>2"), (2, "BETA", "a=>3"), (3, None, None)],
        "fid long, s string, h string"), geometry_col=None)
    e.register("empty", spark.createDataFrame([], "fid long, eas_id long"),
               geometry_col=None)
    return e


def vals(df, col):
    return [r[col] for r in df.collect()]


# --- ogr_sql_test.py ports -------------------------------------------------

def test_distinct_where(eng):                              # ogr_sql_2
    df = eng.execute_sql(
        "select distinct eas_id from poly where eas_id < 170")
    assert sorted(vals(df, "eas_id")) == sorted([168, 169, 166, 158, 165])


def test_distinct_orderby(eng):                            # ogr_sql_3 / _desc
    df = eng.execute_sql("select distinct eas_id from poly "
                         "where eas_id < 170 order by eas_id")
    assert vals(df, "eas_id") == [158, 165, 166, 168, 169]
    df = eng.execute_sql("select distinct eas_id from poly "
                         "where eas_id < 170 order by eas_id desc")
    assert vals(df, "eas_id") == [169, 168, 166, 165, 158]


def test_distinct_strings(eng):                            # ogr_sql_4
    df = eng.execute_sql(
        "select distinct name from idlink order by name asc")
    assert vals(df, "name") == ["_158_", "_165_", "_166_", "_168_",
                                "_170_", "_171_", "_179_"]


def test_summary_functions(eng):                           # ogr_sql_5
    df = eng.execute_sql("select max(eas_id), min(eas_id), avg(eas_id), "
                         "sum(eas_id), count(eas_id) from idlink")
    assert df.columns == ["MAX_eas_id", "MIN_eas_id", "AVG_eas_id",
                          "SUM_eas_id", "COUNT_eas_id"]
    r = df.collect()[0]
    assert r["MAX_eas_id"] == 179 and r["MIN_eas_id"] == 158
    assert abs(r["AVG_eas_id"] - 168.142857142857) <= 1e-12
    assert r["SUM_eas_id"] == 1177 and r["COUNT_eas_id"] == 7


def test_count_star(eng):                                  # ogr_sql_6
    df = eng.execute_sql("select count(*) from poly")
    assert df.columns == ["COUNT_*"] and vals(df, "COUNT_*") == [10]


def test_fid_and_in(eng):                                  # ogr_sql_7
    df = eng.execute_sql(
        "select eas_id, fid from poly where eas_id in (158,165)")
    assert sorted(vals(df, "fid")) == [7, 8]


def test_star_expansion(eng):                              # ogr_sql_8 / 9
    for tbl in ("poly", '"poly"'):
        df = eng.execute_sql(
            f"select * from {tbl} where eas_id in (158,165)")
        assert df.columns == ["area", "eas_id", "prfedea"]
        assert sorted(vals(df, "prfedea")) == ["35043369", "35043408"]


def test_ilike(eng):                                       # ogr_sql_10
    df = eng.execute_sql(
        "select eas_id from poly where prfedea ilike '%413'")
    assert vals(df, "eas_id") == [170]


def test_summary_on_empty(eng):                            # ogr_sql_11 / 12
    df = eng.execute_sql("select max(eas_id) from empty")
    assert vals(df, "MAX_eas_id") == [None]
    assert eng.execute_sql("select distinct eas_id from empty").count() == 0


def test_ogr_geometry_special(eng):                        # ogr_sql_13
    df = eng.execute_sql("select ogr_geometry from poly "
                         "where ogr_geometry = 'POLYGON'")
    assert vals(df, "ogr_geometry") == ["POLYGON"] * 10


def test_fid_filter(eng):                                  # ogr_sql_15
    df = eng.execute_sql(
        "select fid, eas_id, prfedea from poly where fid = 7")
    assert vals(df, "fid") == [7] and vals(df, "eas_id") == [158]


def test_case_sensitive_lt(eng):                           # ogr_sql_16
    df = eng.execute_sql("select fid from misc where s < 'H'")
    assert sorted(vals(df, "fid")) == [1, 2]   # 'Alpha','BETA' < 'H'


def test_cast(eng):                                        # ogr_sql_17
    df = eng.execute_sql("select CAST(fid as CHARACTER(10)), "
                         "CAST(area as numeric(7,3)) from poly "
                         "where fid = 1")
    assert df.columns == ["fid", "area"]
    r = df.collect()[0]
    assert r["fid"] == "1" and isinstance(r["area"], float)


def test_in_string_promotion(eng):                         # ogr_sql (atoi)
    one = eng.execute_sql(
        "select count(*) from poly where eas_id in ('165')")
    assert vals(one, "COUNT_*") == [1]
    zero = eng.execute_sql(
        "select count(*) from poly where eas_id in ('a165')")
    assert vals(zero, "COUNT_*") == [0]


def test_ci_equality(eng):                                 # swq ci '='
    assert vals(eng.execute_sql(
        "select fid from misc where s = 'alpha'"), "fid") == [1]
    assert vals(eng.execute_sql(
        "select fid from misc where s in ('ALPHA', 'x')"), "fid") == [1]
    assert sorted(vals(eng.execute_sql(
        "select fid from misc where s <> 'beta' and s is not null"),
        "fid")) == [1]


def test_literal_columns(eng):                             # ogr_sql (644)
    df = eng.execute_sql("select 'literal_value' as my_column, "
                         "'literal_value2' my_column2 from misc")
    assert df.columns == ["my_column", "my_column2"]
    assert vals(df, "my_column") == ["literal_value"] * 3


def test_null_predicates(eng):
    assert vals(eng.execute_sql(
        "select fid from misc where s is null"), "fid") == [3]
    assert sorted(vals(eng.execute_sql(
        "select fid from misc where s is not null"), "fid")) == [1, 2]


def test_between_not(eng):
    df = eng.execute_sql(
        "select fid from poly where eas_id between 165 and 169")
    assert sorted(vals(df, "fid")) == [0, 5, 6, 8]
    df = eng.execute_sql(
        "select fid from poly where eas_id not between 158 and 172 "
        "and not (fid = 3)")
    assert sorted(vals(df, "fid")) == [1]


def test_arithmetic_and_funcs(eng):
    df = eng.execute_sql("select eas_id % 5 as m, eas_id + 1 p1, "
                         "CONCAT(prfedea, '_x'), SUBSTR(prfedea, -2) t "
                         "from poly where fid = 0")
    r = df.collect()[0]
    assert r["m"] == 3 and r["p1"] == 169
    # unaliased CONCAT over a column ref composes CONCAT_field
    # (swq_select.cpp:504); SUBSTR here carries the 't' alias
    assert r["CONCAT_prfedea"] == "35043411_x" and r["t"] == "11"


def test_hstore(eng):
    # HSTORE_GET_VALUE gets no name capture (generic branch,
    # swq_select.cpp:485) -> anonymous FIELD_n
    df = eng.execute_sql("select HSTORE_GET_VALUE(h, 'b') from misc "
                         "where fid = 1")
    assert vals(df, "FIELD_1") == ["2"]


def test_order_by_special_fields(eng):   # ogr_sql (1217, 1235)
    df = eng.execute_sql("select eas_id from poly order by OGR_GEOM_AREA")
    got = vals(df, "eas_id")
    assert got[0] == 173 and got[1] == 158   # areas 72, 96 then ties of 100
    df = eng.execute_sql("select prfedea from poly order by FID desc")
    assert vals(df, "prfedea")[0] == "35043413"


def test_summary_special_field(eng):     # ogr_sql (1199)
    df = eng.execute_sql("SELECT MAX(OGR_GEOM_AREA) FROM poly")
    assert df.columns == ["MAX_OGR_GEOM_AREA"]
    assert vals(df, "MAX_OGR_GEOM_AREA") == [100.0]


def test_count_distinct(eng):            # ogr_sql (1146 spirit)
    df = eng.execute_sql(
        "select count(s), count(distinct s), count(*) from misc")
    r = df.collect()[0]
    assert (r["COUNT_s"], r[1], r["COUNT_*"]) == (2, 2, 3)


def test_union_all(eng):
    df = eng.execute_sql(
        "select eas_id from poly where eas_id = 158 "
        "union all select eas_id from idlink where eas_id = 158")
    assert vals(df, "eas_id") == [158, 158]


# --- ogr_join_test.py ports --------------------------------------------------

def test_join_star(eng):                                   # ogr_join_1 / 2
    df = eng.execute_sql("SELECT * FROM poly LEFT JOIN idlink "
                         "ON poly.eas_id = idlink.eas_id")
    assert df.count() == 10
    assert df.columns == ["area", "eas_id", "prfedea",
                          "idlink.eas_id", "idlink.name"]
    df2 = eng.execute_sql(
        "SELECT * FROM poly LEFT JOIN idlink ON poly.eas_id = idlink.eas_id "
        "WHERE eas_id < 168 ORDER BY fid")
    assert vals(df2, "idlink.name") == ["_166_", "_158_", "_165_"]


def test_join_secondary_star(eng):                         # ogr_join_3
    df = eng.execute_sql(
        "SELECT poly.area, idlink.* FROM poly "
        "LEFT JOIN idlink ON poly.eas_id = idlink.eas_id "
        "WHERE eas_id < 168 ORDER BY fid")
    assert df.columns == ["poly.area", "idlink.eas_id", "idlink.name"]
    assert vals(df, "idlink.name") == ["_166_", "_158_", "_165_"]


def test_join_unmatched_null(eng):                         # ogr_join_4
    df = eng.execute_sql(
        "SELECT poly.*, name FROM poly "
        "LEFT JOIN idlink ON poly.eas_id = idlink.eas_id "
        "WHERE eas_id > 170 ORDER BY fid")
    assert vals(df, "name") == ["_179_", "_171_", None, None]


def test_join_aliases(eng):                                # ogr_join (aliased)
    df = eng.execute_sql(
        "SELECT p.eas_id FROM poly p LEFT JOIN idlink il "
        "ON p.eas_id = il.eas_id WHERE il.name = '_158_'")
    assert df.columns == ["p.eas_id"]
    assert vals(df, "p.eas_id") == [158]


def test_join_first_match(spark):
    """First-matching-row-only semantics (ogr_gensql.cpp:1283-1314): a
    secondary layer with duplicate keys contributes exactly one row."""
    eng2 = OGRSQLEngine(spark)
    eng2.register("a", spark.createDataFrame(
        [(1, 10), (2, 20)], "fid long, k long"), geometry_col=None)
    eng2.register("b", spark.createDataFrame(
        [(1, 10, "first"), (2, 10, "second")],
        "fid long, k long, v string"), geometry_col=None)
    df = eng2.execute_sql(
        "SELECT a.fid, v FROM a LEFT JOIN b ON a.k = b.k ORDER BY fid")
    assert df.count() == 2
    assert vals(df, "v") == ["first", None]


# --- DDL routing --------------------------------------------------------------

def test_ddl(spark):
    eng2 = OGRSQLEngine(spark)
    eng2.register("t", spark.createDataFrame(
        [(1, "x")], "fid long, s string"), geometry_col=None)
    assert eng2.execute_sql("CREATE INDEX ON t USING s") is None
    assert eng2.indexes["t"] == {"s"}
    eng2.execute_sql("DROP INDEX ON t USING s")
    assert eng2.indexes["t"] == set()
    eng2.execute_sql("ALTER TABLE t ADD COLUMN extra INTEGER")
    assert "extra" in eng2.layers["t"][0].columns
    eng2.execute_sql("ALTER TABLE t RENAME COLUMN extra TO e2")
    assert "e2" in eng2.layers["t"][0].columns
    eng2.execute_sql("ALTER TABLE t ALTER COLUMN e2 TYPE CHARACTER")
    assert dict(eng2.layers["t"][0].dtypes)["e2"] == "string"
    eng2.execute_sql("ALTER TABLE t DROP COLUMN e2")
    assert "e2" not in eng2.layers["t"][0].columns
    eng2.execute_sql("DROP TABLE t")
    assert "t" not in eng2.layers


def test_one_shot_helper(spark):
    df = execute_sql(spark, "select count(*) from poly",
                     {"poly": PG.poly_fixture(spark)})
    assert vals(df, "COUNT_*") == [10]


def test_quoted_identifiers(spark):
    """ogr_sql_test.py:1424 shapes: quoted columns, keyword-named column,
    literal select, aliases in both quote styles, quoted table."""
    eng2 = OGRSQLEngine(spark)
    eng2.register("test", spark.createDataFrame(
        [(1, "from"), (2, "x")], "id long, `from` string"),
        geometry_col=None)
    df = eng2.execute_sql(
        "select id, 'id', \"id\" as id2, id as \"id3\", \"from\" "
        "from \"test\" where \"from\" = 'from'")
    assert df.columns[0] == "id" and df.columns[2] == "id2" \
        and df.columns[3] == "id3" and df.columns[4] == "from"
    r = df.collect()
    assert len(r) == 1 and r[0]["id"] == 1 and r[0][1] == "id"
    # literal DISTINCT collapses to one row (swq DISTINCT_LIST on a const)
    assert eng2.execute_sql("select distinct 'id' from test").count() == 1


def test_datetime_comparison(spark):
    """Date/Time comparison semantics (the dialect's only datetime ops,
    gdal/ogr/ogr_sql.dox): string literals compare against timestamp
    fields through Spark's implicit cast."""
    import datetime as dt

    eng2 = OGRSQLEngine(spark)
    eng2.register("ev", spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1, 10)), (2, dt.datetime(2021, 6, 1, 9))],
        "fid long, ts timestamp"), geometry_col=None)
    df = eng2.execute_sql("select fid from ev where ts > '2020-06-01'")
    assert vals(df, "fid") == [2]
    df = eng2.execute_sql(
        "select fid from ev where ts between '2019-01-01' and '2020-12-31'")
    assert vals(df, "fid") == [1]


def test_where_arithmetic(spark, eng):
    df = eng.execute_sql(
        "select fid from poly where (eas_id - 158) % 7 = 0 and fid * 2 < 10")
    assert sorted(vals(df, "fid")) == [1, 4]   # eas 179, 172 (+21, +14)


# --- ogr_sql_rfc28.py ports -------------------------------------------------

def test_rfc28_negative_substr(eng):           # ogr_rfc28_27
    df = eng.execute_sql(
        "SELECT SUBSTR(PRFEDEA,-2) from poly where eas_id in (168,179)")
    assert sorted(vals(df, df.columns[0])) == ["11", "23"]


def test_rfc28_unary_minus(eng):               # ogr_rfc28_8
    df = eng.execute_sql(
        "SELECT -1, 3--1,3*-1,2e-1,3-1 from poly where eas_id = 168")
    assert [tuple(r) for r in df.collect()] == [(-1, 4, -3, 0.2, 2)]


def test_rfc28_integer_division(eng):          # ogr_rfc28_9
    """swq '/' on two integers is C integer division (truncating); any
    float operand promotes to float division."""
    df = eng.execute_sql(
        "SELECT 5/2, 5.0/2.0, 5/2.0, 5.0/2 from poly where eas_id = 168")
    assert [tuple(r) for r in df.collect()] == [(2, 2.5, 2.5, 2.5)]
    df = eng.execute_sql("SELECT -5/2 from poly where eas_id = 168")
    assert vals(df, df.columns[0]) == [-2]     # trunc toward zero, not floor


def test_rfc28_big_float_literal(eng):         # ogr_rfc28_28
    df = eng.execute_sql("SELECT * FROM poly WHERE 4000000000. > 2000000000.")
    assert df.count() == 10


def test_rfc28_count_distinct_alias(eng):      # ogr_rfc28_11
    df = eng.execute_sql('SELECT COUNT(distinct eas_id), '
                         'COUNT(distinct eas_id) as "xx" from poly')
    assert df.columns[1] == "xx"
    assert [tuple(r) for r in df.collect()] == [(10, 10)]


def test_rfc28_cast_int_types(eng):            # ogr_rfc28_37 / _38
    df = eng.execute_sql(
        "SELECT CAST(1 AS BOOLEAN), CAST(1 AS SMALLINT), "
        "CAST(1 AS bigint), CAST(1 AS numeric(15,0)) "
        "from poly where eas_id = 168")
    assert [tuple(r) for r in df.collect()] == [(True, 1, 1, 1)]


def test_rfc28_count_empty_result(eng):        # ogr_rfc28_32
    df = eng.execute_sql("SELECT COUNT(*) from poly where 0 = 1")
    assert [tuple(r) for r in df.collect()] == [(0,)]


def test_rfc28_constant_select(eng):           # ogr_rfc28_4
    df = eng.execute_sql("SELECT 'constant string', 'other' as abc, eas_id "
                         "from poly where eas_id = 165")
    assert [tuple(r) for r in df.collect()] == [("constant string",
                                                 "other", 165)]


def test_rfc28_null_select(eng):                # ogr_rfc28_24
    """Bare NULL, aliased NULL, and CAST(null AS type) select as unset
    (null) fields; 'NULL IS NULL' keeps every row."""
    df = eng.execute_sql("select *, NULL, NULL as nullstrfield, "
                         "CAST(null as integer) as nullintfield "
                         "from poly where NULL IS NULL")
    rows = df.collect()
    assert len(rows) == 10
    anon = [c for c in df.columns if c.startswith("FIELD_")][0]
    assert all(r[anon] is None and r["nullstrfield"] is None
               and r["nullintfield"] is None for r in rows)


def test_rfc28_like_escape_plain_char(eng):     # ogr_rfc28_25
    """ESCAPE before a non-wildcard char means that literal char."""
    df = eng.execute_sql(
        "select * from poly where prfedea LIKE 'x35043408' ESCAPE 'x'")
    assert df.count() == 1


def test_rfc28_null_arithmetic(eng):            # ogr_rfc28_29
    """Binary ops with a NULL operand yield NULL (never match)."""
    df = eng.execute_sql(
        "select * from idlink where (eas_id + cast(null as integer)) "
        "is not null or eas_id = 170 + cast(null as integer) or "
        "(eas_id + cast(null as float)) is not null or "
        "eas_id = 170.0 + cast(null as float)")
    assert df.count() == 0


def test_rfc28_as_table_alias(eng):             # ogr_rfc28 'AS' alias
    df = eng.execute_sql(
        "select eas_id from idlink as il where il.eas_id = 166")
    assert vals(df, "eas_id") == [166]


def test_rfc28_not_like(eng):
    a = eng.execute_sql(
        "select * from poly where PRFEDEA NOT LIKE '35043413'").count()
    b = eng.execute_sql(
        "select * from poly where NOT (PRFEDEA LIKE '35043413')").count()
    assert a == b == 9


def test_rfc28_date_aggregates(spark):         # ogr_rfc28_33
    """MIN/MAX over datetimes keep the extreme instants; AVG is the
    average unix time ('2013/07/02 11:59:59.500' in the autotest)."""
    import datetime as dt
    eng3 = OGRSQLEngine(spark)
    eng3.register("test", spark.createDataFrame(
        [(1, dt.datetime(2013, 12, 31, 23, 59, 59)),
         (2, dt.datetime(2013, 1, 1))],
        "fid long, date timestamp"), geometry_col=None)
    r = eng3.execute_sql(
        "SELECT MIN(DATE), MAX(DATE), AVG(DATE) from test").collect()[0]
    assert r["MIN_DATE"] == dt.datetime(2013, 1, 1)
    assert r["MAX_DATE"] == dt.datetime(2013, 12, 31, 23, 59, 59)
    assert r["AVG_DATE"] == dt.datetime(2013, 7, 2, 11, 59, 59, 500000)


def test_rfc28_union_all_selects(eng):         # ogr_rfc28_31
    df = eng.execute_sql(
        "select * from idlink union all select * from idlink")
    assert df.count() == 14


def test_sql27_datetime_filter_orderby(spark):  # ogr_sql_27
    """Datetime comparisons + ORDER BY DESC over the testdatetime.csv
    values (reference expects foo5, foo4)."""
    import datetime as dt
    rows = [("foo1", dt.datetime(2010, 5, 15, 12)),
            ("foo1bis", dt.datetime(2010, 5, 15, 12)),
            ("foo2", dt.datetime(2009, 12, 31, 23)),
            ("foo3", dt.datetime(2010, 6, 15, 12)),
            ("foo4", dt.datetime(2009, 11, 15, 12)),
            ("foo5", dt.datetime(2009, 12, 30, 23)),
            ("foo2bis", dt.datetime(2009, 12, 31, 23))]
    eng4 = OGRSQLEngine(spark)
    eng4.register("testdatetime", spark.createDataFrame(
        rows, "name string, timestamp timestamp"), geometry_col=None)
    df = eng4.execute_sql(
        "SELECT * FROM testdatetime WHERE "
        "timestamp < '2010/04/01 00:00:00' AND "
        "timestamp > '2009/11/15 11:59:59' AND "
        "timestamp != '2009/12/31 23:00:00' "
        "ORDER BY timestamp DESC")
    assert vals(df, "name") == ["foo5", "foo4"]


# --- round-3 ports: the remaining portable ogr_sql_test.py cases ------------

@pytest.fixture(scope="module")
def eng2(spark):
    """Memory-layer fixtures for ogr_sql_20..46 (the reference builds
    these with the Memory driver per case)."""
    from gdal_spark.functions.geometry import wkb_from_wkt as W
    e = OGRSQLEngine(spark)
    e.register("poly", PG.poly_fixture(spark))
    e.register("bare", spark.createDataFrame(          # ogr_sql_20/21
        [(0, bytearray(W("POINT(0 1)"))), (1, bytearray(W("POINT(2 3)")))],
        "fid long, geometry binary"))
    e.register("my_layer", spark.createDataFrame(      # ogr_sql_22/23
        [(0, "0", bytearray(W("POINT(0 1)"))),
         (1, "1", bytearray(W("POINT(2 3)")))],
        "fid long, test string, geometry binary"))
    e.register("geoml", spark.createDataFrame(         # ogr_sql_25
        [(0, "0", bytearray(W("POLYGON((0 0,0 1,1 1,1 0,0 0))"))),
         (1, "1", bytearray(W("POLYGON((0 0,0 0.5,0.5 0.5,0.5 0,0 0))")))],
        "fid long, test string, geometry binary"))
    e.register("t29", spark.createDataFrame(           # ogr_sql_29
        [(0, "a"), (1, "b"), (2, None)],
        "fid long, strfield string"), geometry_col=None)
    e.register("t36", spark.createDataFrame(           # ogr_sql_36
        [(1, 2.3, "456", 1234567890123),
         (None, None, None, None)],
        "intfield int, floatfield double, strfield string, int64field long"),
        geometry_col=None)
    e.register("t37", spark.createDataFrame(           # ogr_sql_37
        [(1, None, "456", None, None), (1, None, "456", None, None),
         (None, 2.3, None, "foo", None), (None, 2.3, None, None, None)],
        "intfield int, floatfield double, strfield string, "
        "strfield2 string, strfield3 string"), geometry_col=None)
    e.register("qt", spark.createDataFrame(            # ogr_sql_46
        [(1, "not_from"), (3, "from")],
        "id long, `from` string"), geometry_col=None)
    return e


def test_where_in_select_star(eng):                        # ogr_sql_9
    df = eng.execute_sql(
        'select * from "poly" where eas_id in (158,165)')
    assert sorted(vals(df, "prfedea")) == ["35043369", "35043408"]


def test_distinct_empty_layer(eng):                        # ogr_sql_12
    df = eng.execute_sql("select distinct eas_id from empty")
    assert df.count() == 0


def test_empty_statement_rejected(eng):                    # ogr_sql_19
    with pytest.raises(ValueError):
        eng.execute_sql("")


def test_star_fieldless_layer(eng2):                       # ogr_sql_20
    df = eng2.execute_sql("SELECT * from bare")
    assert df.count() == 2


def test_star_plus_fid(eng2):                              # ogr_sql_21
    df = eng2.execute_sql("SELECT *, fid from bare")
    assert df.columns == ["fid"]


def test_multi_star_expansion(eng2):                       # ogr_sql_22
    df = eng2.execute_sql("SELECT *, fid, *, my_layer.* from my_layer")
    assert df.columns == ["test", "fid", "test", "my_layer.test"]


def test_distinct_string_field(eng2):                      # ogr_sql_23
    df = eng2.execute_sql("SELECT DISTINCT test from my_layer")
    assert df.count() == 2


def test_geom_area_special_field(eng2):                    # ogr_sql_25
    df = eng2.execute_sql("SELECT test, OGR_GEOM_AREA from geoml "
                          "WHERE OGR_GEOM_AREA > 0.9")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["OGR_GEOM_AREA"] == 1.0
    assert rows[0]["test"] == "0"


def test_string_literal_select(eng2):                      # ogr_sql_26
    df = eng2.execute_sql("SELECT 'literal_value' AS my_column, "
                          "'literal_value2' my_column2 FROM bare")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["my_column"] == "literal_value"
    assert rows[0]["my_column2"] == "literal_value2"


def test_is_null(eng2):                                    # ogr_sql_29
    assert eng2.execute_sql(
        "select * from t29 where strfield is null").count() == 1
    assert eng2.execute_sql(
        "select * from t29 where strfield is not null").count() == 2


def test_count_star_with_min(eng):                         # ogr_sql_30
    df = eng.execute_sql("select min(eas_id), count(*) from poly")
    r = df.collect()[0]
    assert r["COUNT_*"] == 10


def test_min_over_empty_selection(eng):                    # ogr_sql_31/32
    df = eng.execute_sql("select min(eas_id) from poly where area = 0")
    assert df.collect()[0][0] is None


def test_in_string_promotion(eng):                         # ogr_sql_34
    # atoi promotion: IN ('165') matches eas_id 165 (engine deviation,
    # documented: non-numeric strings match nothing instead of erroring)
    df = eng.execute_sql(
        "select count(*) from poly where eas_id in ('165')")
    assert df.collect()[0][0] == 1


def test_huge_select_list(eng):                            # ogr_sql_35
    cols = "area"
    for _ in range(10):
        cols = cols + "," + cols
    df = eng.execute_sql(f"select {cols} from poly")
    assert len(df.columns) == 1024


@pytest.mark.parametrize("field", ["intfield", "int64field", "floatfield",
                                   "strfield"])
def test_distinct_null_ordering(eng2, field):              # ogr_sql_36
    df = eng2.execute_sql(
        f"select distinct {field} from t36 order by {field} asc")
    rows = df.collect()
    assert rows[0][0] is None and rows[1][0] is not None
    df = eng2.execute_sql(
        f"select distinct {field} from t36 order by {field} desc")
    rows = df.collect()
    assert rows[0][0] is not None and rows[1][0] is None


@pytest.mark.parametrize("field", ["intfield", "floatfield", "strfield"])
def test_count_with_nulls(eng2, field):                    # ogr_sql_37
    df = eng2.execute_sql(f"select count({field}), "
                          f"count(distinct {field}), count(*) from t37")
    r = df.collect()[0]
    assert (r[0], r[1], r[2]) == (2, 1, 4)


def test_avg_all_null_and_distinct_null_first(eng2):       # ogr_sql_37 (cont)
    df = eng2.execute_sql(
        "select avg(intfield) from t37 where intfield is null")
    assert df.collect()[0][0] is None
    df = eng2.execute_sql("select distinct strfield2 from t37")
    got = sorted(vals(df, "strfield2"), key=lambda v: (v is None, v))
    assert got == ["foo", None]
    df = eng2.execute_sql("select distinct strfield3 from t37")
    assert vals(df, "strfield3") == [None]


def test_max_geom_area_summary(eng2):                      # ogr_sql_38
    df = eng2.execute_sql("SELECT MAX(OGR_GEOM_AREA) FROM geoml")
    assert df.collect()[0][0] == 1.0


def test_orderby_geom_area(eng2):                          # ogr_sql_39
    df = eng2.execute_sql("SELECT * FROM geoml ORDER BY OGR_GEOM_AREA")
    assert vals(df, "test") == ["1", "0"]


def test_orderby_fid_desc(eng):                            # ogr_sql_40
    df = eng.execute_sql("SELECT *, FID FROM poly ORDER BY FID DESC")
    assert df.collect()[0]["FID"] == 9


def test_orderby_geometry_keeps_rows(eng):                 # ogr_sql_41
    # ORDER BY OGR_GEOMETRY: all keys equal ('POLYGON') — the reference's
    # stable sort keeps FID 0 first; a distributed sort has no stability
    # guarantee (documented deviation), so assert the full result set
    df = eng.execute_sql("SELECT * FROM poly ORDER BY OGR_GEOMETRY")
    assert df.count() == 10


def test_not_equal_empty_string(eng):                      # ogr_sql_42
    df = eng.execute_sql("SELECT * FROM poly WHERE prfedea <> ''")
    assert df.count() == 10


def test_escape_sequences(eng):                            # ogr_sql_43
    df = eng.execute_sql("SELECT '\"' as a, '\\'' as b, '''' as c "
                         "FROM poly")
    r = df.collect()[0]
    assert r["a"] == '"' and r["b"] == "'" and r["c"] == "'"


def test_hstore_get_value_sql(eng):                        # ogr_sql_44
    invalid = ["'a'", "'a=>'", "' a => '", "'\"a'", "'\"a\"'", "'\"a\"='",
               "'\"a\" =>'", "'\"a\" => '", "'\"a\" => \"'",
               "'\"a\" => \"\" z'", "'a=>b,z,c=>d'"]
    for h in invalid:
        key = "'c'" if "c=>" in h else "'a'"
        df = eng.execute_sql(
            f"SELECT hstore_get_value({h}, {key}) FROM poly WHERE fid=0")
        assert df.collect()[0][0] is None, h
    valid = ["'a=>b'", "' a => b '", "'\"a\"=>b'", "' \"a\" =>b'",
             "'a=>\"b\"'", "'a=> \"b\" '", "'\"a\"=>\"b\"'",
             "' \"a\" => \"b\" '"]
    for h in valid:
        df = eng.execute_sql(
            f"SELECT hstore_get_value({h}, 'a') FROM poly WHERE fid=0")
        assert df.collect()[0][0] == "b", h
    # escaped quote inside a quoted key
    df = eng.execute_sql("SELECT hstore_get_value(' \"a\\\"b\" => \"b\" ',"
                         " 'a\"b') FROM poly WHERE fid=0")
    assert df.collect()[0][0] == "b"


def test_strict_quoting(eng2):                             # ogr_sql_46
    df = eng2.execute_sql('select id, \'id\', "id" as id2, id as "id3", '
                          '"from" from qt where "from" = \'from\'')
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r[0], r[1], r[2], r[3], r[4]) == (3, "id", 3, 3, "from")
    df = eng2.execute_sql('select max("id"), max(id), count("id"), '
                          'count(id) from "qt"')
    r = df.collect()[0]
    assert (r[0], r[1], r[2], r[3]) == (3, 3, 2, 2)
    with pytest.raises(ValueError):
        eng2.execute_sql("select * from 'qt'")


# --- round-3 ports: remaining portable ogr_sql_rfc28.py cases ---------------

def test_rfc28_expr_left_of_column(eng):                   # ogr_rfc28_1
    df = eng.execute_sql("select * from poly where 160+7 > eas_id")
    assert df.count() == 3


def test_rfc28_concat_in_where(eng):                       # ogr_rfc28_2
    df = eng.execute_sql(
        "select * from poly where CONCAT('x',PRFEDEA) = 'x35043423'")
    assert df.count() == 1


def test_rfc28_plus_on_strings(eng):                       # ogr_rfc28_3
    df = eng.execute_sql(
        "select * from poly where 'x'+PRFEDEA = 'x35043423'")
    assert df.count() == 1


def test_rfc28_quoted_field(eng):                          # ogr_rfc28_6
    df = eng.execute_sql('select * from poly where "EAS_ID" = 166')
    assert df.count() == 1


def test_rfc28_fixed_strings(eng):                         # ogr_rfc28_12
    df = eng.execute_sql("SELECT 'constant string', 'other' as abc, eas_id "
                         "from idlink where eas_id = 165")
    r = df.collect()
    assert len(r) == 1
    assert r[0]["abc"] == "other" and r[0]["eas_id"] == 165
    assert r[0]["FIELD_1"] == "constant string"


def test_rfc28_substr_where_and_naming(eng):               # ogr_rfc28_13/14
    df = eng.execute_sql(
        "select * from poly where SUBSTR(PRFEDEA,5,4) = '3423'")
    assert df.count() == 1
    df = eng.execute_sql(
        "SELECT SUBSTR(PRFEDEA,4,5) from poly where eas_id in (168,179)")
    assert df.columns == ["SUBSTR_PRFEDEA"]
    assert sorted(vals(df, "SUBSTR_PRFEDEA")) == ["43411", "43423"]


def test_rfc28_concat_multi_arg(eng):                      # ogr_rfc28_15
    df = eng.execute_sql(
        "SELECT CONCAT(PRFEDEA,' ',CAST(EAS_ID AS CHARACTER(3))) "
        "from poly where eas_id in (168,179)")
    assert df.columns == ["CONCAT_PRFEDEA"]
    assert sorted(vals(df, "CONCAT_PRFEDEA")) == \
        ["35043411 168", "35043423 179"]


def test_rfc28_negative_numbers(eng):                      # ogr_rfc28_16
    df = eng.execute_sql(
        "SELECT -1, 3--1,3*-1,2e-1,3-1 from poly where eas_id = 168")
    r = df.collect()[0]
    assert (r[0], r[1], r[2], r[3], r[4]) == (-1, 4, -3, 0.2, 2)


def test_rfc28_division_types(eng):                        # ogr_rfc28_17
    df = eng.execute_sql(
        "SELECT 5/2, 5.0/2.0, 5/2.0, 5.0/2 from poly where eas_id = 168")
    r = df.collect()[0]
    assert (r[0], r[1], r[2], r[3]) == (2, 2.5, 2.5, 2.5)


def test_rfc28_count_distinct_alias(eng):                  # ogr_rfc28_18
    df = eng.execute_sql('SELECT COUNT(distinct eas_id), '
                         'COUNT(distinct eas_id) as "xx" from idlink')
    r = df.collect()[0]
    assert df.columns == ["COUNT_eas_id", "xx"]
    assert r[0] == 7 and r[1] == 7


def test_rfc28_not_in(eng):                                # ogr_rfc28_19
    df = eng.execute_sql(
        "select * from poly where eas_id not in (158,165)")
    assert df.count() == 8


def test_rfc28_precedence_unary_minus(eng2):               # ogr_rfc28_20
    # -2 + 1 + 2*3 + 5 - 3*2 = 4 over a layer whose intfield = 2
    spark = eng2.execute_sql("select * from t36").sparkSession
    e = OGRSQLEngine(spark)
    e.register("m20", spark.createDataFrame([(2,)], "intfield int"),
               geometry_col=None)
    df = e.execute_sql(
        "select -intfield + 1 + 2 * 3 + 5 - 3 * 2 from m20")
    assert df.collect()[0]["FIELD_1"] == 4


def test_rfc28_between_equivalence(eng):                   # ogr_rfc28_21/22
    a = eng.execute_sql(
        "select * from poly where eas_id between 165 and 169").count()
    b = eng.execute_sql(
        "select * from poly where eas_id >= 165 and eas_id <= 169").count()
    assert a == b
    c = eng.execute_sql(
        "select * from poly where eas_id not between 165 and 169").count()
    d = eng.execute_sql(
        "select * from poly where not(eas_id >= 165 and eas_id <= 169)"
    ).count()
    assert c == d


def test_rfc28_not_like_equivalence(eng):                  # ogr_rfc28_23
    a = eng.execute_sql(
        "select * from poly where PRFEDEA NOT LIKE '35043413'").count()
    b = eng.execute_sql(
        "select * from poly where NOT (PRFEDEA LIKE '35043413')").count()
    assert a == b


def test_rfc28_concat_null_is_null(eng2):                  # ogr_rfc28_30
    spark = eng2.execute_sql("select * from t36").sparkSession
    e = OGRSQLEngine(spark)
    e.register("idlink2", spark.createDataFrame(
        [("foo",)] * 7, "f1 string"), geometry_col=None)
    df = e.execute_sql("select * from idlink2 where F1 <> 'foo' or "
                       "concat(F1,cast(null as character(32))) is not null")
    assert df.count() == 0


def test_rfc28_unterminated_string(eng):                   # ogr_rfc28_33
    with pytest.raises(ValueError, match="lex error"):
        eng.execute_sql("select * from idlink where name='foo")


def test_rfc28_unknown_table_star(eng):                    # ogr_rfc28_34
    with pytest.raises(ValueError, match="foo"):
        eng.execute_sql("select foo.* from idlink")


def test_rfc28_distinct_orderby_rules(eng):                # ogr_rfc28_36/37
    with pytest.raises(ValueError):
        eng.execute_sql(
            "select distinct eas_id from idlink order by eas_id, name")
    with pytest.raises(ValueError):
        eng.execute_sql("select distinct eas_id from idlink order by name")


def test_rfc28_substr_arity_and_type(eng):                 # ogr_rfc28_38
    with pytest.raises(ValueError, match="2 or 3 arguments to SUBSTR"):
        eng.execute_sql("SELECT SUBSTR(PRFEDEA) from poly")
    with pytest.raises(ValueError, match="Wrong argument type for SUBSTR"):
        eng.execute_sql("SELECT SUBSTR(1,2) from poly")


def test_rfc28_count_zero_rows(eng):                       # ogr_rfc28_39
    df = eng.execute_sql("SELECT COUNT(*) from poly where 0 = 1")
    assert df.collect()[0]["COUNT_*"] == 0


def test_rfc28_date_min_max_avg(eng2):                     # ogr_rfc28_40
    spark = eng2.execute_sql("select * from t36").sparkSession
    e = OGRSQLEngine(spark)
    import datetime as dt
    e.register("dtest", spark.createDataFrame(
        [(dt.datetime(2013, 12, 31, 23, 59, 59),),
         (dt.datetime(2013, 1, 1, 0, 0, 0),)],
        "date timestamp"), geometry_col=None)
    df = e.execute_sql("SELECT MIN(DATE), MAX(DATE), AVG(DATE) from dtest")
    r = df.collect()[0]
    assert r["MIN_DATE"] == dt.datetime(2013, 1, 1, 0, 0, 0)
    assert r["MAX_DATE"] == dt.datetime(2013, 12, 31, 23, 59, 59)
    # AVG on dates averages unix time: 2013/07/02 11:59:59.5
    assert r["AVG_DATE"] == dt.datetime(2013, 7, 2, 11, 59, 59, 500000)


def test_rfc28_dot_field_names(eng2):                      # ogr_rfc28_41
    spark = eng2.execute_sql("select * from t36").sparkSession
    from pyspark.sql import types as T
    e = OGRSQLEngine(spark)
    schema = T.StructType([T.StructField("a.b", T.IntegerType())])
    e.register("dotlayer", spark.createDataFrame([(2,)], schema),
               geometry_col=None)
    df = e.execute_sql("select * from dotlayer")
    assert df.columns == ["a.b"]
    assert df.collect()[0][0] == 2
    df = e.execute_sql("select l.* from dotlayer l")
    assert df.columns == ["l.a.b"]
    assert df.collect()[0][0] == 2


def test_rfc28_int64(eng2):                                # ogr_rfc28_43
    spark = eng2.execute_sql("select * from t36").sparkSession
    e = OGRSQLEngine(spark)
    e.register("i64", spark.createDataFrame(
        [(-1000000000000,), (100000000000,)], "myint64 long"),
        geometry_col=None)
    df = e.execute_sql(
        "SELECT 1000000000000, myint64, CAST(1 AS bigint), "
        "CAST(1 AS numeric(15,0)) FROM i64 "
        "WHERE myint64 < -9999999999 or myint64 > 9999999999")
    rows = df.orderBy("myint64").collect()
    assert rows[0][0] == 1000000000000 and rows[0][1] == -1000000000000
    df = e.execute_sql(
        "SELECT MIN(myint64), MAX(myint64), SUM(myint64) FROM i64")
    r = df.collect()[0]
    assert r["MIN_myint64"] == -1000000000000
    assert r["MAX_myint64"] == 100000000000
    assert r["SUM_myint64"] == -1000000000000 + 100000000000
    df = e.execute_sql("SELECT DISTINCT myint64 FROM i64 ORDER BY myint64")
    assert vals(df, "myint64") == [-1000000000000, 100000000000]


def test_rfc28_crazy_quoting(eng2):                        # ogr_rfc28_44
    spark = eng2.execute_sql("select * from t36").sparkSession
    from pyspark.sql import types as T
    e = OGRSQLEngine(spark)
    schema = T.StructType([T.StructField("field.withpoint", T.IntegerType()),
                           T.StructField("foo", T.IntegerType())])
    e.register("lyr.withpoint", spark.createDataFrame(
        [(-1, None), (1, 2)], schema), geometry_col=None)
    df = e.execute_sql(
        'SELECT * FROM "lyr.withpoint" WHERE "field.withpoint" = 1')
    assert df.count() == 1
    df = e.execute_sql(
        'SELECT "lyr.withpoint"."field.withpoint", "field.withpoint" '
        'FROM "lyr.withpoint" WHERE "lyr.withpoint"."field.withpoint" = 1')
    assert df.count() == 1


def test_rfc28_from_as_alias(eng):                         # ogr_rfc28_45
    df = eng.execute_sql(
        "select eas_id from idlink as il where il.eas_id = 166")
    assert df.count() == 1


# --- round-3 ports: remaining portable ogr_join_test.py cases ---------------

@pytest.fixture(scope="module")
def jeng(spark):
    """poly + idlink + idlink2 (string-typed eas_id, extra F1..F3 columns
    — the reference's data/idlink2.csv shape for the type-mismatch join
    cases)."""
    e = OGRSQLEngine(spark)
    e.register("poly", PG.poly_fixture(spark))
    e.register("idlink", PG.idlink_fixture(spark), geometry_col=None)
    rows = [(str(eas), f"_{eas}_", "f1v", "f2v", "f3v")
            for eas in (168, 179, 171, 170, 165, 158, 166)]
    e.register("idlink2", spark.createDataFrame(
        rows, "eas_id string, name string, f1 string, f2 string, f3 string"),
        geometry_col=None)
    return e


def test_join_primary_star_qualified(jeng):                # ogr_join_5/6
    df = jeng.execute_sql(
        "SELECT p.*, il.name FROM poly p "
        "LEFT JOIN idlink il ON p.eas_id = il.eas_id "
        "WHERE eas_id > 170 ORDER BY p.eas_id")
    assert vals(df, "p.eas_id") == [171, 172, 173, 179]


def test_join_two_at_once(jeng):                           # ogr_join_8
    df = jeng.execute_sql(
        "SELECT p.*, il.name, il2.eas_id FROM poly p "
        "LEFT JOIN idlink il ON p.eas_id = il.eas_id "
        "LEFT JOIN idlink2 il2 ON p.eas_id = il2.eas_id "
        "WHERE eas_id > 170 ORDER BY p.eas_id")
    # idlink2.eas_id is a string; matched rows carry it, unmatched None
    assert vals(df, "il2.eas_id") == ["171", None, None, "179"]


def test_join_wildcard_expansion(jeng):                    # ogr_join_9
    df = jeng.execute_sql(
        "SELECT poly.* FROM poly "
        "LEFT JOIN idlink ON poly.eas_id = idlink.eas_id "
        "WHERE eas_id > 170")
    assert sorted(vals(df, "poly.eas_id")) == [171, 172, 173, 179]


def test_join_int_to_nonnumeric_string(jeng):              # ogr_join_10
    df = jeng.execute_sql(
        "SELECT * FROM poly "
        "LEFT JOIN idlink2 ON poly.eas_id = idlink2.name")
    assert vals(df, "idlink2.f3") == [None] * 10


def test_join_on_string_field(jeng):                       # ogr_join_11
    df = jeng.execute_sql("SELECT il.*, il2.* FROM idlink il "
                          "LEFT JOIN idlink2 il2 ON il.NAME = il2.NAME")
    assert sorted(vals(df, "il2.name")) == \
        ["_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_"]


def test_join_numeric_string_promotion(jeng):              # ogr_join_13/14
    df = jeng.execute_sql(
        "SELECT * FROM poly "
        "LEFT JOIN idlink2 ON poly.eas_id = idlink2.eas_id ORDER BY fid")
    got = vals(df, "idlink2.name")
    assert sorted(n for n in got if n is not None) == \
        ["_158_", "_165_", "_166_", "_168_", "_170_", "_171_", "_179_"]
    assert got.count(None) == 3
    df = jeng.execute_sql(
        "SELECT * FROM idlink2 "
        "LEFT JOIN poly ON idlink2.eas_id = poly.eas_id")
    assert sorted(vals(df, "poly.eas_id")) == \
        [158, 165, 166, 168, 170, 171, 179]


def test_join_inverted_on(jeng):                           # ogr_join_18
    df = jeng.execute_sql(
        "SELECT * FROM poly LEFT JOIN idlink ON idlink.eas_id = poly.eas_id")
    assert df.count() == 10


def test_join_unknown_fields(jeng):                        # ogr_join_19/20/21
    with pytest.raises(ValueError, match="foo.*not recognised"):
        jeng.execute_sql(
            "SELECT * FROM poly LEFT JOIN idlink ON poly.foo = idlink.eas_id")
    with pytest.raises(ValueError, match="foo.*not recognised"):
        jeng.execute_sql(
            "SELECT * FROM poly LEFT JOIN idlink ON poly.eas_id = idlink.foo")
    with pytest.raises(ValueError, match="does not correspond"):
        jeng.execute_sql(
            "SELECT p.*, il.name, il2.eas_id FROM poly p "
            "LEFT JOIN idlink il ON p.eas_id = il2.eas_id "
            "LEFT JOIN idlink2 il2 ON p.eas_id = il2.eas_id")


def test_join_multi_key_on(jeng):                          # ogr_join_22
    spark = jeng.execute_sql("select * from idlink").sparkSession
    from pyspark.sql import types as T
    e = OGRSQLEngine(spark)
    s1 = T.StructType([T.StructField("id.1", T.StringType()),
                       T.StructField("id2", T.StringType())])
    s2 = T.StructType([T.StructField("id.1", T.StringType()),
                       T.StructField("id2", T.StringType()),
                       T.StructField("val", T.StringType())])
    e.register("first", spark.createDataFrame([("key1", "key2")], s1),
               geometry_col=None)
    e.register("second", spark.createDataFrame(
        [("key1", "keyX", "1"), ("key1", "key2", "2"), ("key1", "keyY", "3")],
        s2), geometry_col=None)
    df = e.execute_sql('SELECT val FROM first JOIN second ON '
                       'first."id.1" = second."id.1" AND first.id2 = second.id2')
    assert vals(df, "val") == ["2"]


def test_join_expr_after_multi_join(jeng):                 # ogr_join_15
    spark = jeng.execute_sql("select * from idlink").sparkSession
    e = OGRSQLEngine(spark)
    e.register("first", spark.createDataFrame([("key",)], "id string"),
               geometry_col=None)
    e.register("second", spark.createDataFrame(
        [("a2", "key", "c2")], "col1_2 string, id string, col3_2 string"),
        geometry_col=None)
    e.register("third", spark.createDataFrame(
        [("a3", "key", "c3")], "col1_3 string, id string, col3_3 string"),
        geometry_col=None)
    df = e.execute_sql(
        "SELECT concat(col3_2, ''), col3_2 FROM first "
        "JOIN second ON first.id = second.id "
        "JOIN third ON first.id = third.id")
    r = df.collect()[0]
    assert r[0] == "c2" and r[1] == "c2"
