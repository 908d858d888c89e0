"""XLSX / ODS readers vs the reference's autotest expectations
(autotest/ogr/ogr_xlsx.py ogr_xlsx_1/2, ogr_ods.py)."""

import os

import pytest

from gdal_spark.sources.spreadsheet import (ods_sheets, read_ods,
                                            read_xlsx,
                                            spreadsheet_field_types,
                                            xlsx_sheets)

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/test.xlsx"),
    reason="reference autotest data not present")

WANT_TYPES = ["String", "Integer", "Real", "Real", "Date", "DateTime",
              "Real", "Time", "Real", "Integer", "Real", "DateTime"]


def test_xlsx_layers():
    names = xlsx_sheets(f"{DATA}/test.xlsx")
    assert names[0] == "Feuille1"
    assert "Feuille7" in names


def test_xlsx_feuille1_count(spark):
    # 26 features incl the empty gap rows the reference materializes
    assert read_xlsx(spark, f"{DATA}/test.xlsx", "Feuille1").count() == 26


def test_xlsx_feuille7(spark):
    assert spreadsheet_field_types(
        spark, f"{DATA}/test.xlsx", "Feuille7") == WANT_TYPES
    df = read_xlsx(spark, f"{DATA}/test.xlsx", "Feuille7")
    rows = df.orderBy("fid").collect()
    assert len(rows) == 2
    r = rows[0]
    cols = df.columns
    assert r[cols[1]] == "val"
    assert r[cols[2]] == 23
    assert r[cols[3]] == 3.45
    assert r[cols[4]] == 0.52
    assert r[cols[5]] == "2012/01/22"
    assert r[cols[6]] == "2012/01/22 18:49:00"
    # second feature leaves field 2 unset
    assert rows[1][cols[3]] is None


def test_xlsx_headers_disabled(spark):
    # ogr_xlsx_2: OGR_XLSX_HEADERS=DISABLE -> 3 features
    assert read_xlsx(spark, f"{DATA}/test.xlsx", "Feuille7",
                     headers="none").count() == 3


def test_ods(spark):
    assert ods_sheets(f"{DATA}/test.ods")[0] == "Feuille1"
    assert read_ods(spark, f"{DATA}/test.ods", "Feuille1").count() == 26
    assert spreadsheet_field_types(
        spark, f"{DATA}/test.ods", "Feuille7", kind="ods") == WANT_TYPES
    df = read_ods(spark, f"{DATA}/test.ods", "Feuille7")
    r = df.orderBy("fid").collect()[0]
    cols = df.columns
    assert r[cols[1]] == "val" and r[cols[2]] == 23
    assert r[cols[5]] == "2012/01/22"


def test_inline_str(spark):
    df = read_xlsx(spark, f"{DATA}/inlineStr.xlsx")
    assert df.count() >= 1
    first = df.orderBy("fid").collect()[0]
    assert "Bl_num" in list(first)
