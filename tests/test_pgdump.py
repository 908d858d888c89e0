"""PGDump writer vs the reference's autotest expected SQL
(autotest/ogr/ogr_pgdump.py ogr_pgdump_1/ogr_pgdump_2)."""

import os

import pytest

from gdal_spark.sources.formats import read_shapefile
from gdal_spark.sources.pgdump import write_pgdump

DATA = "/root/reference/autotest/ogr/data"
FIELDS = [("AREA", "FLOAT8"), ("EAS_ID", "INTEGER"),
          ("PRFEDEA", "VARCHAR"), ("SHORTNAME", "VARCHAR(8)")]

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/poly.shp"),
    reason="reference autotest data not present")


def test_pgdump_1_insert(spark, tmp_path):
    df = read_shapefile(spark, f"{DATA}/poly.shp")
    p = str(tmp_path / "tpoly.sql")
    n = write_pgdump(df, p, "tpoly", fields=FIELDS, dim=3)
    assert n == 10
    sql = open(p).read()
    for want in [
        'DROP TABLE IF EXISTS "public"."tpoly" CASCADE;',
        "DELETE FROM geometry_columns WHERE f_table_name = 'tpoly' "
        "AND f_table_schema = 'public';",
        "BEGIN;",
        'CREATE TABLE "public"."tpoly" ( OGC_FID SERIAL, CONSTRAINT '
        '"tpoly_pk" PRIMARY KEY (OGC_FID) );',
        "SELECT AddGeometryColumn('public','tpoly','wkb_geometry',-1,"
        "'GEOMETRY',3);",
        'CREATE INDEX "tpoly_wkb_geometry_geom_idx" ON '
        '"public"."tpoly" USING GIST ("wkb_geometry");',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "area" FLOAT8;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "eas_id" INTEGER;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "prfedea" VARCHAR;',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "shortname" '
        'VARCHAR(8);',
        'INSERT INTO "public"."tpoly" ("wkb_geometry" , "area", '
        '"eas_id", "prfedea") VALUES ('
        "'01030000800100000005000000000000C01A481D4100000080072D5241"
        "000000000000000000000060AA461D4100000080FF2C5241000000000000"
        "00000000006060461D41000000400C2D52410000000000000000000000A0"
        "DF471D4100000000142D52410000000000000000000000C01A481D410000"
        "0080072D52410000000000000000', 5268.813, 170, '35043413');",
        "COMMIT;",
    ]:
        assert want in sql, want


def test_pgdump_2_copy(spark, tmp_path):
    df = read_shapefile(spark, f"{DATA}/poly.shp")
    p = str(tmp_path / "tpoly2.sql")
    write_pgdump(df, p, "tpoly", fields=FIELDS, schema="another_schema",
                 srid=4326, geom_name="the_geom", geom_type="POLYGON",
                 dim=2, use_copy=True, crlf=True)
    sql = open(p, newline="").read()
    for want in [
        'DROP TABLE IF EXISTS "another_schema"."tpoly" CASCADE;',
        "SELECT AddGeometryColumn('another_schema','tpoly','the_geom',"
        "4326,'POLYGON',2);",
        'CREATE INDEX "tpoly_the_geom_geom_idx" ON '
        '"another_schema"."tpoly" USING GIST ("the_geom");',
        'COPY "another_schema"."tpoly" ("the_geom", "area", "eas_id", '
        '"prfedea", "shortname") FROM STDIN;',
        "0103000020E61000000100000005000000000000C01A481D410000008007"
        "2D524100000060AA461D4100000080FF2C52410000006060461D41000000"
        "400C2D5241000000A0DF471D4100000000142D5241000000C01A481D4100"
        "000080072D5241\t5268.813\t170\t35043413\t\\N",
        "\\.",
        "COMMIT;",
    ]:
        assert want in sql, want
    assert "\r\n" in sql
