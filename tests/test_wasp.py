"""WAsP .map writer/reader, mirroring the reference autotest
(autotest/ogr/ogr_wasp.py ogr_wasp_elevation_from_linestring_z +
ogr_wasp_roughness_from_linestring_fields + ogr_wasp_reading)."""

import json
import struct

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.formats import FEATURE_SCHEMA
from gdal_spark.sources.wasp import read_wasp, write_wasp


def _z_lines(spark):
    # 10 LineString25D features: (i,0,i)-(i,0.5,i)-(i,1,i)
    rows = []
    for i in range(10):
        pts = [(float(i), 0.0, float(i)), (float(i), 0.5, float(i)),
               (float(i), 1.0, float(i))]
        wkb = struct.pack("<BI", 1, 0x80000002) + struct.pack("<I", 3)
        for p in pts:
            wkb += struct.pack("<3d", *p)
        rows.append(("m", i, "{}", bytearray(wkb)))
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def test_elevation_from_z(spark, tmp_path):
    p = str(tmp_path / "tmp.map")
    n = write_wasp(_z_lines(spark), p)
    assert n == 10
    with open(p) as f:
        lines = f.read().splitlines()
    # 4 header lines, then alternating "<h> <n>" / coordinate lines
    body = lines[4:]
    j = 0
    for i, line in enumerate(body):
        if not i % 2:
            h, cnt = line.split()
            assert int(cnt) == 3
            assert float(h) == j
            j += 1
    assert j == 10


def test_reading_back(spark, tmp_path):
    # ogr_wasp_reading: re-open the written file, 10 features
    p = str(tmp_path / "tmp.map")
    write_wasp(_z_lines(spark), p)
    rows = read_wasp(spark, p).orderBy("fid").collect()
    assert len(rows) == 10
    assert json.loads(rows[3]["properties"])["z"] == 3.0
    wkt = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert wkt == "LINESTRING (0 0,0 0.5,0 1)"


def test_roughness_fields(spark, tmp_path):
    rows = []
    for i in range(5):
        wkb = struct.pack("<BI", 1, 2) + struct.pack("<I", 2)
        wkb += struct.pack("<2d", float(i), 0.0)
        wkb += struct.pack("<2d", float(i), 1.0)
        rows.append(("m", i,
                     json.dumps({"L": float(i), "R": float(i + 1)}),
                     bytearray(wkb)))
    df = spark.createDataFrame(rows, FEATURE_SCHEMA)
    p = str(tmp_path / "rough.map")
    write_wasp(df, p, left_field="L", right_field="R")
    got = read_wasp(spark, p).orderBy("fid").collect()
    assert len(got) == 5
    pr = json.loads(got[2]["properties"])
    assert pr["left"] == 2.0 and pr["right"] == 3.0
