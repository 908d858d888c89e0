"""SXF reader vs the reference's autotest (autotest/ogr/ogr_sxf.py
only checks the dataset opens + walks; we additionally assert the
record walk is complete and self-consistent with the passport)."""

import os
import re

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.sxf import open_sxf, read_sxf

PATH = "/root/reference/autotest/ogr/data/100_test.sxf"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATH), reason="reference autotest data not present")


def test_passport():
    f = open_sxf(PATH)
    assert f.version == 4
    assert f.scale == 100000
    assert f.nrecords == 78
    xs = f.proj_corners[1::2]
    ys = f.proj_corners[0::2]
    assert min(xs) > 1e7 and max(ys) < 6.3e6


def test_records_complete(spark):
    df = read_sxf(spark, PATH)
    rows = df.collect()
    assert len(rows) == 78
    assert all(r["geometry"] is not None for r in rows)
    f = open_sxf(PATH)
    minx = min(f.proj_corners[1::2]) - 1
    maxx = max(f.proj_corners[1::2]) + 1
    miny = min(f.proj_corners[0::2]) - 1
    maxy = max(f.proj_corners[0::2]) + 1
    for r in rows:
        w = wkt_from_wkb(bytes(r["geometry"]))
        pts = [tuple(map(float, p.split()))
               for p in re.findall(r"(-?[\d.]+ -?[\d.]+)", w)]
        for x, y in pts:
            assert minx <= x <= maxx and miny <= y <= maxy


def test_kinds(spark):
    kinds = {r["kind"] for r in read_sxf(spark, PATH).collect()}
    assert "POLYGON" in kinds and "LINE" in kinds and "POINT" in kinds
