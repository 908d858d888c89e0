"""VFK (Czech cadastre) reader vs the reference's autotest
expectations (autotest/ogr/ogr_vfk.py ogr_vfk_1..ogr_vfk_5)."""

import math
import os
import re

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.vfk import read_vfk, vfk_layers

PATH = "/root/reference/autotest/ogr/data/bylany.vfk"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATH), reason="reference autotest data not present")


def _pts(wkt):
    return [tuple(map(float, p.split()))
            for p in re.findall(r"(-?[\d.]+ -?[\d.]+)", wkt)]


def test_vfk_1_layers(spark):
    layers = vfk_layers(PATH)
    assert len(layers) == 61
    assert layers[0] == "PAR"
    par = read_vfk(spark, PATH, "PAR")
    assert len(par.columns) - 2 == 28      # minus fid + geometry
    assert par.count() == 1


def test_vfk_2_par_envelope(spark):
    rows = read_vfk(spark, PATH, "PAR").collect()
    w = wkt_from_wkb(bytes(rows[0]["geometry"]))
    assert w.startswith("POLYGON")
    pts = _pts(w)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    assert abs(area - 2010.5) < 0.5


def test_vfk_3_sobr_filter(spark):
    assert vfk_layers(PATH)[43] == "SOBR"
    sobr = read_vfk(spark, PATH, "SOBR")
    assert sobr.filter("CISLO_BODU = 55").count() == 1


def test_vfk_4_sbp_length(spark):
    sbp = read_vfk(spark, PATH, "SBP")
    r = sbp.filter("fid = 5").collect()[0]
    pts = _pts(wkt_from_wkb(bytes(r["geometry"])))
    length = sum(math.dist(pts[i], pts[i + 1])
                 for i in range(len(pts) - 1))
    assert int(length) == 10


def test_vfk_5_hp_lines(spark):
    hp = read_vfk(spark, PATH, "HP")
    rows = hp.collect()
    assert all(r["geometry"] is not None for r in rows)
    assert all(wkt_from_wkb(bytes(r["geometry"])).startswith("LINESTRING")
               for r in rows)
