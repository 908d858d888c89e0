"""Erdas Imagine HFA (.img) reader vs the reference's own autotest
goldens (autotest/gcore/hfa_read.py checksum table, autotest/gdrivers/
hfa.py stats/histogram/color-table/spill cases)."""

import os

import numpy as np
import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.hfa import open_hfa, read_hfa

GCORE = "/root/reference/autotest/gcore/data"
GDRV = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GCORE), reason="reference autotest data not present")


# autotest/gcore/hfa_read.py:43-51
@pytest.mark.parametrize("name,cs", [
    ("byte.img", 4672), ("int16.img", 4672), ("uint16.img", 4672),
    ("int32.img", 4672), ("uint32.img", 4672), ("float32.img", 4672),
    ("float64.img", 4672), ("utmsmall.img", 50054),
    ("2bit_compressed.img", 11918),
])
def test_gcore_checksums(name, cs):
    arr = open_hfa(f"{GCORE}/{name}").read_band(0)
    assert py_checksum(arr) == cs


# autotest/gdrivers/hfa.py hfa_int_read / hfa_float_read
@pytest.mark.parametrize("name,cs", [
    ("int.img", 6691), ("float.img", 23529),
])
def test_gdrivers_checksums(name, cs):
    arr = open_hfa(f"{GDRV}/{name}").read_band(0)
    assert py_checksum(arr) == cs


def test_spill_file():
    # autotest/gdrivers/hfa.py hfa_rde_overviews: spill.img + .ige
    h = open_hfa(f"{GDRV}/spill.img")
    assert py_checksum(h.read_band(0)) == 1631


def test_histread_metadata():
    # autotest/gdrivers/hfa.py hfa_histread (utmsmall.img)
    md = open_hfa(f"{GCORE}/utmsmall.img").statistics(0)
    assert md["STATISTICS_MINIMUM"] == "8"
    assert md["STATISTICS_MEDIAN"] == "148"
    assert md["STATISTICS_HISTOMAX"] == "255"
    assert md["STATISTICS_SKIPFACTORX"] == "1"
    assert md["STATISTICS_SKIPFACTORY"] == "1"
    assert md["STATISTICS_EXCLUDEDVALUES"] == "0"
    assert md["STATISTICS_HISTOBINVALUES"].startswith(
        "0|0|0|0|0|0|0|0|8|0|0|0|0|0|0|0|23|")
    assert md["STATISTICS_HISTOBINVALUES"].endswith("|105|0|0|0|0|0|0|0|824|")


def test_int_float_stats():
    # autotest/gdrivers/hfa.py hfa_int_stats_1 / hfa_float_stats_1
    md = open_hfa(f"{GDRV}/int.img").statistics(0)
    assert md["STATISTICS_MINIMUM"] == "40918"
    assert md["STATISTICS_MAXIMUM"] == "41134"
    assert md["STATISTICS_MEDIAN"] == "41017"
    assert md["STATISTICS_MODE"] == "41013"
    assert md["STATISTICS_HISTOMIN"] == "40918"
    assert md["STATISTICS_HISTOMAX"] == "41134"

    md = open_hfa(f"{GDRV}/float.img").statistics(0)
    assert abs(float(md["STATISTICS_MINIMUM"]) - 40.91858291626) < 1e-10
    assert abs(float(md["STATISTICS_MAXIMUM"]) - 41.134323120117) < 1e-10
    assert abs(float(md["STATISTICS_MEDIAN"]) - 41.017182931304) < 1e-10


def test_excluded_values():
    # autotest/gdrivers/hfa.py hfa_excluded_values (dem10.img)
    md = open_hfa(f"{GDRV}/dem10.img").statistics(0)
    assert md["STATISTICS_EXCLUDEDVALUES"] == "0,8,9"


def test_layer_type():
    assert open_hfa(f"{GDRV}/int.img").layer_type(0) == "athematic"


def test_unique_values_color_table():
    # autotest/gdrivers/hfa.py hfa_unique_values_color_table
    ct = open_hfa(f"{GDRV}/i8u_c_i.img").color_table(0)
    assert ct.shape[0] == 256
    assert tuple(ct[253]) == (0, 0, 0, 0)
    assert tuple(ct[254]) == (255, 255, 170, 255)
    assert tuple(ct[255]) == (255, 255, 255, 255)


def test_geotransform():
    gt = open_hfa(f"{GCORE}/utmsmall.img").geotransform()
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_read_hfa_spark(spark):
    from gdal_spark.raster.model import to_array
    tiles, meta = read_hfa(spark, f"{GCORE}/utmsmall.img")
    arr = to_array(tiles, meta)
    assert py_checksum(arr) == 50054
    assert meta.gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
