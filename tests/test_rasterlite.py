"""Rasterlite reader vs the reference's autotest goldens
(autotest/gdrivers/rasterlite.py rasterlite_2..rasterlite_5)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.rasterlite import (open_rasterlite, read_rasterlite,
                                          rasterlite_to_array)

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/rasterlite.sqlite"),
    reason="reference autotest data not present")


# rasterlite_2: base read, JPEG tiles, global geotransform
@pytest.mark.parametrize("band,cs", [(0, 11746), (1, 19843), (2, 48911)])
def test_base_read(spark, band, cs):
    assert py_checksum(rasterlite_to_array(
        spark, f"{DATA}/rasterlite.sqlite", band=band)) == cs


def test_geotransform(spark):
    df, meta = read_rasterlite(spark, f"{DATA}/rasterlite.sqlite")
    assert (meta.width, meta.height) == (338, 169)
    g = meta.gt
    assert g[0] == -180.0 and g[3] == 90.0
    assert abs(g[1] - 360.0 / 338) < 1e-12
    assert abs(g[5] + 180.0 / 169) < 1e-12


# rasterlite_3: pyramid level 1 (169x85 with the reference's +0.5-trunc
# spill row replicating the last tile row)
@pytest.mark.parametrize("band,cs", [(0, 59551), (1, 59603), (2, 42173)])
def test_overview(spark, band, cs):
    assert py_checksum(rasterlite_to_array(
        spark, f"{DATA}/rasterlite_pyramids.sqlite", band=band,
        level=1)) == cs


def test_levels():
    rl = open_rasterlite(f"{DATA}/rasterlite_pyramids.sqlite")
    assert len(rl.levels) == 2


# rasterlite_4: color table + user-defined extent window
def test_pct_extent(spark):
    arr = rasterlite_to_array(spark, f"{DATA}/rasterlite_pct.sqlite",
                              extent=(0, 0, 180, 90))
    assert arr.shape == (85, 169)
    assert py_checksum(arr) == 36473
    assert open_rasterlite(
        f"{DATA}/rasterlite_pct.sqlite").color_table() is not None


# rasterlite_5: palette expansion to RGB
@pytest.mark.parametrize("band,cs", [(0, 506), (1, 3842), (2, 59282)])
def test_pct_expand(spark, band, cs):
    assert py_checksum(rasterlite_to_array(
        spark, f"{DATA}/rasterlite_pct.sqlite", band=band,
        bands=3)) == cs
