"""DOQ2 reader vs the reference's autotest goldens
(autotest/gdrivers/doq2.py doq2_1)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.formats import open_doq2, read_doq2
from gdal_spark.raster.model import to_array

FIX = "/root/reference/autotest/gdrivers/data/C3607614_truncated.NWS"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIX), reason="reference autotest data not present")


def test_doq2_1(spark):
    df, meta, info = read_doq2(spark, FIX, window=(0, 0, 500, 1))
    assert py_checksum(to_array(df, meta, band=0)) == 4201
    assert py_checksum(to_array(df, meta, band=1)) == 4010
    assert py_checksum(to_array(df, meta, band=2)) == 5820
    assert meta.gt == (377054.0, 1.0, 0.0, 4082205.0, 0.0, -1.0)
    assert info["metadata"]["QUADRANGLE_NAME"].startswith("NORFOLK")
