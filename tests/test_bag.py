"""BAG reader vs the reference's autotest goldens
(autotest/gdrivers/bag.py bag_2/bag_3)."""

import os

import pytest

from gdal_spark.raster.bag import open_bag, read_bag
from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/true_n_nominal.bag"),
    reason="reference autotest data not present")


def test_bag_2(spark):
    df, meta, info = read_bag(spark, f"{DATA}/true_n_nominal.bag")
    assert info["bands"] == ["elevation", "uncertainty",
                             "nominal_elevation"]
    assert py_checksum(to_array(df, meta, band=0)) == 1072
    assert py_checksum(to_array(df, meta, band=1)) == 150
    assert py_checksum(to_array(df, meta, band=2)) == 1315
    lo, hi = info["minmax"]["elevation"]
    assert abs(lo - 10) < 0.01 and abs(hi - 19.8) < 0.01
    assert abs(meta.nodata - 1000000.0) < 0.1


def test_bag_3(spark):
    df, meta, info = read_bag(spark,
                              f"{DATA}/southern_hemi_false_northing.bag")
    assert len(info["bands"]) == 2
    assert py_checksum(to_array(df, meta, band=0)) == 21402
    assert py_checksum(to_array(df, meta, band=1)) == 33216
    assert "Southern Hemisphere" in info["wkt"]
    assert 'PARAMETER["false_northing",10000000]' in info["wkt"]
