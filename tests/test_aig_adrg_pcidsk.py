"""Arc/Info Binary Grid, ADRG, and PCIDSK readers vs the reference's
autotest goldens (autotest/gdrivers/{aigrid,adrg,pcidsk}.py)."""

import os

import pytest

from gdal_spark.raster.adrg import open_adrg, read_adrg
from gdal_spark.raster.aig import open_aig, read_aig
from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import to_array

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data not present")


def test_aig_basic():
    # aigrid_1: abc3x1 band 1 cs 3
    g = open_aig(f"{D}/abc3x1")
    arr = g.read_band(0)
    assert py_checksum(arr) == 3
    assert arr.dtype.name == "uint8"
    # aigrid_2: geotransform + nodata + Byte typing
    assert g.geotransform() == (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)
    assert g.nodata() == 255.0


def test_aig_uppercase():
    # aigrid_4: all-uppercase coverage member names
    assert py_checksum(open_aig(f"{D}/ABC3X1UC").read_band(0)) == 3


def test_aig_colormap():
    # aigrid_3: .clr colormap entries
    ct = open_aig(f"{D}/abc3x1").color_table()
    assert ct.shape[0] == 256
    assert tuple(ct[0]) == (95, 113, 150, 255)
    assert tuple(ct[1]) == (95, 57, 29, 255)


@pytest.mark.parametrize("path", [
    f"{D}/SMALL_ADRG/ABCDEF01.GEN",       # adrg_read_gen
    f"{D}/SMALL_ADRG/TRANSH01.THF",       # adrg_read_transh
    f"ADRG:{D}/SMALL_ADRG/ABCDEF01.GEN,{D}/SMALL_ADRG/ABCDEF01.IMG",
])
def test_adrg_checksum(path):
    assert py_checksum(open_adrg(path).read_band(0)) == 62833


def test_pcidsk(spark):
    # pcidsk_1: utm.pix band 1 cs 39576
    from gdal_spark.raster import formats as F
    t, m = F.read_pcidsk(spark, f"{D}/utm.pix")
    assert py_checksum(to_array(t, m)) == 39576
    assert (m.width, m.height) == (500, 7)


def test_aig_spark(spark):
    t, m = read_aig(spark, f"{D}/abc3x1")
    assert py_checksum(to_array(t, m)) == 3


def test_adrg_spark(spark):
    t, m = read_adrg(spark, f"{D}/SMALL_ADRG/ABCDEF01.GEN")
    assert py_checksum(to_array(t, m)) == 62833
    assert (m.width, m.height) == (128, 128)
