"""Round-4 small-format drivers vs the reference's own autotest goldens
(autotest/gdrivers/{jdem,ctg,leveller,iris,til}.py)."""

import os

import pytest

from gdal_spark.raster import formats as F
from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import to_array

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data not present")


def test_jdem(spark):
    # jdem_1: fakejdem.mem cs 15
    t, m = F.read_jdem(spark, f"{D}/fakejdem.mem")
    assert py_checksum(to_array(t, m)) == 15


def test_ctg(spark):
    # ctg_1: fake_grid_cell band 1 cs 21, UTM 14N, 200 m cells
    t, m, zone = F.read_ctg(spark, f"{D}/fake_grid_cell")
    assert py_checksum(to_array(t, m)) == 21
    assert m.gt == (421000.0, 200.0, 0.0, 5094400.0, 0.0, -200.0)
    assert zone == 14
    # band 4 carries the large LULC code from the single data record
    assert int(to_array(t, m, band=3).max()) == 38029532


def test_leveller(spark):
    # leveller_1: ter6test.ter cs 33441 (v6 float32 heightfield)
    t, m = F.read_leveller(spark, f"{D}/ter6test.ter")
    assert py_checksum(to_array(t, m)) == 33441
    assert (m.width, m.height) == (64, 96)


def test_iris(spark):
    # iris_1: fakeiris.dat cs 65532 (dBZ transform (v-64)/2 on a 0 byte)
    t, m = F.read_iris(spark, f"{D}/fakeiris.dat")
    assert py_checksum(to_array(t, m)) == 65532


def test_til(spark):
    # til_1: testtil.til composes byte.tif at offset 0 -> cs 4672
    t, m = F.read_til(spark, f"{D}/testtil.til")
    assert py_checksum(to_array(t, m)) == 4672
    assert (m.width, m.height) == (20, 20)
