"""MBTiles reader vs the reference's autotest goldens
(autotest/gdrivers/mbtiles.py mbtiles_2, world_l1.mbtiles)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.mbtiles import open_mbtiles, read_mbtiles

PATH = "/root/reference/autotest/gdrivers/data/world_l1.mbtiles"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATH), reason="reference autotest data not present")


def test_band_checksums():
    mb = open_mbtiles(PATH)
    assert mb.n_bands == 3
    for b, exp in enumerate([6324, 19386, 45258]):
        assert py_checksum(mb.read_band(b)) == exp


def test_overview_checksums():
    mb = open_mbtiles(PATH)
    assert mb.zooms == [0, 1]
    for b, exp in enumerate([16642, 15772, 10029]):
        assert py_checksum(mb.read_band(b, zoom=0)) == exp


def test_geotransform_and_metadata():
    mb = open_mbtiles(PATH)
    gt = mb.geotransform()
    exp = (-20037508.34, 78271.516953124999, 0.0,
           20037508.34, 0.0, -78271.516953124999)
    assert all(abs(a - b) < 1e-15 for a, b in zip(gt, exp))
    assert mb.metadata["bounds"] == "-180.0,-85,180,85"


def test_read_mbtiles_spark(spark):
    from gdal_spark.raster.model import to_array
    tiles, meta = read_mbtiles(spark, PATH)
    assert (meta.width, meta.height) == (512, 512)
    assert py_checksum(to_array(tiles, meta, band=0)) == 6324
