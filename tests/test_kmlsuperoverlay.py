"""KML SuperOverlay writer/reader vs the reference's autotest
expectations (autotest/gdrivers/kmlsuperoverlay.py 1..3)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.formats import geotiff_meta, read_geotiff
from gdal_spark.raster.kmlsuperoverlay import (read_kmlsuperoverlay,
                                               superoverlay_layout,
                                               write_kmlsuperoverlay)
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/small_world.tif"),
    reason="reference autotest data not present")


def test_layout_rule():
    # small_world 400x200: single level; utm 512x512: 2 levels of 256
    assert superoverlay_layout(400, 200) == (0, 400, 200)
    assert superoverlay_layout(512, 512) == (1, 256, 256)


@pytest.mark.parametrize("suffix", ["kml", "kmz"])
def test_roundtrip_small_world(spark, tmp_path, suffix):
    # kmlsuperoverlay_1/2: CreateCopy keeps band 1 checksum 30111
    m = geotiff_meta(f"{DATA}/small_world.tif")
    tiles = read_geotiff(spark, f"{DATA}/small_world.tif")
    dst = str(tmp_path / f"out.{suffix}")
    write_kmlsuperoverlay(tiles, m, dst, bands=3, fmt="png")
    df, meta2 = read_kmlsuperoverlay(spark, dst)
    assert (meta2.width, meta2.height) == (400, 200)
    assert py_checksum(to_array(df, meta2, band=0)) == 30111
    # georeferencing survives
    for a, b in zip(meta2.gt, m.gt):
        assert abs(a - b) < 1e-9


def test_utm_file_layout(spark, tmp_path):
    # kmlsuperoverlay_3: two zoom levels, expected file list
    m = geotiff_meta(f"{DATA}/utm.tif")
    tiles = read_geotiff(spark, f"{DATA}/utm.tif")
    dst = str(tmp_path / "tmp.kml")
    write_kmlsuperoverlay(tiles, m, dst, bands=1, fmt="png")
    for rel in ["0/0/0.png", "0/0/0.kml", "1/0/0.png", "1/0/0.kml",
                "1/0/1.png", "1/0/1.kml", "1/1/0.png", "1/1/0.kml",
                "1/1/1.png", "1/1/1.kml", "tmp.kml"]:
        assert os.path.exists(str(tmp_path / rel)), rel
