"""PCRaster CSF + DIMAP readers vs the reference's autotest goldens
(autotest/gdrivers/pcraster.py pcraster_1/2, dimap.py dimap_1)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.formats import open_dimap, read_dimap, read_pcraster
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/ldd.map"),
    reason="reference autotest data not present")


def test_pcraster_read(spark):
    df, meta = read_pcraster(spark, f"{DATA}/ldd.map")
    assert py_checksum(to_array(df, meta)) == 4528         # pcraster_1
    assert meta.gt == (182140.0, 10.0, 0.0, 327880.0, 0.0, -10.0)
    assert meta.dtype == "uint8" and meta.nodata == 255.0  # VS_LDD


def test_dimap_read(spark):
    tiles, meta, info = read_dimap(spark, f"{DATA}/METADATA.DIM")
    assert (meta.width, meta.height) == (6000, 6000)
    arr = to_array(tiles, meta)
    assert py_checksum(arr[:100, :100]) == 21586
    assert info["metadata"]["PROCESSING_LEVEL"] == "1A"
    assert info["metadata"]["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
    gcps = info["gcps"]
    assert len(gcps) == 4
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    assert abs(gcps[0]["x"] - 4.3641728) < 2e-7
    assert abs(gcps[0]["y"] - 44.2082255) < 2e-7
    assert info["gcp_srs"].startswith("GEOGCS") and \
        "WGS" in info["gcp_srs"] and "84" in info["gcp_srs"]


def test_dimap_identify():
    with pytest.raises(Exception):
        open_dimap(f"{DATA}/ldd.map")
