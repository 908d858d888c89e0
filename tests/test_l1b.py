"""NOAA AVHRR L1B reader vs the reference's autotest goldens
(autotest/gdrivers/l1b.py l1b_little_endian)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.l1b import L1B, read_l1b
from gdal_spark.raster.model import to_array

FIX = "/root/reference/autotest/gdrivers/data/hrpt_little_endian.l1b.zip"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIX), reason="reference autotest data not present")


def test_l1b_little_endian(spark):
    df, meta, l1b = read_l1b(spark, FIX, with_mask=True)
    assert "GRS80" in l1b.gcp_projection
    assert l1b.endian == "<"                      # 'ess' LE detection
    assert py_checksum(to_array(df, meta, band=0)) == 14145
    # per-dataset mask band
    assert l1b.expose_mask
    mask = to_array(df, meta, band=l1b.n_bands).astype("uint8")
    assert py_checksum(mask) == 25115


def test_l1b_header_fields():
    l1b = L1B(FIX)
    assert l1b.format == "NOAA15_NOHDR"
    assert l1b.product == "HRPT"
    assert l1b.spacecraft == "NOAA-19"
    assert (l1b.width, l1b.height, l1b.n_bands) == (2048, 2, 5)
    assert l1b.record_size == 22016               # NOHDR special case


def test_l1b_gcps():
    l1b = L1B(FIX)
    gcps = l1b.gcps()
    assert len(gcps) > 0
    for px, line, lon, lat in gcps:
        assert -180 <= lon <= 180 and -90 <= lat <= 90
        assert 0 <= px <= l1b.width and 0 <= line <= l1b.height
