"""Intergraph Raster (INGR) reader vs the reference's autotest goldens
(autotest/gdrivers/ingr.py ingr_1..ingr_13 + the tiled bitonal case)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.ingr import open_ingr, read_ingr
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/frmt02.cot"),
    reason="reference autotest data not present")

# (file, 0-based output band, checksum) — from gdaltest.GDALTest calls
CASES = [
    ("8bit_rgb.cot", 1, 4855),      # ingr_1 (band 2 = green)
    ("uint32.cot", 0, 4672),        # ingr_2 (format 4)
    ("8bit_pal.cot", 0, 4855),      # ingr_3 (IGDS palette)
    ("frmt02.cot", 0, 26968),       # ingr_4 (byte)
    ("frmt30.cot", 0, 29718),       # ingr_7 (JPEG gray)
    ("frmt09.cot", 0, 23035),       # ingr_8 (bitonal word RLE)
    ("frmt10.cot", 0, 47031),       # ingr_9 (paletted word RLE)
    ("frmt24.cit", 0, 23035),       # ingr_10 (CCITT G4)
    ("frmt27.cot", 1, 45616),       # ingr_11 (adaptive RGB)
    ("frmt28.cot", 1, 45616),       # ingr_12 (uncompressed 24bit)
    ("frmt29.cot", 0, 26968),       # ingr_13 (adaptive gray)
    ("frmt09t.cot", 0, 3178),       # tiled bitonal (ingr CreateCopy ref)
]


@pytest.mark.parametrize("name,band,cs", CASES)
def test_golden(spark, name, band, cs):
    df, meta = read_ingr(spark, f"{DATA}/{name}")
    assert py_checksum(to_array(df, meta, band=band)) == cs


def test_palette():
    f = open_ingr(f"{DATA}/8bit_pal.cot")
    assert f.bands[0].palette is not None
    assert f.bands[0].palette.shape[1] == 3


def test_rgb_band_count():
    assert open_ingr(f"{DATA}/8bit_rgb.cot").n_output_bands() == 3
    assert open_ingr(f"{DATA}/frmt02.cot").n_output_bands() == 1


def test_identify():
    with pytest.raises(ValueError):
        open_ingr(f"{DATA}/ldd.map")
