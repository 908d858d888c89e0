"""RPF TOC reader vs the reference's autotest goldens
(autotest/gdrivers/rpftoc.py rpftoc_1..rpftoc_3)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import to_array
from gdal_spark.raster.rpftoc import (read_toc_entry, toc_subdatasets)

DATA = "/root/reference/autotest/gdrivers/data"
ENTRY = f"NITF_TOC_ENTRY:CADRG_ONC_1,000,000_2_0:{DATA}/A.TOC"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/A.TOC"),
    reason="reference autotest data not present")


def test_rpftoc_1(spark):
    df, meta, info = read_toc_entry(spark, ENTRY)
    assert py_checksum(to_array(df, meta)) == 53599
    want = (1.9999416000000001, 0.0017833876302083334, 0.0,
            36.000117500000002, 0.0, -0.0013461816406249993)
    assert max(abs(a - b) for a, b in zip(meta.gt, want)) < 1e-12
    assert meta.nodata == 216.0
    assert len(info["color_table"]) == 256


def test_rpftoc_2_rgba(spark):
    df, meta, info = read_toc_entry(spark, ENTRY, rgba=True)
    assert py_checksum(to_array(df, meta, band=0)) == 0


def test_rpftoc_3_subdatasets(spark):
    subs = toc_subdatasets(f"{DATA}/A.TOC")
    assert subs == [ENTRY]
    df, meta, info = read_toc_entry(spark, ENTRY)
    assert info["metadata"]["FILENAME_0"].endswith("RPFTOC01.ON2")
