"""R workspace raster + ACE2 readers vs the reference's autotest goldens
(autotest/gdrivers/r.py r_1..r_4, ace2.py ace2_1)."""

import os
import struct

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.formats import (geotiff_meta, open_ace2, read_ace2,
                                       read_geotiff, read_r, write_r)
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/r_test.asc"),
    reason="reference autotest data not present")


def test_r_1_ascii(spark):
    # r_1: band 2 of the ASCII workspace, checksum 202
    df, meta, info = read_r(spark, f"{DATA}/r_test.asc")
    assert info["bands"] == 2
    assert py_checksum(to_array(df, meta, band=1)) == 202


def test_r_2_binary(spark):
    # r_2: band 1 of the XDR binary workspace, checksum 202
    df, meta, info = read_r(spark, f"{DATA}/r_test.rdb")
    assert py_checksum(to_array(df, meta, band=0)) == 202


@pytest.mark.parametrize("ascii_", [True, False])
def test_r_roundtrip_byte(spark, tmp_path, ascii_):
    # r_3/r_4: CreateCopy of byte.tif keeps checksum 4672
    m = geotiff_meta(f"{DATA}/byte.tif")
    tiles = read_geotiff(spark, f"{DATA}/byte.tif")
    dst = str(tmp_path / ("r.asc" if ascii_ else "r.rda"))
    write_r(tiles, m, dst, ascii_=ascii_)
    if not ascii_:   # binary default output is gzip-wrapped
        assert open(dst, "rb").read(3) == b"\x1f\x8b\x08"
    df, meta, info = read_r(spark, dst)
    assert (meta.width, meta.height) == (20, 20)
    assert py_checksum(to_array(df, meta).astype("uint8")) == 4672


def test_ace2(spark, tmp_path):
    # ace2_1: synthesized 45N015E_5M.ACE2, georef from filename
    p = str(tmp_path / "45N015E_5M.ACE2")
    with open(p, "wb") as f:
        f.seek(180 * 180 * 4 - 1)
        f.write(b"\0")
    info = open_ace2(p)
    want = (15.0, 0.08333333333333333, 0.0, 60.0, 0.0,
            -0.08333333333333333)
    assert max(abs(a - b) for a, b in zip(info["gt"], want)) < 1e-15
    df, meta = read_ace2(spark, p)
    assert (meta.width, meta.height) == (180, 180)
    assert py_checksum(to_array(df, meta)) == 0
