"""Magellan BLX driver vs the reference's own autotest goldens
(autotest/gdrivers/blx.py blx_1..blx_5)."""

import os

import numpy as np
import pytest

from gdal_spark.raster.blx import (_compress, _decode_cell, _encode_cell,
                                   _uncompress, read_blx, write_blx)
from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference autotest data not present")

GT = (20.0004166, 0.0008333, 0.0, 50.0004166, 0.0, -0.0008333)


# blx_1 (little-endian) / blx_2 (big-endian): checksum 47024 + geotransform
@pytest.mark.parametrize("name", ["s4103.blx", "s4103.xlb"])
def test_read_golden(spark, name):
    df, meta = read_blx(spark, f"{DATA}/{name}")
    assert py_checksum(to_array(df, meta)) == 47024
    assert meta.gt == pytest.approx(GT, abs=1e-7)
    assert meta.nodata == -32768.0


# blx_5: wavelet-pyramid overview checksums
@pytest.mark.parametrize("level,cs", [(1, 42981), (2, 61363),
                                      (3, 48060), (4, 12058)])
def test_overviews(spark, level, cs):
    df, meta = read_blx(spark, f"{DATA}/s4103.blx", overview=level)
    assert meta.width == 512 >> level
    assert py_checksum(to_array(df, meta)) == cs


# blx_3 / blx_4: CreateCopy round trip, both endiannesses
@pytest.mark.parametrize("big", [False, True])
def test_createcopy(spark, tmp_path, big):
    df, meta = read_blx(spark, f"{DATA}/s4103.xlb")
    out = str(tmp_path / "copy.blx")
    write_blx(df, meta, out, big_endian=big)
    df2, meta2 = read_blx(spark, out)
    assert py_checksum(to_array(df2, meta2)) == 47024
    assert meta2.gt == pytest.approx(meta.gt, abs=1e-10)


def test_cell_codec_exact():
    rng = np.random.RandomState(7)
    cell = rng.randint(-500, 3000, (128, 128)).astype(np.int16)
    for big in (False, True):
        raw = _encode_cell(cell, big, 1)
        assert _uncompress(_compress(raw), len(raw)) == raw
        assert (_decode_cell(raw, big, 1) == cell).all()


def test_nodata_cells(spark, tmp_path):
    # a raster with one all-nodata cell writes a zero index entry and
    # reads back as nodata
    from gdal_spark.raster.model import RasterMeta, from_array
    arr = np.full((256, 128), 100, np.int16)
    arr[128:, :] = -32768
    meta = RasterMeta("nd", 128, 256, gt=(0, 1, 0, 0, 0, -1),
                      dtype="int16", nodata=-32768.0, block=128)
    out = str(tmp_path / "nd.blx")
    write_blx(from_array(spark, arr, meta), meta, out)
    df, m2 = read_blx(spark, out)
    back = to_array(df, m2)
    assert (back == arr).all()
