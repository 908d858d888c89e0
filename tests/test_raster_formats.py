"""GeoTIFF / AAIGrid codecs (gdal/frmts/gtiff + aaigrid driver parity on
the uncompressed interchange core)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.raster import formats as RF
from gdal_spark.raster import model as M
from gdal_spark.raster.checksum import checksum


def _meta(rid, w, h, dtype="uint8", block=8, nodata=None):
    return M.RasterMeta(rid, w, h, gt=(100.0, 2.0, 0.0, 400.0, 0.0, -2.0),
                        dtype=dtype, block=block, nodata=nodata)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "int32",
                                   "float32", "float64"])
def test_geotiff_bytes_roundtrip(dtype):
    rng = np.arange(20 * 19).reshape(20, 19) % 120
    arr = rng.astype(dtype)
    meta = _meta("t1", 19, 20, dtype=dtype, nodata=7.0)
    data = RF.geotiff_bytes([arr], meta)
    bands, back = RF.parse_geotiff(data, "t1", block=8)
    assert len(bands) == 1
    np.testing.assert_array_equal(bands[0], arr)
    assert back.gt == meta.gt
    assert back.dtype == dtype and back.nodata == 7.0
    assert (back.width, back.height) == (19, 20)


def test_geotiff_multiband():
    a = (np.arange(64).reshape(8, 8) % 50).astype(np.uint8)
    meta = _meta("mb", 8, 8, block=8)
    data = RF.geotiff_bytes([a, a * 2], meta)
    bands, _ = RF.parse_geotiff(data, "mb", block=8)
    assert len(bands) == 2
    np.testing.assert_array_equal(bands[1], a * 2)


def test_geotiff_strip_reader():
    """Hand-build a strip-organized file (RowsPerStrip=4) — the other
    layout the reference emits — and parse it."""
    import struct

    arr = (np.arange(12 * 10).reshape(12, 10) % 97).astype(np.uint8)
    strips = [arr[i:i + 4].tobytes() for i in range(0, 12, 4)]
    entries = [
        (256, RF._LONG, struct.pack("<I", 10), 1),
        (257, RF._LONG, struct.pack("<I", 12), 1),
        (258, RF._SHORT, struct.pack("<H", 8), 1),
        (259, RF._SHORT, struct.pack("<H", 1), 1),
        (262, RF._SHORT, struct.pack("<H", 1), 1),
        (277, RF._SHORT, struct.pack("<H", 1), 1),
        (278, RF._LONG, struct.pack("<I", 4), 1),
        (279, RF._LONG, struct.pack("<3I", *[len(s) for s in strips]), 3),
    ]
    n = len(entries) + 1
    ifd_size = 2 + 12 * n + 4
    _probe, ext = RF._entries_bytes(
        entries + [(273, RF._LONG, struct.pack("<3I", 0, 0, 0), 3)],
        8 + ifd_size)
    data_start = 8 + ifd_size + len(ext)
    offs = []
    pos = data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    entries.append((273, RF._LONG, struct.pack("<3I", *offs), 3))
    ifd, ext = RF._entries_bytes(entries, 8 + ifd_size)
    data = (struct.pack("<2sHI", b"II", 42, 8) + struct.pack("<H", n)
            + ifd + struct.pack("<I", 0) + ext + b"".join(strips))
    bands, meta = RF.parse_geotiff(data, "s")
    np.testing.assert_array_equal(bands[0], arr)


def test_geotiff_compressed_rejected():
    arr = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(RF.geotiff_bytes([arr], _meta("c", 4, 4, block=4)))
    # flip the Compression tag value to 5 (LZW)
    import struct
    tags, _ = RF._read_ifd(bytes(data))
    (count,) = struct.unpack_from("<H", data, 8)
    for i in range(count):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", data, off)[0]
        if tag == 259:
            struct.pack_into("<H", data, off + 8, 5)
    with pytest.raises(ValueError, match="compressed"):
        RF.parse_geotiff(bytes(data), "c")


def test_geotiff_spark_roundtrip(spark, tmp_path):
    arr = ((np.arange(40)[:, None] * 7 + np.arange(36)[None, :] * 13)
           % 50 + 1).astype(np.uint8)
    meta = _meta("gt40", 36, 40, block=16, nodata=0.0)
    tiles = M.from_array(spark, arr, meta)
    p = str(tmp_path / "gt40.tif")
    n = RF.write_geotiff(tiles, meta, p)
    assert n == meta.n_block_x * meta.n_block_y
    hm = RF.geotiff_meta(p, block=16)
    assert (hm.width, hm.height, hm.dtype, hm.gt) == (36, 40, "uint8",
                                                      meta.gt)
    back = RF.read_geotiff(spark, p, block=16)
    got = M.to_array(back, hm)
    np.testing.assert_array_equal(got, arr)
    # cross-check through the engine's bit-exact checksum op
    c1 = checksum(back, hm).collect()[0]["checksum"]
    c2 = checksum(tiles, meta).collect()[0]["checksum"]
    assert c1 == c2


def test_aaigrid_roundtrip(spark, tmp_path):
    arr = ((np.arange(30)[:, None] + np.arange(50)[None, :] * 3)
           % 17).astype(np.float64)
    meta = M.RasterMeta("aai", 50, 30, gt=(10.0, 0.5, 0.0, 95.0, 0.0, -0.5),
                        dtype="float64", block=16, nodata=-9999.0)
    p = str(tmp_path / "g.asc")
    RF.write_aaigrid(arr, meta, p)
    tiles, back = RF.read_aaigrid(spark, p, "aai", dtype="float64", block=16)
    assert (back.width, back.height) == (50, 30)
    assert back.gt == pytest.approx(meta.gt)
    assert back.nodata == -9999.0
    np.testing.assert_array_equal(M.to_array(tiles, back), arr)
