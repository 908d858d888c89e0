"""Envisat reader tests. The reference autotest downloads real ASAR/
MERIS samples (network-gated), so a synthetic ASAR-style product
exercises the documented structure of EnvisatFile.c /
envisatdataset.cpp: 1247-byte MPH, SPH key/values with units suffixes,
DSD blocks, M-dataset band discovery, big-endian UWORD records with a
per-record prefix."""

import numpy as np
import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.envisat import MPH_SIZE, EnvisatFile, read_envisat
from gdal_spark.raster.model import to_array

W, H, PREFIX = 24, 20, 17
DSR = PREFIX + W * 2


def _header(lines, size):
    txt = "\n".join(lines) + "\n"
    assert len(txt) <= size, (len(txt), size)
    return (txt + " " * (size - len(txt) - 1) + "\n").encode("iso8859-1")


@pytest.fixture(scope="module")
def envisat_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("envisat")
    p = d / "ASA_IMP_1PTEST.N1"
    dsd_size = 280
    sph_size = 800 + 3 * dsd_size
    ds_offset = MPH_SIZE + sph_size

    mph = _header([
        'PRODUCT="ASA_IMP_1PTEST"',
        'PROC_STAGE=N',
        'SOFTWARE_VER="ASAR/4.05"',
        f'SPH_SIZE=+{sph_size:010d}<bytes>',
        'NUM_DSD=+0000000003',
        f'DSD_SIZE=+{dsd_size:010d}<bytes>',
    ], MPH_SIZE)

    def dsd(name, dtype, offset, size, num, dsr):
        return _header([
            f'DS_NAME="{name:<28s}"',
            f'DS_TYPE={dtype}',
            'FILENAME=""',
            f'DS_OFFSET=+{offset:020d}<bytes>',
            f'DS_SIZE=+{size:020d}<bytes>',
            f'NUM_DSR=+{num:010d}',
            f'DSR_SIZE=+{dsr:010d}<bytes>',
        ], dsd_size)

    sph_head = _header([
        'SPH_DESCRIPTOR="Image Mode Precision Image"',
        f'LINE_LENGTH=+{W:05d}<samples>',
        'DATA_TYPE="UWORD"',
        'SAMPLE_TYPE="DETECTED"',
    ], 800)
    mds1_off = ds_offset
    mds2_off = mds1_off + H * DSR
    ads_off = mds2_off + H * DSR
    sph = (sph_head
           + dsd("MDS1 SLC IMAGE", "M", mds1_off, H * DSR, H, DSR)
           + dsd("MDS2 SLC IMAGE", "M", mds2_off, H * DSR, H, DSR)
           + dsd("GEOLOCATION GRID ADS", "A", ads_off, 0, 0, 0))
    assert len(sph) == sph_size

    y, x = np.mgrid[0:H, 0:W]
    b1 = ((x * 11 + y * 5) % 4000 + 1).astype(">u2")
    b2 = ((x * 3 + y * 17) % 4000 + 1).astype(">u2")
    body = bytearray()
    for arr in (b1, b2):
        for r in range(H):
            body += b"\xee" * PREFIX + arr[r].tobytes()
    p.write_bytes(mph + sph + bytes(body))
    return str(p), b1.astype("u2"), b2.astype("u2")


def test_header_parse(envisat_file):
    p, _, _ = envisat_file
    env = EnvisatFile(p)
    assert env.mph["PRODUCT"] == "ASA_IMP_1PTEST"
    assert env.sph["DATA_TYPE"] == "UWORD"
    assert int(env.sph["LINE_LENGTH"]) == W
    assert [d["name"] for d in env.datasets] == [
        "MDS1 SLC IMAGE", "MDS2 SLC IMAGE", "GEOLOCATION GRID ADS"]
    assert len(env.measurement_datasets()) == 2
    width, height, dt, prefix, bands = env.layout()
    assert (width, height, dt, prefix) == (W, H, "uint16", PREFIX)
    assert len(bands) == 2


def test_read_bands(spark, envisat_file):
    p, b1, b2 = envisat_file
    tiles, meta, _ = read_envisat(spark, p, block=16)
    assert (meta.width, meta.height) == (W, H)
    for b, want in ((0, b1), (1, b2)):
        got = to_array(tiles, meta, band=b)
        assert np.array_equal(got, want)
        assert py_checksum(got) == py_checksum(want)


def test_not_envisat(tmp_path):
    p = tmp_path / "x.n1"
    p.write_bytes(b"x" * 2000)
    with pytest.raises(ValueError, match="Envisat"):
        EnvisatFile(str(p))
