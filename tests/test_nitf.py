"""NITF reader vs the reference's own autotest goldens
(autotest/gdrivers/nitf.py)."""

import os

import numpy as np
import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.nitf import open_nitf, read_nitf

D = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data not present")


@pytest.mark.parametrize("name,band,cs", [
    ("rgb.ntf", 2, 21349),          # nitf_6 (band 3)
    ("i_3034c.ntf", 0, 170),        # nitf_11: 1-bit NC
    ("i_3034f.ntf", 0, 170),        # nitf_17: 1-bit NM + LUT
    ("fake_nsif.ntf", 0, 12033),    # nitf_8: NSIF01.00
    ("U_1050A.NTF", 0, 65024),      # nitf_19: NITF 2.0, IC=C1 2DH fax
])
def test_checksums(name, band, cs):
    img = open_nitf(f"{D}/{name}").image(0)
    assert py_checksum(img.read_band(band)) == cs


def test_rgb_geotransform():
    # nitf_6 check_gt
    gt = open_nitf(f"{D}/rgb.ntf").image(0).geotransform()
    exp = (-44.842029478458, 0.003503401360, 0,
           -22.930748299319, 0, -0.003503401360)
    assert all(abs(a - b) < 1e-9 for a, b in zip(gt, exp))


def test_nsif_metadata_blocka():
    # nitf_8
    nf = open_nitf(f"{D}/fake_nsif.ntf")
    img = nf.image(0)
    md = {**nf.metadata, **img.metadata}
    assert md["NITF_FHDR"] == "NSIF01.00"
    assert md["NITF_BLOCKA_BLOCK_INSTANCE_01"] == "01"
    assert md["NITF_BLOCKA_BLOCK_COUNT"] == "01"
    assert md["NITF_BLOCKA_N_GRAY_01"] == "00000"
    assert md["NITF_BLOCKA_L_LINES_01"] == "01000"
    assert md["NITF_BLOCKA_LAYOVER_ANGLE_01"] == "000"
    assert md["NITF_BLOCKA_SHADOW_ANGLE_01"] == "000"
    assert md["NITF_BLOCKA_FRLC_LOC_01"] == "+41.319331+020.078400"
    assert md["NITF_BLOCKA_LRLC_LOC_01"] == "+41.317083+020.126072"
    assert md["NITF_BLOCKA_LRFC_LOC_01"] == "+41.281634+020.122570"
    assert md["NITF_BLOCKA_FRFC_LOC_01"] == "+41.283881+020.074924"


def test_header_only_file():
    # nitf_20: U_0006A.NTF has no image segment
    with pytest.raises(ValueError):
        open_nitf(f"{D}/U_0006A.NTF")


def test_two_images_jpeg_subdatasets():
    # nitf_45 file: two IM segments, second IC=C3.  The full-res C3
    # decode is pinned transitively: its nearest-2 overview checksum
    # must equal the 1086 the reference asserts for that overview.
    nf = open_nitf(f"{D}/two_images_jpeg.ntf")
    assert len(nf.images) == 2
    assert py_checksum(nf.image(0).read_band(0)) == 0
    arr = nf.image(1).read_band(0)
    assert py_checksum(arr[::2, ::2]) == 1086


def test_lut_color_table():
    ct = open_nitf(f"{D}/i_3034f.ntf").image(0).color_table(0)
    assert ct is not None and ct.shape == (256, 4)


def test_read_nitf_spark(spark):
    from gdal_spark.raster.model import to_array
    tiles, meta = read_nitf(spark, f"{D}/rgb.ntf")
    assert meta.width == 50 and meta.height == 50
    band3 = to_array(tiles, meta, band=2)
    assert py_checksum(band3) == 21349
