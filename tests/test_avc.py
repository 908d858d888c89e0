"""Arc/Info coverage readers (E00 + binary AVC) vs the reference's
autotest expectations (autotest/ogr/ogr_avc.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.geometry import decode_linestring
from gdal_spark.sources.avc import open_avc, read_avc

D = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{D}/test.e00"),
    reason="reference autotest data not present")

FIRST_ARC = [(340099.875, 4100200.0), (340400.0625, 4100399.5),
             (340900.125, 4100200.0), (340700.03125, 4100199.5)]


@pytest.mark.parametrize("path", [f"{D}/test.e00", f"{D}/testavc"])
def test_arc_layer(path):
    # ogr_avc_1 / ogr_avc_2: same content through both containers
    layers = open_avc(path)
    arcs = layers["ARC"]
    assert [a[0]["UserID"] for a in arcs] == [1, 2, 3, 4, 5, 6, 7]
    pts = decode_linestring(arcs[0][1])
    assert np.abs(np.array(pts) - np.array(FIRST_ARC)).max() <= 0.01
    assert len(layers["LAB"]) == 2
    assert len(layers["TOL"]) == 10


def test_compressed_rejected():
    # ogr_avc_3: compressed E00 must fail loudly
    with pytest.raises(ValueError):
        open_avc(f"{D}/compressed.e00")


def test_read_avc_spark(spark):
    df = read_avc(spark, f"{D}/testavc", "ARC")
    assert df.count() == 7
