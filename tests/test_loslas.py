"""NADCON LOS/LAS grid reader/writer.

Geometry golden re-created from the reference autotest
(gdrivers/loslas.py loslas_online_1: wyhpgn.los reads geotransform
(-111.625, 0.25, 0, 45.625, 0, -0.25)); data roundtrip is exact."""

import numpy as np
import pytest

from gdal_spark.raster.formats import (open_loslas, read_loslas,
                                       write_loslas)
from gdal_spark.raster.model import to_array

GT = (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25)


def test_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.random((21, 30)).astype("float32")
    p = str(tmp_path / "wyhpgn.los")
    write_loslas(arr, GT, p)
    info = open_loslas(p)
    assert (info["width"], info["height"]) == (30, 21)
    assert max(abs(a - b) for a, b in zip(info["gt"], GT)) < 1e-6
    df, meta = read_loslas(spark, p)
    np.testing.assert_array_equal(to_array(df, meta), arr)


def test_not_nadgrd(tmp_path):
    p = str(tmp_path / "x.los")
    with open(p, "wb") as f:
        f.write(b"\x00" * 200)
    with pytest.raises(ValueError):
        open_loslas(p)
