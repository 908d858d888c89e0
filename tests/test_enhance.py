"""Histogram equalization vs a scalar transcription of gdalenhance's
ComputeEqualizationLUTs / EnhancerCallback."""

import numpy as np

from gdal_spark.raster import enhance as EN
from gdal_spark.raster import model as RM


def _lut_scalar(hist, lut_bins=256):
    hist = list(hist)
    hist[0] = 0
    hist[-1] = 0
    n = len(hist)
    cum = []
    total = 0
    for h in hist:
        cum.append(total + h // 2)
        total += h
    if total == 0:
        total = 1
    lut = []
    for i in range(lut_bins):
        ih = (i * n) // lut_bins
        lut.append(max(0, min(lut_bins - 1, (cum[ih] * lut_bins) // total)))
    return lut


def test_lut_matches_scalar():
    rng = np.random.RandomState(5)
    hist = rng.randint(0, 1000, size=256)
    np.testing.assert_array_equal(EN.lut_from_histogram(hist),
                                  _lut_scalar(hist))


def test_lut_flattens_cdf():
    # a heavily skewed histogram should spread over the output range
    hist = np.zeros(256, dtype=np.int64)
    hist[10:20] = 1000
    lut = EN.lut_from_histogram(hist)
    assert lut[9] == 0
    assert lut[19] > 200          # upper end of the mass reaches the top
    assert lut[255] == 255 or lut[255] >= lut[19]


def test_equalize_end_to_end(spark):
    rng = np.random.RandomState(3)
    arr = rng.randint(1, 60, size=(64, 96)).astype(np.uint8)
    arr[0, :8] = 0  # nodata pixels pass through
    meta = RM.RasterMeta("eq", 96, 64, gt=(0, 1, 0, 0, 0, -1),
                         dtype="uint8", nodata=0, block=32)
    tiles = RM.from_array(spark, arr, meta)
    out = EN.enhance(tiles, meta)
    got = RM.to_array(out, meta)
    # scalar reference
    hist = np.bincount(arr[arr != 0].ravel(), minlength=256)
    lut = np.array(_lut_scalar(hist))
    exp = lut[np.clip(((arr.astype(np.float64) + 0.5) * 1.0).astype(np.int64),
                      0, 255)].astype(np.uint8)
    exp[arr == 0] = 0
    np.testing.assert_array_equal(got, exp)
