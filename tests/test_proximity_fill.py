"""Proximity (exact Euclidean, GDALComputeProximity semantics) and
fillnodata tests: distributed vs direct single-array evaluation, block-size
independence."""

import numpy as np
import pytest

from gdal_spark.raster import model as M
from gdal_spark.raster import proximity as PX

ARR = np.zeros((40, 60), dtype=np.uint8)
ARR[5, 7] = 1
ARR[30, 50] = 2
ARR[18, 33] = 1
ARR[0, 59] = 3


def brute_prox(arr, maxdist, nodata=65535.0, targets=None):
    ty, tx = np.nonzero(arr != 0 if targets is None
                        else np.isin(arr, targets))
    X, Y = np.meshgrid(np.arange(arr.shape[1], dtype=float),
                       np.arange(arr.shape[0], dtype=float))
    best = np.full(arr.shape, np.inf)
    for x, y in zip(tx, ty):
        best = np.minimum(best, (X - x) ** 2 + (Y - y) ** 2)
    d = np.sqrt(best)
    return np.where(d <= maxdist, d, nodata).astype(np.float32)


@pytest.mark.parametrize("block", [16, 64])
def test_proximity_matches_brute(spark, block):
    meta = M.RasterMeta("p", 60, 40, block=block)
    tiles = M.from_array(spark, ARR, meta)
    out, om = PX.proximity(tiles, meta, max_distance=12.0)
    got = M.to_array(out, om, fill=om.nodata)
    want = brute_prox(ARR, 12.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_proximity_target_values(spark):
    meta = M.RasterMeta("p", 60, 40, block=32)
    out, om = PX.proximity(M.from_array(spark, ARR, meta), meta,
                           max_distance=15.0, target_values=[2.0])
    got = M.to_array(out, om, fill=om.nodata)
    want = brute_prox(ARR, 15.0, targets=[2])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_proximity_geo_units(spark):
    meta = M.RasterMeta("p", 60, 40, gt=(0.0, 2.5, 0.0, 0.0, 0.0, -2.5), block=32)
    out, om = PX.proximity(M.from_array(spark, ARR, meta), meta,
                           max_distance=25.0, distunits_geo=True)
    got = M.to_array(out, om, fill=om.nodata)
    want = brute_prox(ARR, 10.0)  # 25 geo / 2.5 = 10 px
    want = np.where(want != 65535.0, want * 2.5, 65535.0).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_proximity_dense_targets(spark):
    """Density independence: ≥30% target pixels must still be exact, and the
    separable EDT must not fan out per target (the round-2 brute-force shape
    was O(pixels × targets); this one is O(pixels × strip) regardless)."""
    import time
    rng = np.random.RandomState(7)
    dense = (rng.rand(40, 60) < 0.35).astype(np.uint8)
    meta = M.RasterMeta("pd", 60, 40, block=16)
    t0 = time.time()
    out, om = PX.proximity(M.from_array(spark, dense, meta), meta,
                           max_distance=12.0)
    got = M.to_array(out, om, fill=om.nodata)
    t_dense = time.time() - t0
    np.testing.assert_allclose(got, brute_prox(dense, 12.0), rtol=1e-6)
    # sparse control on the same grid/block size
    t0 = time.time()
    out, om = PX.proximity(M.from_array(spark, ARR, meta), meta,
                           max_distance=12.0)
    M.to_array(out, om, fill=om.nodata)
    t_sparse = time.time() - t0
    # generous noise guard — the algorithm is literally the same code path
    assert t_dense <= max(4.0 * t_sparse, t_sparse + 5.0)


# ---------------------------------------------------------------------------
# fillnodata
# ---------------------------------------------------------------------------

FILL_SRC = (np.arange(48 * 64).reshape(48, 64) % 97).astype(np.float64) + 10
HOLES = FILL_SRC.copy()
HOLES[10:14, 20:26] = 0.0   # nodata hole
HOLES[30, 40] = 0.0
HOLES[0, 0] = 0.0           # corner hole


@pytest.mark.parametrize("block", [16, 48])
def test_fillnodata_block_independent(spark, block):
    meta = M.RasterMeta("f", 64, 48, dtype="float64", nodata=0.0, block=block)
    tiles = M.from_array(spark, HOLES, meta)
    out, om = PX.fillnodata(tiles, meta, max_search=6)
    got = M.to_array(out, om)
    want = PX.fill_window(HOLES, 0.0, 6)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # every hole actually filled with a sensible neighborhood value
    assert got[11, 22] > 0 and abs(got[30, 40] - FILL_SRC[30, 40]) < 50


def test_fillnodata_smoothing(spark):
    meta = M.RasterMeta("f", 64, 48, dtype="float64", nodata=0.0, block=32)
    out, om = PX.fillnodata(M.from_array(spark, HOLES, meta), meta,
                            max_search=6, smoothing_iterations=2)
    got = M.to_array(out, om)
    want = PX.fill_window(HOLES, 0.0, 6, smoothing_iterations=2)
    np.testing.assert_allclose(got, want, rtol=1e-12)
