"""Gridding tests: distributed cell-join IDW/nearest/metrics vs brute-force
numpy, including the reference singularity rule (gdalgrid.cpp:184)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import gridding as GR
from gdal_spark.raster import model as M

META = M.RasterMeta("g", 20, 10, gt=(0.0, 10.0, 0.0, 100.0, 0.0, -10.0),
                    dtype="float64")
R = 12.0

rng = np.random.RandomState(3)
PX = rng.uniform(0, 200, 300)
PY = rng.uniform(0, 100, 300)
PZ = (np.arange(300) % 53).astype(np.float64)
# one point exactly on a node center (node 3,4 → x=35, y=55)
PX[7], PY[7] = 35.0, 55.0


@pytest.fixture(scope="module")
def pts(spark):
    rows = [(int(i), float(PX[i]), float(PY[i]), float(PZ[i]))
            for i in range(len(PX))]
    return spark.createDataFrame(rows, "pid long, x double, y double, z double")


def _nodes():
    xs = np.array([(i + 0.5) * 10.0 for i in range(20)])
    ys = np.array([100.0 - (j + 0.5) * 10.0 for j in range(10)])
    return xs, ys


def brute_invdist():
    xs, ys = _nodes()
    out = {}
    for py_i, ny in enumerate(ys):
        for px_i, nx in enumerate(xs):
            d2 = (PX - nx) ** 2 + (PY - ny) ** 2
            sel = d2 <= R * R
            if not sel.any():
                continue
            dd = d2[sel]
            zz = PZ[sel]
            if (dd < 1e-13).any():
                out[(px_i, py_i)] = zz[dd < 1e-13][0]
            else:
                out[(px_i, py_i)] = (zz / dd).sum() / (1.0 / dd).sum()
    return out


def test_invdist_matches_brute(spark, pts):
    got = {(r["px"], r["py"]): r["val"]
           for r in GR.grid_invdist(pts, META, R).collect()}
    want = brute_invdist()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    # singularity: node (3,4) exactly takes PZ[7]
    assert got[(3, 4)] == PZ[7]


def test_nearest_matches_brute(spark, pts):
    got = {(r["px"], r["py"]): r["val"]
           for r in GR.grid_nearest(pts, META, R).collect()}
    xs, ys = _nodes()
    for (px_i, py_i), v in got.items():
        d2 = (PX - xs[px_i]) ** 2 + (PY - ys[py_i]) ** 2
        order = np.lexsort((np.arange(len(PX)), d2))
        best = order[0]
        assert d2[best] <= R * R
        assert v == PZ[best]


def test_metrics_match_brute(spark, pts):
    xs, ys = _nodes()
    for metric, red in [("minimum", np.min), ("maximum", np.max),
                        ("count", len), ("average", np.mean)]:
        got = {(r["px"], r["py"]): r["val"]
               for r in GR.grid_metric(pts, META, R, metric).collect()}
        for (px_i, py_i), v in got.items():
            d2 = (PX - xs[px_i]) ** 2 + (PY - ys[py_i]) ** 2
            sel = d2 <= R * R
            assert v == pytest.approx(float(red(PZ[sel])), rel=1e-12), metric


def test_min_points_nodata(spark, pts):
    sparse = pts.filter(F.col("pid") < 3)
    out = GR.grid_invdist(sparse, META, R, min_points=5, nodata=-1.0).collect()
    assert all(r["val"] == -1.0 for r in out)
