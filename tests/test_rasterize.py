"""Rasterize tests: vectorized fill kernel vs a direct scalar port of the
reference scanline algorithm (llrasterize.cpp:91-248), then the distributed
operator for block-partition independence and burn ordering."""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.raster import model as M
from gdal_spark.raster import rasterize as R


# ---------------------------------------------------------------------------
# scalar reference twin (direct port of llrasterize.cpp method=1)
# ---------------------------------------------------------------------------

def scalar_fill(rings, h, w):
    out = np.zeros((h, w), dtype=bool)
    closed = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        closed.append(r)
    ys_all = np.concatenate([r[:, 1] for r in closed])
    miny = max(int(ys_all.min()), 0)
    maxy = min(int(ys_all.max()), h - 1)
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        ints = []
        for r in closed:
            for i in range(len(r) - 1):
                x1, yy1 = r[i]
                x2, yy2 = r[i + 1]
                if (yy1 < dy and yy2 < dy) or (yy1 > dy and yy2 > dy):
                    continue
                if yy1 < yy2:
                    dx1, dy1, dx2, dy2 = x1, yy1, x2, yy2
                elif yy1 > yy2:
                    dx1, dy1, dx2, dy2 = x2, yy2, x1, yy1
                else:
                    if x1 > x2:  # bottom horizontal, fill separately
                        hx1 = int(np.floor(x2 + 0.5))
                        hx2 = int(np.floor(x1 + 0.5))
                        if hx1 > w - 1 or hx2 <= 0:
                            continue
                        out[y, max(hx1, 0):max(hx2, 0)] = True
                    continue
                if dy < dy2 and dy >= dy1:
                    inter = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                    ints.append(int(np.floor(inter + 0.5)))
        ints.sort()
        for i in range(0, len(ints) - 1, 2):
            if ints[i] <= w - 1 and ints[i + 1] > 0:
                out[y, max(ints[i], 0):min(ints[i + 1], w)] = True
    return out


CASES = [
    # convex quad
    [np.array([[2.3, 1.7], [17.2, 2.4], [15.8, 16.1], [3.1, 14.9]])],
    # concave (notch)
    [np.array([[1, 1], [18, 1], [18, 6], [6, 6], [6, 10], [18, 10], [18, 17], [1, 17]])],
    # square with hole
    [np.array([[2, 2], [17, 2], [17, 17], [2, 17]]),
     np.array([[6, 6], [12, 6], [12, 12], [6, 12]])],
    # horizontal edges exactly at pixel centers
    [np.array([[3, 2.5], [14, 2.5], [14, 9.5], [3, 9.5]])],
    # sub-pixel sliver
    [np.array([[5.1, 5.2], [5.9, 5.3], [5.6, 5.8]])],
    # triangle crossing the window edge
    [np.array([[-4, -3], [25, 4], [8, 22]])],
]


@pytest.mark.parametrize("rings", CASES, ids=range(len(CASES)))
def test_fill_matches_scalar_reference(rings):
    want = scalar_fill(rings, 20, 20)
    got = R.fill_polygon_mask(rings, 0, 20, 0, 20)
    np.testing.assert_array_equal(got, want)


def test_fill_windowed_equals_global():
    """Kernel over sub-windows must tile exactly to the global fill."""
    rings = CASES[1]
    full = R.fill_polygon_mask(rings, 0, 20, 0, 20)
    quilt = np.zeros_like(full)
    for y0 in (0, 10):
        for x0 in (0, 10):
            quilt[y0:y0 + 10, x0:x0 + 10] = R.fill_polygon_mask(
                rings, y0, y0 + 10, x0, x0 + 10)
    np.testing.assert_array_equal(quilt, full)


# ---------------------------------------------------------------------------
# distributed operator
# ---------------------------------------------------------------------------

def _geom_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(wkb), float(b)) for i, (wkb, b) in enumerate(rows)],
        "geom_id long, wkb binary, burn double")


def test_rasterize_polygons_block_independence(spark):
    """Same burn result at block=100 and block=35 (partition independence),
    matching the scalar reference."""
    rings_a = [np.array([[10.5, 20.5], [80.2, 25.3], [70.0, 90.0], [15.0, 85.0]])]
    rings_b = [np.array([[50, 50], [95, 50], [95, 95], [50, 95]]),
               np.array([[60, 60], [70, 60], [70, 70], [60, 70]])]
    rows = [(G.encode_polygon(rings_a), 1), (G.encode_polygon(rings_b), 2)]
    want = np.zeros((100, 100), dtype=np.uint8)
    want[scalar_fill(rings_a, 100, 100)] = 1
    want[scalar_fill(rings_b, 100, 100)] = 2  # later geom overwrites
    for block in (100, 35):
        meta = M.RasterMeta("r", 100, 100, gt=(0, 1, 0, 0, 0, 1), block=block)
        got = M.to_array(R.rasterize(_geom_df(spark, rows), meta), meta)
        np.testing.assert_array_equal(got, want)


def test_rasterize_geotransform(spark):
    """Burn in geo coords with a north-up geotransform (negative dy)."""
    # geo square x:[2,6), y:[4,8) over raster origin (0,10), px 1, py -1
    ring = np.array([[2.0, 4.0], [6.0, 4.0], [6.0, 8.0], [2.0, 8.0]])
    meta = M.RasterMeta("g", 10, 10, gt=(0, 1, 0, 10, 0, -1))
    rows = [(G.encode_polygon([ring]), 5)]
    got = M.to_array(R.rasterize(_geom_df(spark, rows), meta), meta)
    # pixel rows: y_geo = 10 - (py+0.5) inside (4, 8) → py in {2..5}
    want = np.zeros((10, 10), dtype=np.uint8)
    px_ring = [np.array([[2.0, 6.0], [6.0, 6.0], [6.0, 2.0], [2.0, 2.0]])]
    want[scalar_fill(px_ring, 10, 10)] = 5
    np.testing.assert_array_equal(got, want)
    assert got.sum() == 5 * 16  # 4x4 pixels burned


def test_rasterize_point_and_line(spark):
    meta = M.RasterMeta("pl", 20, 20, gt=(0, 1, 0, 0, 0, 1))
    rows = [(G.encode_point(5.7, 3.2), 9),
            (G.encode_linestring(np.array([[1.0, 1.0], [10.0, 10.0]])), 4)]
    got = M.to_array(R.rasterize(_geom_df(spark, rows), meta), meta)
    assert got[3, 5] == 9
    # diagonal line passes through (i, i) pixels
    for i in range(2, 9):
        assert got[i, i] == 4


def test_rasterize_multipolygon(spark):
    meta = M.RasterMeta("mp", 30, 30, gt=(0, 1, 0, 0, 0, 1))
    mp = G.encode_multipolygon([
        [np.array([[1, 1], [8, 1], [8, 8], [1, 8]])],
        [np.array([[20, 20], [28, 20], [28, 28], [20, 28]])],
    ])
    got = M.to_array(R.rasterize(_geom_df(spark, [(mp, 3)]), meta), meta)
    assert got[4, 4] == 3 and got[24, 24] == 3 and got[15, 15] == 0


def test_merge_alg_add_points(spark):
    from gdal_spark.raster import rasterize as RZ
    from gdal_spark.raster.model import RasterMeta
    meta = RasterMeta("add", 4, 4, gt=(0.0, 1.0, 0.0, 4.0, 0.0, -1.0),
                      dtype="uint8")
    pts = spark.createDataFrame(
        [(1.5, 2.5, 200.0), (1.7, 2.2, 100.0), (3.5, 0.5, 7.0)],
        "lon double, lat double, burn double")
    rows = {(r["px"], r["py"]): r["burn_val"]
            for r in RZ.rasterize_points(pts, meta, merge_alg="add").collect()}
    assert rows[(1, 1)] == (200 + 100) % 256  # unsigned-char wraparound
    assert rows[(3, 3)] == 7.0


def test_merge_alg_add_polygons(spark):
    import numpy as np

    from gdal_spark.functions.geometry import encode_polygon
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import rasterize as RZ
    meta = RM.RasterMeta("addp", 8, 8, gt=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0),
                         dtype="uint16", block=8)
    ring = lambda x0, y0, x1, y1: np.array(  # noqa: E731
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    geoms = spark.createDataFrame(
        [(0, bytearray(encode_polygon([ring(0, 0, 4, 4)])), 3.0),
         (1, bytearray(encode_polygon([ring(2, 2, 6, 6)])), 5.0)],
        "geom_id long, wkb binary, burn double")
    arr = RM.to_array(RZ.rasterize(geoms, meta, merge_alg="add"), meta)
    assert arr[6, 1] == 3         # first rect only (py = 8 - y)
    assert arr[3, 5] == 5         # second rect only
    assert arr[4, 2] == 8         # overlap accumulates (py 4..5, px 2..3)


def test_all_touched_wider_than_fill(spark):
    import numpy as np

    from gdal_spark.functions.geometry import encode_polygon
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import rasterize as RZ
    meta = RM.RasterMeta("at", 12, 12, gt=(0.0, 1.0, 0.0, 12.0, 0.0, -1.0),
                         dtype="uint8", block=12)
    ring = np.array([[0.6, 0.6], [9.2, 0.6], [9.2, 9.2], [0.6, 9.2],
                     [0.6, 0.6]])
    geoms = spark.createDataFrame(
        [(0, bytearray(encode_polygon([ring])), 1.0)],
        "geom_id long, wkb binary, burn double")
    fill = RM.to_array(RZ.rasterize(geoms, meta), meta)
    at = RM.to_array(RZ.rasterize(geoms, meta, all_touched=True), meta)
    assert fill.sum() == 8 * 8     # centers only
    assert at.sum() == 10 * 10     # every touched pixel
    assert ((at - fill) >= 0).all()
