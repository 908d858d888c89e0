"""Polygonize tests: local labeling vs brute-force flood fill, cross-block
region merge, and exact ring tracing (GDALPolygonize semantics,
gdal/alg/polygonize.cpp:493)."""

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.raster import model as M
from gdal_spark.raster import polygonize as PZ


def flood_label(arr, nodata=None):
    """Brute-force BFS 4-connected labeling (test oracle)."""
    h, w = arr.shape
    lab = np.full((h, w), -1, dtype=np.int64)
    n = 0
    for sy in range(h):
        for sx in range(w):
            if lab[sy, sx] != -1 or (nodata is not None and arr[sy, sx] == nodata):
                continue
            stack = [(sy, sx)]
            lab[sy, sx] = n
            while stack:
                y, x = stack.pop()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if (0 <= yy < h and 0 <= xx < w and lab[yy, xx] == -1
                            and arr[yy, xx] == arr[y, x]
                            and (nodata is None or arr[yy, xx] != nodata)):
                        lab[yy, xx] = n
                        stack.append((yy, xx))
            n += 1
    return lab, n


def canon(lab):
    """Canonical relabeling by first occurrence (for comparisons)."""
    out = np.full(lab.shape, -1, dtype=np.int64)
    mapping = {}
    for y in range(lab.shape[0]):
        for x in range(lab.shape[1]):
            v = lab[y, x]
            if v < 0:
                continue
            out[y, x] = mapping.setdefault(v, len(mapping))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_label_block_matches_flood(seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 3, size=(17, 13)).astype(np.uint8)
    got, ng = PZ.label_block(arr)
    want, nw = flood_label(arr)
    assert ng == nw
    np.testing.assert_array_equal(canon(got), canon(want))


def test_label_block_nodata():
    arr = np.array([[1, 0, 1], [1, 0, 1], [1, 1, 1]], dtype=np.uint8)
    lab, n = PZ.label_block(arr, nodata=0)
    assert n == 1
    assert (lab[:, 1][:2] == -1).all()


def test_trace_rings_square_and_hole():
    m = np.ones((6, 8), dtype=bool)
    m[2:4, 3:6] = False
    rings = PZ.trace_rings(m)
    assert len(rings) == 2
    ext, hole = rings
    # exterior spans the full corner box
    assert ext[:, 0].min() == 0 and ext[:, 0].max() == 8
    assert ext[:, 1].min() == 0 and ext[:, 1].max() == 6
    assert hole[:, 0].min() == 3 and hole[:, 0].max() == 6
    # areas: shoelace |ext| = 48, |hole| = 6
    assert G.ring_area(ext) == 48.0 and G.ring_area(hole) == 6.0


def test_trace_rings_diagonal_touch():
    m = np.array([[1, 0], [1, 1]], dtype=bool)
    rings = PZ.trace_rings(m)
    assert len(rings) == 1 and G.ring_area(rings[0]) == 3.0
    # true diagonal self-touch within one 4-connected region
    m2 = np.array([[1, 1, 0], [0, 1, 1], [0, 1, 0]], dtype=bool)
    rings2 = PZ.trace_rings(m2)
    assert sum(G.ring_area(r) for r in rings2[:1]) - \
        sum(G.ring_area(r) for r in rings2[1:]) == 5.0


def _quadrant_raster():
    """64x48 raster, 4 value quadrants + one small island crossing nothing."""
    arr = np.zeros((48, 64), dtype=np.uint8)
    arr[:24, :32] = 1
    arr[:24, 32:] = 2
    arr[24:, :32] = 3
    arr[24:, 32:] = 4
    arr[10:14, 28:36] = 7  # island straddling the vertical split
    return arr


def test_polygonize_distributed_regions(spark):
    arr = _quadrant_raster()
    want_lab, want_n = flood_label(arr)
    for block in (16, 64):
        meta = M.RasterMeta("pz", 64, 48, block=block)
        tiles = M.from_array(spark, arr, meta)
        rows = PZ.polygonize(tiles, meta).collect()
        assert len(rows) == want_n, f"block={block}"
        got = {(r["value"], r["n_pixels"], r["pxmin"], r["pymin"],
                r["pxmax"], r["pymax"]) for r in rows}
        want = set()
        for lab in range(want_n):
            ys, xs = np.nonzero(want_lab == lab)
            want.add((float(arr[ys[0], xs[0]]), len(ys),
                      xs.min(), ys.min(), xs.max(), ys.max()))
        assert got == want


def test_polygonize_snake_across_blocks(spark):
    """A zigzag region spanning many blocks exercises multi-hop merge."""
    arr = np.zeros((8, 80), dtype=np.uint8)
    arr[4, :] = 9          # long horizontal line through 5 blocks of 16
    arr[0:4, 0] = 9
    arr[5:8, 79] = 9
    meta = M.RasterMeta("sn", 80, 8, block=16)
    rows = PZ.polygonize(M.from_array(spark, arr, meta), meta,
                         ).filter("value = 9.0").collect()
    assert len(rows) == 1
    assert rows[0]["n_pixels"] == 80 + 4 + 3


def test_polygonize_row_seam_no_wrap(spark):
    """Regression: isolated equal-valued pixels at (width-1, y) and (0, y+1)
    must NOT merge — the vertical border-edge key previously wrapped around
    the row end ((y+1)*width-1 == y*width + width-1)."""
    arr = np.zeros((4, 32), dtype=np.uint8)
    arr[0, 31] = 9
    arr[1, 0] = 9
    meta = M.RasterMeta("wrap", 32, 4, block=16)
    rows = (PZ.polygonize(M.from_array(spark, arr, meta), meta)
            .filter("value = 9.0").collect())
    assert len(rows) == 2
    assert sorted(r["n_pixels"] for r in rows) == [1, 1]


def test_polygonize_block_seam_no_wrap(spark):
    """Same wrap scenario at an interior block border: pixels at the right
    edge of block column 1 row y and the left edge of block column 0 row
    y+1 stay separate."""
    arr = np.zeros((4, 32), dtype=np.uint8)
    arr[0, 15] = 9   # right edge of block (0,0)
    arr[1, 16] = 9   # left edge of block (1,0) — diagonal, not 4-connected
    meta = M.RasterMeta("wrap2", 32, 4, block=16)
    rows = (PZ.polygonize(M.from_array(spark, arr, meta), meta)
            .filter("value = 9.0").collect())
    assert len(rows) == 2


def test_region_geometries_exact(spark):
    arr = np.zeros((20, 30), dtype=np.uint8)
    arr[4:16, 5:25] = 5
    arr[8:12, 10:20] = 0   # hole in the 5-region
    meta = M.RasterMeta("rg", 30, 20, gt=(100.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                        block=8)
    out = PZ.region_geometries(M.from_array(spark, arr, meta), meta)
    recs = {r["value"]: r for r in out.collect()}
    five = recs[5.0]
    assert five["n_pixels"] == 12 * 20 - 4 * 10
    polys = G.decode_polygons(bytes(five["wkb"]))
    assert len(polys) == 1 and len(polys[0]) == 2  # exterior + hole
    ext, hole = polys[0]
    # geo coords: x = 100 + px*2, y = 50 - py*2
    assert ext[:, 0].min() == 100 + 5 * 2 and ext[:, 0].max() == 100 + 25 * 2
    assert ext[:, 1].min() == 50 - 16 * 2 and ext[:, 1].max() == 50 - 4 * 2
    assert G.polygon_area(bytes(five["wkb"])) == five["n_pixels"] * 4.0
