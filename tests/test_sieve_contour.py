"""Sieve (small-region merge) and contour-segment tests."""

import numpy as np
import pytest

from gdal_spark.raster import contour as CT
from gdal_spark.raster import model as M
from gdal_spark.raster import sieve as SV


def test_sieve_islands_absorbed(spark):
    """Small islands in a sea merge into the sea; big island stays."""
    arr = np.zeros((40, 40), dtype=np.uint8)
    arr[5:7, 5:7] = 1        # 4 px island  < threshold
    arr[20, 30] = 2          # 1 px island  < threshold
    arr[25:35, 5:15] = 3     # 100 px island >= threshold
    meta = M.RasterMeta("s", 40, 40, block=16)
    out = SV.sieve(M.from_array(spark, arr, meta), meta, threshold=10)
    got = M.to_array(out, meta)
    want = arr.copy()
    want[5:7, 5:7] = 0
    want[20, 30] = 0
    np.testing.assert_array_equal(got, want)


def test_sieve_block_independence(spark):
    rng = np.random.RandomState(5)
    arr = (rng.rand(30, 48) > 0.5).astype(np.uint8)
    outs = []
    for block in (48, 16):
        meta = M.RasterMeta("s", 48, 30, block=block)
        out = SV.sieve(M.from_array(spark, arr, meta), meta, threshold=4)
        outs.append(M.to_array(out, meta))
    np.testing.assert_array_equal(outs[0], outs[1])
    # merging can isolate single pixels into NEW small regions (the
    # reference's one-pass sieve has the same property), but the count of
    # small regions must drop sharply
    from gdal_spark.raster.polygonize import label_block

    def n_small(a):
        lab, n = label_block(a)
        sizes = np.bincount(lab[lab >= 0], minlength=n)
        return int(((sizes > 0) & (sizes < 4)).sum())

    assert n_small(outs[0]) < n_small(arr) / 5


def test_sieve_chained_small_regions(spark):
    """A strip of adjacent small regions must collapse (multi-round)."""
    arr = np.zeros((8, 20), dtype=np.uint8)
    arr[3:5, 2:4] = 1   # 4px
    arr[3:5, 4:6] = 2   # 4px adjacent to 1
    meta = M.RasterMeta("s", 20, 8, block=8)
    out = SV.sieve(M.from_array(spark, arr, meta), meta, threshold=5)
    got = M.to_array(out, meta)
    np.testing.assert_array_equal(got, np.zeros_like(arr))


def test_sieve_row_seam_no_spurious_adjacency(spark):
    """Regression: a small region at the end of row y must not be adjacent
    to a region starting at row y+1 (border-key wraparound). The 2px region
    at the right edge of row 0 is NOT 4-adjacent to the 9px block at the
    left edge of rows 1-3 — it must merge into the background, not into it."""
    arr = np.zeros((6, 32), dtype=np.uint8)
    arr[0, 30:32] = 5      # 2px small region, touches only background
    arr[1:4, 0:3] = 7      # 9px region starting at (0,1) — NOT a neighbor
    meta = M.RasterMeta("seam", 32, 6, block=16)
    out = SV.sieve(M.from_array(spark, arr, meta), meta, threshold=4)
    got = M.to_array(out, meta)
    want = arr.copy()
    want[0, 30:32] = 0     # merged into background (largest true neighbor)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# contour
# ---------------------------------------------------------------------------

def test_contour_linear_ramp(spark):
    """z = x → iso-line x at the interpolated pixel-center position."""
    X, Y = np.meshgrid(np.arange(30, dtype=np.float64), np.arange(20))
    arr = X.copy()
    meta = M.RasterMeta("c", 30, 20, dtype="float64", block=8)
    segs = CT.contour_segments(M.from_array(spark, arr, meta), meta, [10.25])
    rows = segs.collect()
    assert rows
    # all segments are vertical at pixel-x where value crosses 10.25:
    # nodes at centers x+0.5 carry value x → crossing at x = 10.75
    for r in rows:
        assert r["x0"] == pytest.approx(10.75)
        assert r["x1"] == pytest.approx(10.75)
    # one segment per cell row (19 cell rows)
    assert len(rows) == 19


def test_contour_block_independence(spark):
    rng = np.random.RandomState(9)
    arr = rng.rand(25, 40) * 100
    levels = [25.0, 50.0, 75.0]
    sets = []
    for block in (40, 8):
        meta = M.RasterMeta("c", 40, 25, dtype="float64", block=block)
        segs = CT.contour_segments(M.from_array(spark, arr, meta), meta, levels)
        sets.append({tuple(np.round([r["level"], r["x0"], r["y0"],
                                     r["x1"], r["y1"]], 9))
                     for r in segs.collect()})
    assert sets[0] == sets[1]
    assert len(sets[0]) > 50


def test_contour_geo_coords(spark):
    X, _ = np.meshgrid(np.arange(10, dtype=np.float64), np.arange(6))
    meta = M.RasterMeta("c", 10, 6, gt=(100.0, 2.0, 0.0, 50.0, 0.0, -2.0),
                        dtype="float64", block=8)
    segs = CT.contour_segments(M.from_array(spark, X, meta), meta, [4.5]).collect()
    for r in segs:
        assert r["x0"] == pytest.approx(100.0 + 5.0 * 2.0)  # px 5.0 → geo 110


def test_contour_lines_ramp_stitched(spark):
    """z=x ramp: one open polyline per level, all 19 segments merged."""
    X, _ = np.meshgrid(np.arange(30, dtype=np.float64), np.arange(20))
    meta = M.RasterMeta("cl", 30, 20, dtype="float64", block=8)
    rows = CT.contour_lines(M.from_array(spark, X, meta), meta,
                            [10.25]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_points"] == 20 and not r["closed"]
    assert r["length"] == pytest.approx(19.0)
    from gdal_spark.functions import geometry as G
    pts = G.decode_linestring(bytes(r["wkb"]))
    assert np.allclose(pts[:, 0], 10.75)        # constant x = L + 0.5
    assert pts[0, 1] != pts[-1, 1]


def test_contour_lines_closed_ring(spark):
    """Chebyshev cone z = max(|i-10|, |j-10|): contours are closed rings."""
    ii, jj = np.meshgrid(np.arange(21), np.arange(21), indexing="ij")
    z = np.maximum(np.abs(ii - 10), np.abs(jj - 10)).astype(np.float64)
    meta = M.RasterMeta("cone", 21, 21, dtype="float64", block=8)
    rows = CT.contour_lines(M.from_array(spark, z, meta), meta,
                            [3.5, 6.5]).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    for lv, rs in by_level.items():
        assert len(rs) == 1, lv
        assert rs[0]["closed"], lv
    # ring lengths grow with level
    assert by_level[6.5][0]["length"] > by_level[3.5][0]["length"]


def test_contour_lines_block_independence(spark):
    rng = np.random.RandomState(13)
    arr = rng.rand(25, 40) * 100
    sigs = []
    for block in (40, 8):
        meta = M.RasterMeta("ci", 40, 25, dtype="float64", block=block)
        rows = CT.contour_lines(M.from_array(spark, arr, meta), meta,
                                [30.0, 60.0]).collect()
        sigs.append(sorted((r["level"], r["n_points"], r["closed"],
                            round(r["length"], 9)) for r in rows))
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) > 2


def test_sieve_matches_sequential_reference(spark):
    """Golden: distributed sieve equals an independent sequential
    flood-fill sieve (largest-neighbor merge to fixpoint) on the
    driver-gate fixture — including the subtle pinched-background case
    where two 64-px squares merge into the 1600-px corner rather than
    the globally-largest background (the diagonal square chains cut the
    4-connected background into antidiagonal bands)."""
    from collections import deque

    W, H = 128, 64
    X, Y = np.meshgrid(np.arange(W), np.arange(H))
    small = ((X // 8 + Y // 8) % 5 == 0)
    arr = np.where((X < 40) & (Y < 40), 3,
                   np.where(small, 2, 1)).astype(np.uint16)

    def label(a):
        lab = -np.ones(a.shape, dtype=int)
        nxt = 0
        for y in range(H):
            for x in range(W):
                if lab[y, x] >= 0:
                    continue
                v = a[y, x]
                lab[y, x] = nxt
                dq = deque([(y, x)])
                while dq:
                    cy, cx = dq.popleft()
                    for ny, nx in ((cy - 1, cx), (cy + 1, cx),
                                   (cy, cx - 1), (cy, cx + 1)):
                        if (0 <= ny < H and 0 <= nx < W
                                and lab[ny, nx] < 0 and a[ny, nx] == v):
                            lab[ny, nx] = nxt
                            dq.append((ny, nx))
                nxt += 1
        return lab, nxt

    thr = 100
    cur = arr.copy()
    for _ in range(50):
        lab, n = label(cur)
        sizes = np.bincount(lab.ravel(), minlength=n)
        vals = np.zeros(n, dtype=cur.dtype)
        vals[lab] = cur
        nbrs = [set() for _ in range(n)]
        for la, lb in ((lab[:, :-1], lab[:, 1:]), (lab[:-1, :], lab[1:, :])):
            m = la != lb
            for a_, b_ in zip(la[m].ravel(), lb[m].ravel()):
                nbrs[a_].add(b_)
                nbrs[b_].add(a_)
        newval = vals.copy()
        changed = False
        for r in range(n):
            if sizes[r] < thr and nbrs[r]:
                tgt = max(nbrs[r], key=lambda t: (sizes[t], -t))
                if newval[r] != vals[tgt]:
                    newval[r] = vals[tgt]
                    changed = True
        cur = newval[lab]
        if not changed:
            break

    meta = M.RasterMeta("sq", W, H, dtype="uint16", block=32)
    out = SV.sieve(M.from_array(spark, arr, meta), meta, threshold=thr)
    np.testing.assert_array_equal(M.to_array(out, meta), cur)
