"""Median-cut palette, Floyd-Steinberg dither, nearblack (reference
semantics tests: gdalmediancut.cpp / gdaldither.cpp / nearblack.cpp)."""

import numpy as np
import pytest

from gdal_spark.raster import color as C
from gdal_spark.raster import model as M


def _rgb_tiles(spark, r, g, b, meta):
    dfs = [M.from_array(spark, arr, meta, band=i)
           for i, arr in enumerate((r, g, b))]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def test_median_cut_two_colors(spark):
    """Black/white image, 2 colors: split yields (0,0,0) prepended, then
    ((31+31)<<3)/2 = 248 grey-white — the reference's exact entry math."""
    h, w = 16, 16
    r = np.zeros((h, w), dtype=np.uint8); r[:, 8:] = 255
    meta = M.RasterMeta("mc", w, h, block=8)
    tiles = _rgb_tiles(spark, r, r, r, meta)
    pal = C.median_cut_pct(tiles, meta, n_colors=2)
    assert pal.tolist() == [[0, 0, 0], [248, 248, 248]]


def test_median_cut_four_quadrants(spark):
    rng = np.random.RandomState(0)
    h, w = 32, 32
    r = np.where(np.arange(w)[None, :] < 16, 10, 240).astype(np.uint8) * np.ones((h, 1), np.uint8)
    g = np.where(np.arange(h)[:, None] < 16, 10, 240).astype(np.uint8) * np.ones((1, w), np.uint8)
    b = np.full((h, w), 128, dtype=np.uint8)
    meta = M.RasterMeta("mc4", w, h, block=16)
    pal = C.median_cut_pct(_rgb_tiles(spark, r, g, b, meta), meta, n_colors=4)
    assert len(pal) == 4
    # each of the 4 (r,g) combinations maps to a distinct palette entry
    idx = {C.find_nearest_color(pal, rr, gg, 128) for rr in (10, 240) for gg in (10, 240)}
    assert len(idx) == 4


def test_dither_exact_palette_roundtrip(spark):
    """Pixels already at palette colors dither to themselves (zero error)."""
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [255, 255, 255]],
                   dtype=np.uint8)
    h, w = 20, 24
    rng = np.random.RandomState(3)
    pick = rng.randint(0, 4, size=(h, w))
    r = pal[pick, 0]; g = pal[pick, 1]; b = pal[pick, 2]
    meta = M.RasterMeta("dz", w, h, block=8)
    out = C.dither_rgb_to_pct(_rgb_tiles(spark, r, g, b, meta), meta, pal)
    om = M.RasterMeta("dz_pct", w, h, block=8)
    got = M.to_array(out, om)
    np.testing.assert_array_equal(got, pick.astype(np.uint8))


def test_dither_preserves_mean_and_block_independent(spark):
    """Uniform grey 128 on a black/white palette: FS dithering yields a
    ~50% mix; output identical for any input partitioning."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    h, w = 32, 40
    grey = np.full((h, w), 128, dtype=np.uint8)
    outs = []
    for block in (8, 64):
        meta = M.RasterMeta("dg", w, h, block=block)
        out = C.dither_rgb_to_pct(_rgb_tiles(spark, grey, grey, grey, meta),
                                  meta, pal)
        om = M.RasterMeta("dg_pct", w, h, block=block)
        outs.append(M.to_array(out, om))
    np.testing.assert_array_equal(outs[0], outs[1])
    mean = pal[outs[0].astype(int), 0].mean()
    assert abs(mean - 128) < 6


def test_nearblack_collar(spark):
    """Near-black collar floods to 0 from the edges; interior near-black
    pixels shielded by bright pixels survive."""
    h, w = 24, 30
    arr = np.full((h, w), 200, dtype=np.uint8)
    arr[:3, :] = 9; arr[-3:, :] = 9      # top/bottom collar
    arr[:, :4] = 9; arr[:, -4:] = 9      # left/right collar
    arr[12, 15] = 5                       # interior near-black: must stay
    meta = M.RasterMeta("nb", w, h, block=8)
    out = C.nearblack(M.from_array(spark, arr, meta), meta)
    om = M.RasterMeta("nb_nb", w, h, block=8)
    got = M.to_array(out, om)
    assert (got[:3, :] == 0).all() and (got[-3:, :] == 0).all()
    assert (got[:, :4] == 0).all() and (got[:, -4:] == 0).all()
    assert got[12, 15] == 5
    assert got[12, 12] == 200


def test_nearblack_max_non_black_tolerance():
    """The scans tolerate up to max_non_black bright pixels per
    column/run before terminating, so a big bright region loses a ≤2-px
    rind from each side but its interior survives; thin bright specks
    inside the collar dissolve (nearblack.cpp counter semantics)."""
    arr = np.zeros((12, 14), dtype=np.uint8)
    arr[3:9, 4:10] = 200              # 6x6 bright block
    arr[1, 1] = 200                   # lone speck in the collar
    out = C.nearblack_kernel(arr[None, :, :], near_dist=15,
                             max_non_black=2)[0]
    assert out[1, 1] == 0             # speck swallowed
    assert (out[5:7, 6:8] == 200).all()   # interior survives
    assert (out[0, :] == 0).all() and (out[:, 0] == 0).all()


def test_nearblack_white_mode():
    """-white: near-white collar floods to exact 255; non-white interior
    (beyond the ≤2-px tolerance rind) survives."""
    arr = np.full((14, 16), 100, dtype=np.uint8)
    arr[:, 0] = 250
    arr[0, :] = 250
    out = C.nearblack_kernel(arr[None, :, :], white=True)[0]
    assert (out[:, 0] == 255).all()
    assert (out[0, :] == 255).all()
    assert out[7, 8] == 100
