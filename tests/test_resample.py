"""Warp/resample tests: vectorized gather vs a direct scalar port of
GWKResampleNoMasksT (gdalwarpkernel.cpp:3055-3140), kernel weight golden
values, and the distributed warp operator (identity, scale, block
independence) in autotest/alg/warp.py style."""

import math

import numpy as np
import pytest

from gdal_spark.raster import model as M
from gdal_spark.raster import resample as R


# ---------------------------------------------------------------------------
# kernel weight golden values (hand-computed from the reference formulas)
# ---------------------------------------------------------------------------

def test_weight_formulas():
    assert R.w_bilinear(np.array([0.0, 0.5, 1.0, 1.5])).tolist() == [1.0, 0.5, 0.0, 0.0]
    # cubic Catmull-Rom: w(0)=1, w(1)=0, w(0.5)=0.5625, w(1.5)=-0.0625
    np.testing.assert_allclose(
        R.w_cubic(np.array([0.0, 0.5, 1.0, 1.5, 2.0])),
        [1.0, 0.5625, 0.0, -0.0625, 0.0], atol=1e-15)
    # B-spline: w(0)=4/6, w(1)=1/6
    np.testing.assert_allclose(
        R.w_bspline(np.array([0.0, 1.0, 2.0])), [4 / 6, 1 / 6, 0.0], atol=1e-15)
    # lanczos: w(0)=1, zeros at integers up to 3
    lz = R.w_lanczos(np.array([0.0, 1.0, 2.0, 3.0]))
    np.testing.assert_allclose(lz, [1.0, 0.0, 0.0, 0.0], atol=1e-15)
    assert R.w_lanczos(np.array([0.5]))[0] == pytest.approx(
        math.sin(math.pi / 2) * math.sin(math.pi / 6) / (math.pi ** 2 * 0.25 / 3))


# ---------------------------------------------------------------------------
# scalar reference twin
# ---------------------------------------------------------------------------

def scalar_resample(src, sx, sy, method, xscale=1.0, yscale=1.0):
    kern, radius = R.KERNELS[method]
    xscale, yscale = min(xscale, 1.0), min(yscale, 1.0)
    rx = int(math.ceil(radius / xscale)) if xscale < 1.0 else radius
    ry = int(math.ceil(radius / yscale)) if yscale < 1.0 else radius
    H, W = src.shape
    out = np.zeros(sx.shape)
    for idx in np.ndindex(sx.shape):
        X, Y = sx[idx], sy[idx]
        isx = int(np.floor(X - 0.5)); isy = int(np.floor(Y - 0.5))
        dx = X - 0.5 - isx; dy = Y - 0.5 - isy
        imin = 1 - rx
        if isx + imin < 0:
            imin = -isx
        imax = rx
        if isx + imax >= W - 1:
            imax = W - 1 - isx
        jmin = 1 - ry
        if isy + jmin < 0:
            jmin = -isy
        jmax = ry
        if isy + jmax >= H - 1:
            jmax = H - 1 - isy
        acc = 0.0; wh = 0.0; wv = 0.0
        for i in range(imin, imax + 1):
            wh += float(kern(np.array([(i - dx) * xscale]))[0])
        for j in range(jmin, jmax + 1):
            wy = float(kern(np.array([(j - dy) * yscale]))[0])
            wv += wy
            for i in range(imin, imax + 1):
                wx = float(kern(np.array([(i - dx) * xscale]))[0])
                acc += wx * wy * src[isy + j, isx + i]
        out[idx] = acc / (wh * wv)
    return out


RNG_SRC = ((np.arange(20 * 16).reshape(20, 16) * 37) % 211).astype(np.uint8)


@pytest.mark.parametrize("method", ["bilinear", "cubic", "cubicspline", "lanczos"])
def test_resample_grid_matches_scalar(method):
    rng = np.random.RandomState(7)
    sx = rng.uniform(3.5, 12.5, size=(6, 5))
    sy = rng.uniform(3.5, 16.5, size=(6, 5))
    want = scalar_resample(RNG_SRC.astype(np.float64), sx, sy, method)
    got, inv = R.resample_grid(RNG_SRC, 0, 0, 16, 20, sx, sy, method)
    assert not inv.any()
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("method", ["bilinear", "cubic"])
def test_resample_downscale_matches_scalar(method):
    """xscale < 1 expands the kernel radius (gdalwarpkernel.cpp:944-949)."""
    rng = np.random.RandomState(11)
    sx = rng.uniform(6.0, 10.0, size=(4, 4))
    sy = rng.uniform(6.0, 14.0, size=(4, 4))
    want = scalar_resample(RNG_SRC.astype(np.float64), sx, sy, method, 0.5, 0.25)
    got, _ = R.resample_grid(RNG_SRC, 0, 0, 16, 20, sx, sy, method, 0.5, 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_resample_constant_preserved():
    src = np.full((12, 12), 77, dtype=np.uint8)
    sx, sy = np.meshgrid(np.linspace(0.2, 11.8, 9), np.linspace(0.2, 11.8, 9))
    for method in R.KERNELS:
        got, inv = R.resample_grid(src, 0, 0, 12, 12, sx, sy, method)
        np.testing.assert_allclose(got[~inv], 77.0, rtol=1e-12)


def test_nearest_rule():
    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    sx = np.array([[0.0, 0.999, 1.0, 3.9999]])
    sy = np.array([[0.0, 0.0, 2.0, 3.0]])
    got, inv = R.resample_grid(src, 0, 0, 4, 4, sx, sy, "nearest")
    assert got.tolist() == [[0.0, 0.0, 9.0, 15.0]]
    assert not inv.any()
    # negative coords are invalid (GWKCheckAndComputeSrcOffsets :3838)
    got, inv = R.resample_grid(src, 0, 0, 4, 4,
                               np.array([[-0.2]]), np.array([[1.0]]), "nearest")
    assert inv.all()


def test_average_box():
    src = np.arange(16, dtype=np.float64).reshape(4, 4)
    val, inv = R.average_grid(src, 0, 0, 4, 4,
                              np.array([[0.0]]), np.array([[0.0]]),
                              np.array([[2.0]]), np.array([[2.0]]))
    assert val[0, 0] == pytest.approx((0 + 1 + 4 + 5) / 4)


# ---------------------------------------------------------------------------
# distributed warp operator
# ---------------------------------------------------------------------------

SRC_META = M.RasterMeta("src", 100, 80, gt=(500.0, 2.0, 0.0, 900.0, 0.0, -2.0),
                        block=32)
SRC_ARR = ((np.arange(80 * 100).reshape(80, 100) * 53) % 229).astype(np.uint8)


@pytest.fixture(scope="module")
def src_tiles(spark):
    return M.from_array(spark, SRC_ARR, SRC_META).cache()


def test_warp_identity(spark, src_tiles):
    dst_meta = M.RasterMeta("dst", 100, 80, gt=SRC_META.gt, block=32)
    for method in ("nearest", "bilinear"):
        got = M.to_array(R.warp(src_tiles, SRC_META, dst_meta, method), dst_meta)
        np.testing.assert_array_equal(got, SRC_ARR)


@pytest.mark.parametrize("method", ["bilinear", "cubic", "lanczos"])
def test_warp_upscale_2x_matches_direct(spark, src_tiles, method):
    """2x upscale over a sub-extent, distributed vs one direct numpy call."""
    dst_meta = M.RasterMeta("up", 120, 100,
                            gt=(520.0, 1.0, 0.0, 880.0, 0.0, -1.0), block=48)
    got = M.to_array(R.warp(src_tiles, SRC_META, dst_meta, method), dst_meta)
    DX, DY = np.meshgrid(np.arange(120) + 0.5, np.arange(100) + 0.5)
    f = R.affine_src_from_dst(SRC_META, dst_meta)
    sx, sy = f(DX, DY)
    val, inv = R.resample_grid(SRC_ARR, 0, 0, 100, 80, sx, sy, method)
    want = R._round_cast(val, "uint8", inv, 0)
    np.testing.assert_array_equal(got, want)


def test_warp_downscale_average(spark, src_tiles):
    dst_meta = M.RasterMeta("down", 25, 20,
                            gt=(500.0, 8.0, 0.0, 900.0, 0.0, -8.0), block=16)
    got = M.to_array(R.warp(src_tiles, SRC_META, dst_meta, "average"), dst_meta)
    # each dst pixel = mean of a 4x4 src box
    want = SRC_ARR.reshape(20, 4, 25, 4).mean(axis=(1, 3))
    np.testing.assert_array_equal(got, np.floor(want + 0.5).astype(np.uint8))


def test_warp_block_independence(spark):
    """Identical output for different src/dst block sizes."""
    dst_meta_a = M.RasterMeta("d", 60, 50, gt=(510.0, 1.7, 0.0, 890.0, 0.0, -1.7),
                              block=64)
    dst_meta_b = M.RasterMeta("d", 60, 50, gt=(510.0, 1.7, 0.0, 890.0, 0.0, -1.7),
                              block=17)
    src_b_meta = M.RasterMeta("src", 100, 80, gt=SRC_META.gt, block=53)
    a = M.to_array(R.warp(M.from_array(spark, SRC_ARR, SRC_META), SRC_META,
                          dst_meta_a, "cubic"), dst_meta_a)
    b = M.to_array(R.warp(M.from_array(spark, SRC_ARR, src_b_meta), src_b_meta,
                          dst_meta_b, "cubic"), dst_meta_b)
    np.testing.assert_array_equal(a, b)


def test_warp_reprojection_style_transform(spark, src_tiles):
    """Non-affine picklable transform (curvilinear), autotest-tolerance
    check: warp forward then back, interior maxdiff small."""
    dst_meta = M.RasterMeta("curvy", 100, 80, gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
                            block=32)

    def curvy(px, py):  # mild sinusoidal distortion, pickled by value
        return px + 2.0 * np.sin(py / 15.0), py + 1.5 * np.cos(px / 20.0)

    got = M.to_array(R.warp(src_tiles, SRC_META, dst_meta, "bilinear",
                            src_from_dst=curvy, scale=(1.0, 1.0)), dst_meta)
    DX, DY = np.meshgrid(np.arange(100) + 0.5, np.arange(80) + 0.5)
    sx, sy = curvy(DX, DY)
    val, inv = R.resample_grid(SRC_ARR, 0, 0, 100, 80, sx, sy, "bilinear")
    want = R._round_cast(val, "uint8", inv, 0)
    # interior must match exactly; edge blocks may differ only in invalid px
    np.testing.assert_array_equal(got[5:-5, 5:-5], want[5:-5, 5:-5])


# ---------------------------------------------------------------------------
# GRA_Mode/Min/Max/Med/Q1/Q3 (GWKAverageOrModeThread reference twins)
# ---------------------------------------------------------------------------

def ref_aom(arr, oh, ow, fy, fx, method):
    """Literal sequential port of the GWKAverageOrMode box loops
    (gdalwarpkernel.cpp:4740-5025) for an integer fy x fx downsample."""
    H, W = arr.shape
    out = np.zeros((oh, ow))
    q = {"med": 0.5, "q1": 0.25, "q3": 0.75}.get(method)
    for dy in range(oh):
        for dx in range(ow):
            x0, x1 = dx * fx, min((dx + 1) * fx, W)
            y0, y1 = dy * fy, min((dy + 1) * fy, H)
            vals = [arr[y, x] for y in range(y0, y1) for x in range(x0, x1)]
            if method == "min":
                out[dy, dx] = min(vals)
            elif method == "max":
                out[dy, dx] = max(vals)
            elif method == "mode":
                counts, winner, maxc = {}, None, 0
                for v in vals:
                    k = int(v) if arr.dtype.kind in "ui" else np.float32(v)
                    counts[k] = counts.get(k, 0) + 1
                    if counts[k] > maxc:
                        maxc, winner = counts[k], k
                out[dy, dx] = winner
            else:
                srt = sorted(float(v) for v in vals)
                out[dy, dx] = srt[math.ceil(q * len(srt) - 1)]
    return out


@pytest.mark.parametrize("method", ["mode", "min", "max", "med", "q1", "q3"])
def test_warp_aom_matches_reference_twin(spark, src_tiles, method):
    """4x downsample (uneven 25x20 output over the 100x80 source)."""
    dst_meta = M.RasterMeta("aom", 25, 20,
                            gt=(500.0, 8.0, 0.0, 900.0, 0.0, -8.0), block=16)
    got = M.to_array(R.warp(src_tiles, SRC_META, dst_meta, method), dst_meta)
    want = ref_aom(SRC_ARR, 20, 25, 4, 4, method)
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_warp_mode_tie_rule(spark):
    """2x2 boxes engineered so ties exercise the first-to-attain rule."""
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 3, size=(16, 16)).astype(np.uint8)  # many ties
    meta = M.RasterMeta("t", 16, 16, gt=(0.0, 1.0, 0.0, 16.0, 0.0, -1.0), block=8)
    dstm = M.RasterMeta("t2", 8, 8, gt=(0.0, 2.0, 0.0, 16.0, 0.0, -2.0), block=8)
    got = M.to_array(R.warp(M.from_array(spark, arr, meta), meta, dstm, "mode"), dstm)
    want = ref_aom(arr, 8, 8, 2, 2, "mode")
    np.testing.assert_array_equal(got, want.astype(np.uint8))


def test_warp_mode_float_path(spark):
    """Float rasters take the Fmode float32 value-list path."""
    rng = np.random.RandomState(7)
    arr = rng.choice([0.5, 1.25, 2.75], size=(12, 12)).astype(np.float64)
    meta = M.RasterMeta("f", 12, 12, gt=(0.0, 1.0, 0.0, 12.0, 0.0, -1.0),
                        dtype="float64", block=8)
    dstm = M.RasterMeta("f2", 6, 6, gt=(0.0, 2.0, 0.0, 12.0, 0.0, -2.0),
                        dtype="float64", block=8)
    got = M.to_array(R.warp(M.from_array(spark, arr, meta), meta, dstm, "mode"), dstm)
    want = ref_aom(arr, 6, 6, 2, 2, "mode")
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# cutline + src nodata (gdalwarp -cutline / -srcnodata, round 3)
# ---------------------------------------------------------------------------

def _triangle_wkb(a, b, c):
    from gdal_spark.functions import geometry as G
    return G.encode_polygon([np.array([a, b, c, a], dtype=float)])


def _point_in_tri(px, py, a, b, c):
    d1 = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
    d2 = (c[0] - b[0]) * (py - b[1]) - (c[1] - b[1]) * (px - b[0])
    d3 = (a[0] - c[0]) * (py - c[1]) - (a[1] - c[1]) * (px - c[0])
    return ((d1 > 0) & (d2 > 0) & (d3 > 0)) | ((d1 < 0) & (d2 < 0) & (d3 < 0))


def test_warp_cutline_masks_outside(spark, src_tiles):
    """autotest/alg/cutline.py analog: identity warp with a triangular
    cutline — inside pixels identical to the source, outside nodata(0),
    twin = an independent sign-test point-in-triangle mask."""
    dst_meta = M.RasterMeta("cut", 100, 80, gt=SRC_META.gt, block=32)
    a, b, c = (540.3, 761.7), (687.1, 777.9), (610.7, 883.3)
    wkb = _triangle_wkb(a, b, c)
    got = M.to_array(R.warp(src_tiles, SRC_META, dst_meta, "nearest",
                            cutline=wkb), dst_meta)
    DX, DY = np.meshgrid(np.arange(100) + 0.5, np.arange(80) + 0.5)
    gx = SRC_META.gt[0] + DX * SRC_META.gt[1]
    gy = SRC_META.gt[3] + DY * SRC_META.gt[5]
    inside = _point_in_tri(gx, gy, a, b, c)
    assert inside.any() and (~inside).any()
    np.testing.assert_array_equal(got[inside], SRC_ARR[inside])
    assert (got[~inside] == 0).all()


def test_warp_cutline_prunes_blocks(spark, src_tiles):
    """Blocks wholly outside the cutline envelope are never emitted (the
    sparse-raster convention reads them as nodata) — the scale path for
    small cutlines over large rasters."""
    dst_meta = M.RasterMeta("cutp", 100, 80, gt=SRC_META.gt, block=32)
    a, b, c = (510.3, 880.7), (550.1, 885.9), (530.7, 897.3)  # one corner
    out = R.warp(src_tiles, SRC_META, dst_meta, "nearest",
                 cutline=_triangle_wkb(a, b, c))
    blocks = {(r["bx"], r["by"]) for r in out.select("bx", "by").collect()}
    assert blocks == {(0, 0)}


def test_warp_src_nodata_nearest_and_bilinear(spark):
    """-srcnodata semantics: nodata source pixels get zero weight; a dst
    pixel whose entire support is nodata becomes dst nodata; bilinear
    blends are renormalized over the valid pixels only."""
    arr = np.full((8, 8), 100, dtype=np.uint8)
    arr[:, 4:] = 255  # nodata half
    meta = M.RasterMeta("nd", 8, 8, gt=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0), block=8)
    tiles = M.from_array(spark, arr, meta)
    dst = M.RasterMeta("ndd", 8, 8, gt=meta.gt, block=8, nodata=7.0)
    got_n = M.to_array(R.warp(tiles, meta, dst, "nearest", src_nodata=255.0),
                       dst, fill=7)
    assert (got_n[:, :4] == 100).all() and (got_n[:, 4:] == 7).all()
    got_b = M.to_array(R.warp(tiles, meta, dst, "bilinear", src_nodata=255.0),
                       dst, fill=7)
    # renormalized blend: valid half keeps its value right up to the edge
    assert (got_b[:, :4] == 100).all() and (got_b[:, 4:] == 7).all()
    with pytest.raises(ValueError):
        R.warp(tiles, meta, dst, "average", src_nodata=255.0)


def test_warp_dstalpha_blend_ramp(spark):
    """dst_alpha with src_cutline + blend: alpha is the 255-scaled blend
    density — 255 deep inside the cutline, 0 well outside, graded in the
    blend band (GDALWarpDstAlphaMasker density semantics)."""
    from gdal_spark.functions import geometry as G
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import resample as RS
    src = np.full((16, 16), 100, dtype=np.uint8)
    meta = RM.RasterMeta("daramp", 16, 16, gt=(0, 1, 0, 16, 0, -1),
                         dtype="uint8", block=8)
    # identity warp, cutline square [4,12)x[4,12) in pixel coords
    cl = G.encode_polygon([np.array(
        [[4.0, 4.0], [12.0, 4.0], [12.0, 12.0], [4.0, 12.0], [4.0, 4.0]])])
    dst = RM.RasterMeta("daout", 16, 16, gt=(0, 1, 0, 16, 0, -1),
                        dtype="uint8", block=8)
    out = RS.warp(RM.from_array(spark, src, meta), meta, dst,
                  method="bilinear", src_cutline=cl, cutline_blend=2.0,
                  dst_alpha=1)
    alpha = RM.to_array(out, dst, band=1)
    assert alpha[8, 8] == 255          # deep inside
    assert alpha[0, 0] == 0            # far outside
    ramp = alpha[(alpha > 0) & (alpha < 255)]
    assert ramp.size > 0               # the blend band is graded
    data = RM.to_array(out, dst, band=0)
    assert data[8, 8] == 100


def test_warp_srcalpha(spark):
    """-srcalpha (GDALWarpSrcAlphaMasker): the source alpha band scales
    per-pixel density by alpha/255 — fully transparent source pixels
    contribute nothing (dst stays nodata), half-transparent pixels blend
    toward nodata, opaque pixels copy through; the alpha band itself is
    not warped as data."""
    from gdal_spark.raster import model as RM
    from gdal_spark.raster import resample as RS
    data = np.full((16, 16), 200, dtype=np.uint8)
    alpha = np.zeros((16, 16), dtype=np.uint8)
    alpha[:, 8:] = 255         # right half opaque
    alpha[:, 4:8] = 128        # a half-transparent strip
    meta = RM.RasterMeta("sa", 16, 16, gt=(0, 1, 0, 16, 0, -1),
                         dtype="uint8", block=8)
    tiles = RM.from_array(spark, data, meta, band=0).unionAll(
        RM.from_array(spark, alpha, meta, band=1))
    dst = RM.RasterMeta("saout", 16, 16, gt=(0, 1, 0, 16, 0, -1),
                        dtype="uint8", block=8)
    out = RS.warp(tiles, meta, dst, method="nearest", src_alpha=1,
                  dst_alpha=2)
    got = RM.to_array(out, dst, band=0)
    assert (got[:, :4] == 0).all()                 # transparent -> nodata
    # d = 128/255 = 0.50196: v*d + 0*(1-d) = 200*0.50196 -> 100
    assert (got[:, 4:8] == 100).all()
    assert (got[:, 8:] == 200).all()               # opaque copies through
    a = RM.to_array(out, dst, band=2)              # dst alpha = 255*density
    assert (a[:, :4] == 0).all()
    assert (a[:, 4:8] == 128).all()
    assert (a[:, 8:] == 255).all()
    # the alpha band is consumed, not warped: only bands 0 and 2 emitted
    bands = {r["band"] for r in out.select("band").distinct().collect()}
    assert bands == {0, 2}
    with pytest.raises(ValueError, match="exclusive"):
        RS.warp(tiles, meta, dst, method="nearest", src_alpha=1,
                src_cutline=b"\x00")
