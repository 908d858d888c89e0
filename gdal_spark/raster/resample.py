"""Distributed warp / resample with the reference kernel weight formulas.

Reference: GDALWarpKernel (gdal/alg/gdalwarpkernel.cpp). Weight functions
re-implemented exactly:

- bilinear  ``1-|x|, |x|<=1``                       (gdalwarpkernel.cpp:2313)
- cubic     Catmull-Rom a=-0.5 piecewise            (:2351-2370)
- cubicspline B-spline (B,C)=(1,0)                  (:2336+)
- lanczos   r=3 ``sin(πx)sin(πx/3)/(π²x²/3)``       (:2274-2288)

Sampling geometry (GWKResampleNoMasksT, :3055-3140): for dst pixel center
transformed to source coords, ``iSrc = floor(src - 0.5)``,
``delta = src - 0.5 - iSrc``; taps i ∈ [1-r, r] weighted
``w((i - delta) * scale)`` with scale = dst/src density clamped to ≤1 and
radius expanded ``ceil(r/scale)`` when downsampling (:944-949); result
normalized by the (axis-separable) sum of in-bounds weights; integer
outputs round half-up and clamp (GWKRoundValueT/GWKClampValueT :1156-1196).
Nearest uses ``trunc(src + 1e-10)`` (GWKCheckAndComputeSrcOffsets :3844).
Average resampling boxes over the dst pixel's source footprint and takes
the mean (GWKAverageOrMode :4522).

Spark shape (the ChunkAndWarpImage analog, gdalwarpoperation.cpp:534-536 —
but chunks are Spark partitions instead of a 64 MB recursion): dst block
keys → per-block source window via a coarse transform lattice (the
ApproxTransformer trick, gdaltransformer.cpp:2625-3010) → explode to
overlapping src block keys → shuffle join with src blocks → groupBy dst
block → numpy gather kernel. Zero per-row Python; one shuffle keyed by
dst block.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

# ---------------------------------------------------------------------------
# weight kernels (exact reference formulas)
# ---------------------------------------------------------------------------


def w_bilinear(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax <= 1.0, 1.0 - ax, 0.0)


def w_cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    x2 = x * x
    r = np.where(ax <= 1.0, x2 * (1.5 * ax - 2.5) + 1.0,
                 x2 * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0)
    return np.where(ax <= 2.0, r, 0.0)


def w_bspline(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    inner = (3.0 * ax ** 3 - 6.0 * ax ** 2 + 4.0) / 6.0
    outer = ((2.0 - ax) ** 3) / 6.0
    return np.where(ax < 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def w_lanczos(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        pix = math.pi * x
        r = np.sin(pix) * np.sin(pix / 3.0) / (pix * pix / 3.0)
    return np.where(x == 0.0, 1.0, np.where(ax <= 3.0, r, 0.0))


KERNELS: dict[str, tuple[Callable, int]] = {
    "bilinear": (w_bilinear, 1),
    "cubic": (w_cubic, 2),
    "cubicspline": (w_bspline, 2),
    "lanczos": (w_lanczos, 3),
}


def _round_cast(val: np.ndarray, dtype: str, nodata_mask=None, nodata=0.0):
    out = val
    kind = np.dtype(dtype).kind
    if kind in "ui":
        info = np.iinfo(dtype)
        out = np.clip(np.floor(val + 0.5), info.min, info.max)
    if nodata_mask is not None:
        out = np.where(nodata_mask, nodata, out)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# numpy gather over a source window
# ---------------------------------------------------------------------------

def resample_grid(src: np.ndarray, ox: int, oy: int, src_w: int, src_h: int,
                  sx: np.ndarray, sy: np.ndarray, method: str,
                  xscale: float = 1.0, yscale: float = 1.0,
                  nodata: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Sample ``src`` (a window of the global raster whose top-left global
    pixel is (ox, oy); global size (src_w, src_h)) at fractional source
    coords (sx, sy). Returns (float64 values, invalid_mask)."""
    if method == "nearest":
        ix = np.trunc(sx + 1e-10).astype(np.int64)
        iy = np.trunc(sy + 1e-10).astype(np.int64)
        invalid = (sx < 0) | (sy < 0) | (ix >= src_w) | (iy >= src_h)
        ixc = np.clip(ix - ox, 0, src.shape[1] - 1)
        iyc = np.clip(iy - oy, 0, src.shape[0] - 1)
        return src[iyc, ixc].astype(np.float64), invalid

    kern, radius = KERNELS[method]
    upsample = xscale >= 1.0 and yscale >= 1.0
    xscale = min(xscale, 1.0)
    yscale = min(yscale, 1.0)
    rx = int(math.ceil(radius / xscale)) if xscale < 1.0 else radius
    ry = int(math.ceil(radius / yscale)) if yscale < 1.0 else radius

    isx = np.floor(sx - 0.5).astype(np.int64)
    isy = np.floor(sy - 0.5).astype(np.int64)
    dx = sx - 0.5 - isx
    dy = sy - 0.5 - isy
    acc = np.zeros(sx.shape, dtype=np.float64)
    wacc = np.zeros(sx.shape, dtype=np.float64)
    srcf = src.astype(np.float64)
    for j in range(1 - ry, ry + 1):
        wy = kern((j - dy) * yscale)
        gy = isy + j
        vy = (gy >= 0) & (gy <= src_h - 1)
        gyc = np.clip(gy - oy, 0, src.shape[0] - 1)
        for i in range(1 - rx, rx + 1):
            wx = kern((i - dx) * xscale)
            gx = isx + i
            vx = (gx >= 0) & (gx <= src_w - 1)
            gxc = np.clip(gx - ox, 0, src.shape[1] - 1)
            w = np.where(vx & vy, wx * wy, 0.0)
            acc += w * srcf[gyc, gxc]
            wacc += w
    invalid = wacc == 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        val = acc / wacc
    if method == "cubic" and upsample:
        # GWKCubicResampleNoMasks4SampleT (gdalwarpkernel.cpp:2223-2234):
        # in the non-downsampling path, any dst pixel whose 4x4 stencil
        # leaves the source raster is resampled BILINEARLY instead of with
        # weight-normalized clipped cubic taps.
        border = ((isx - 1 < 0) | (isx + 2 > src_w - 1) |
                  (isy - 1 < 0) | (isy + 2 > src_h - 1)) & ~invalid
        if border.any():
            bval, binv = resample_grid(src, ox, oy, src_w, src_h,
                                       sx[border], sy[border], "bilinear",
                                       nodata=nodata)
            val = val.copy()
            val[border] = bval
            inv2 = invalid.copy()
            inv2[border] = binv
            invalid = inv2
    return np.where(invalid, nodata, val), invalid


def average_grid(src: np.ndarray, ox: int, oy: int, src_w: int, src_h: int,
                 sx0: np.ndarray, sy0: np.ndarray,
                 sx1: np.ndarray, sy1: np.ndarray,
                 nodata: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """GRA_Average: mean of source pixels in the dst pixel's footprint box
    [sx0, sx1) × [sy0, sy1) (GWKAverageOrMode :4522 index rules)."""
    xmin = np.maximum(np.floor(sx0 + 1e-10).astype(np.int64), 0)
    xmax = np.minimum(np.ceil(sx1 - 1e-10).astype(np.int64), src_w)
    ymin = np.maximum(np.floor(sy0 + 1e-10).astype(np.int64), 0)
    ymax = np.minimum(np.ceil(sy1 - 1e-10).astype(np.int64), src_h)
    # integral image over the local window for O(1) box sums
    local = src.astype(np.float64)
    ii = np.zeros((local.shape[0] + 1, local.shape[1] + 1))
    ii[1:, 1:] = local.cumsum(0).cumsum(1)
    lx0 = np.clip(xmin - ox, 0, local.shape[1])
    lx1 = np.clip(xmax - ox, 0, local.shape[1])
    ly0 = np.clip(ymin - oy, 0, local.shape[0])
    ly1 = np.clip(ymax - oy, 0, local.shape[0])
    cnt = (lx1 - lx0) * (ly1 - ly0)
    tot = ii[ly1, lx1] - ii[ly0, lx1] - ii[ly1, lx0] + ii[ly0, lx0]
    invalid = cnt <= 0
    with np.errstate(divide="ignore", invalid="ignore"):
        val = tot / cnt
    return np.where(invalid, nodata, val), invalid


def cutline_density(cutline_px: bytes, ox: int, oy: int, h: int, w: int,
                    blend: float = 0.0) -> np.ndarray:
    """Source validity density for a cutline, over the source window
    [ox, ox+w) × [oy, oy+h) in *source pixel* coordinates.

    GDALWarpCutlineMasker (gdal/alg/gdalcutline.cpp:318-420): the polygon
    is scanline-rasterized into a byte mask; with no blend distance the
    density is that mask. BlendMaskGenerator (:45-230) then ramps pixels
    within ``blend`` of the polygon boundary: distance is measured from
    the pixel center to the boundary treated as a multilinestring, and
    density = 0.5 + (d/blend)/2 inside, 0.5 - (d/blend)/2 outside.
    """
    from gdal_spark.functions import geometry as G
    from gdal_spark.raster.rasterize import fill_polygon_mask
    rings = [np.asarray(r, dtype=np.float64)
             for part in G.decode_polygons(cutline_px) for r in part]
    dens = fill_polygon_mask(rings, oy, oy + h, ox, ox + w).astype(np.float64)
    if blend <= 0.0:
        return dens
    segs = []
    for r in rings:
        rr = r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[:1]])
        segs.append(np.stack([rr[:-1], rr[1:]], axis=1))
    S = np.concatenate(segs)
    allpts = np.concatenate(rings)
    ex0, ey0 = allpts.min(0)
    ex1, ey1 = allpts.max(0)
    # envelope band (gdalcutline.cpp:160-165 iXMin..iYMax)
    jx0 = max(0, int(math.floor(ex0 - blend - ox)))
    jx1 = min(w, int(math.ceil(ex1 + blend - ox)))
    jy0 = max(0, int(math.floor(ey0 - blend - oy)))
    jy1 = min(h, int(math.ceil(ey1 + blend - oy)))
    if jx0 >= jx1 or jy0 >= jy1:
        return dens
    Y, X = np.mgrid[jy0:jy1, jx0:jx1]
    P = np.stack([(X + ox + 0.5).ravel(), (Y + oy + 0.5).ravel()], axis=1)
    A, B = S[:, 0], S[:, 1]
    AB = B - A
    ab2 = (AB * AB).sum(1)
    ab2 = np.where(ab2 == 0.0, 1.0, ab2)
    dmin = np.empty(len(P))
    step = max(1, 4_000_000 // max(len(S), 1))
    for s in range(0, len(P), step):
        Pc = P[s:s + step]
        t = np.clip(((Pc[:, None, :] - A[None]) * AB[None]).sum(2)
                    / ab2[None], 0.0, 1.0)
        proj = A[None] + t[..., None] * AB[None]
        dmin[s:s + step] = np.sqrt(
            ((Pc[:, None, :] - proj) ** 2).sum(2)).min(1)
    dist = dmin.reshape(jy1 - jy0, jx1 - jx0)
    sub = dens[jy0:jy1, jx0:jx1]
    ratio = np.where(sub > 0.0, 0.5 + (dist / blend) * 0.5,
                     0.5 - (dist / blend) * 0.5)
    # the reference accumulates the mask in float32 (pafValidityMask is
    # float*; `*= (float)dfRatio`, gdalcutline.cpp:218) — the precision
    # loss is observable in rounded Byte output, so replicate it
    dens[jy0:jy1, jx0:jx1] = np.where(dist <= blend,
                                      ratio.astype(np.float32), sub)
    return dens


AOM_METHODS = ("mode", "min", "max", "med", "q1", "q3")
_QUANT = {"med": 0.5, "q1": 0.25, "q3": 0.75}


def _mode_scan(vals: np.ndarray):
    """GWKAverageOrMode mode tie rule (gdalwarpkernel.cpp:4803-4909): the
    winner is the first value in scan order to attain the final maximum
    count (`++count > max` updates the winner only on strict increase)."""
    uniq, inv, counts = np.unique(vals, return_inverse=True, return_counts=True)
    m = counts.max()
    tied = np.flatnonzero(counts == m)
    if len(tied) == 1:
        return uniq[tied[0]]
    best_pos, best_v = None, None
    for t in tied:
        pos = np.flatnonzero(inv == t)[m - 1]  # where the m-th occurrence lands
        if best_pos is None or pos < best_pos:
            best_pos, best_v = pos, uniq[t]
    return best_v


def aom_grid(src: np.ndarray, ox: int, oy: int, src_w: int, src_h: int,
             sx0: np.ndarray, sy0: np.ndarray,
             sx1: np.ndarray, sy1: np.ndarray, method: str,
             nodata: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """GRA_Mode/Min/Max/Med/Q1/Q3 over the dst pixel's source footprint box
    (GWKAverageOrModeThread, gdalwarpkernel.cpp:4740-5025): box indices
    floor(sx0+1e-10)..ceil(sx1-1e-10) clamped, degenerate boxes expanded by
    one; quantile index ceil(q*n - 1) on the sorted box; mode follows the
    reference's first-to-attain tie rule (integer histogram for
    byte/int16/uint16, float32 value list otherwise)."""
    xmin = np.maximum(np.floor(sx0 + 1e-10).astype(np.int64), 0)
    xmax = np.minimum(np.ceil(sx1 - 1e-10).astype(np.int64), src_w)
    ymin = np.maximum(np.floor(sy0 + 1e-10).astype(np.int64), 0)
    ymax = np.minimum(np.ceil(sy1 - 1e-10).astype(np.int64), src_h)
    xmax = np.where((xmin == xmax) & (xmax < src_w), xmax + 1, xmax)
    ymax = np.where((ymin == ymax) & (ymax < src_h), ymax + 1, ymax)
    lx0 = xmin - ox
    ly0 = ymin - oy
    bw = xmax - xmin
    bh = ymax - ymin
    h, w = sx0.shape
    out = np.full((h, w), np.nan)
    q = _QUANT.get(method)

    ubw = np.unique(bw[bw > 0])
    ubh = np.unique(bh[bh > 0])
    if (method != "mode" and len(ubw) == 1 and len(ubh) == 1
            and (bw > 0).all() and (bh > 0).all()):
        # uniform boxes (the affine fast path): one vectorized gather
        bw0, bh0 = int(ubw[0]), int(ubh[0])
        YY = np.clip(ly0[:, :, None, None] + np.arange(bh0)[None, None, :, None],
                     0, src.shape[0] - 1)
        XX = np.clip(lx0[:, :, None, None] + np.arange(bw0)[None, None, None, :],
                     0, src.shape[1] - 1)
        wins = src.astype(np.float64)[YY, XX].reshape(h, w, bh0 * bw0)
        if method == "min":
            out = wins.min(axis=2)
        elif method == "max":
            out = wins.max(axis=2)
        else:
            wins.sort(axis=2)
            out = wins[:, :, int(math.ceil(q * bh0 * bw0 - 1))]
        return out, np.zeros((h, w), dtype=bool)

    int_mode = src.dtype.kind in "ui" and src.dtype.itemsize <= 2
    for yy in range(h):
        for xx in range(w):
            if bw[yy, xx] <= 0 or bh[yy, xx] <= 0:
                continue
            box = src[ly0[yy, xx]:ly0[yy, xx] + bh[yy, xx],
                      lx0[yy, xx]:lx0[yy, xx] + bw[yy, xx]].ravel()
            if box.size == 0:
                continue
            if method == "min":
                out[yy, xx] = box.min()
            elif method == "max":
                out[yy, xx] = box.max()
            elif method == "mode":
                vals = box if int_mode else box.astype(np.float32)
                out[yy, xx] = _mode_scan(vals)
            else:
                srt = np.sort(box.astype(np.float64))
                out[yy, xx] = srt[int(math.ceil(q * len(srt) - 1))]
    invalid = np.isnan(out)
    return np.where(invalid, nodata, out), invalid


# ---------------------------------------------------------------------------
# distributed warp
# ---------------------------------------------------------------------------

def affine_src_from_dst(src_meta: RasterMeta, dst_meta: RasterMeta):
    """Default transform chain dst px → geo → src px (the
    GDALGenImgProjTransformer composition, gdaltransformer.cpp:974, with
    identical SRS)."""
    def f(px, py):
        x, y = dst_meta.pixel_to_geo(px, py)
        return src_meta.geo_to_pixel(x, y)
    return f


def warp(src_tiles: DataFrame, src_meta: RasterMeta, dst_meta: RasterMeta,
         method: str = "bilinear",
         src_from_dst: Callable | None = None,
         scale: tuple[float, float] | None = None,
         lattice: int = 8,
         dst_window: tuple[int, int, int, int] | None = None,
         cutline: bytes | None = None,
         src_nodata: float | None = None,
         src_cutline: bytes | None = None,
         cutline_blend: float = 0.0,
         dst_alpha: int | None = None,
         src_alpha: int | None = None) -> DataFrame:
    """Warp ``src_tiles`` onto ``dst_meta``'s grid. ``src_from_dst`` maps
    arrays of dst pixel coords → src pixel coords (default: affine via the
    two geotransforms); it must be picklable and numpy-vectorized.

    ``scale``: (xscale, yscale) dst/src pixel-density ratio used by the
    kernel (GDAL dfXScale, :906). Defaults to the exact geotransform ratio
    for affine warps — global and partition-independent — and to a
    per-block lattice estimate for custom transforms.

    ``cutline``: WKB polygon in dst georeferenced coords (gdalwarp
    -cutline, gdal/alg/gdalcutline.cpp:45): only dst pixels whose center
    falls inside the polygon receive output; everything else is nodata.
    Dst blocks wholly outside the cutline envelope are pruned *before*
    the source-block shuffle join (no tiles emitted — the engine's sparse
    convention reads absent blocks as nodata), so a small cutline over a
    world-size raster only processes the covered blocks.

    ``src_nodata``: per-band source nodata (gdalwarp -srcnodata,
    gdal/alg/gdalwarper.cpp:364 GDALWarpNoDataMasker): source pixels
    equal to this value get zero kernel weight; the result is the
    density-normalized blend of valid pixels (dfDensity semantics), and
    a dst pixel with no valid source support becomes dst nodata.
    Supported for nearest and the convolution kernels.

    ``src_cutline`` + ``cutline_blend``: the reference's own cutline
    shape (GDALWarpCutlineMasker, gdal/alg/gdalcutline.cpp:318): a WKB
    polygon in *source pixel/line* coordinates becomes a per-source-pixel
    validity density (scanline polymask, blend-distance ramp), and dst
    values mix with INIT_DEST by that density per GWKSetPixelValue
    (gdalwarpkernel.cpp:1206-1270): d<0.0001 → dst stays nodata,
    d≥0.9999 → source value, else ``v*d + nodata*(1-d)``.
    Supported for nearest and the convolution kernels.

    ``dst_alpha``: band index for a gdalwarp -dstalpha output band:
    255·density in the dst dtype (GDALWarpDstAlphaMasker,
    gdal/alg/gdalwarper.cpp:573 — 255 where the pixel received a valid
    value, 0 where it stayed nodata, the blend-ramp density in between
    for ``src_cutline`` + ``cutline_blend``). The alpha tile is emitted
    from the band-0 gather group (per-band validity is identical: one
    scalar src_nodata, one cutline); dst blocks with no source support
    emit nothing — the sparse-raster convention reads them as 0
    (transparent), matching the masker.

    ``src_alpha``: band index of a source alpha band (gdalwarp
    -srcalpha, GDALWarpSrcAlphaMasker, gdal/alg/gdalwarper.cpp): the
    alpha block becomes per-source-pixel density ``alpha·(1/255)``
    clipped at 1.0 (float32 math, bit-matching the masker), then feeds
    the same density kernel as ``src_cutline``. The alpha band itself is
    not warped as data; alpha blocks join onto every data-band gather
    group by (bx, by). Supported for nearest and the convolution
    kernels; mutually exclusive with ``src_cutline``.
    """
    if src_from_dst is None:
        src_from_dst = affine_src_from_dst(src_meta, dst_meta)
        if scale is None:
            scale = (abs(src_meta.gt[1] / dst_meta.gt[1]),
                     abs(src_meta.gt[5] / dst_meta.gt[5]))
    if method not in KERNELS and method not in ("nearest", "average") \
            and method not in AOM_METHODS:
        raise ValueError(f"unsupported method {method!r}")
    if src_nodata is not None and method not in KERNELS \
            and method != "nearest":
        raise ValueError("src_nodata supported for nearest/kernel methods")
    if src_alpha is not None:
        if src_cutline is not None:
            raise ValueError("src_alpha and src_cutline are exclusive "
                             "(one density source, gdalwarper.cpp)")
        if method not in KERNELS and method != "nearest":
            raise ValueError("src_alpha supported for nearest/kernel methods")
    radius = KERNELS[method][1] if method in KERNELS else 0
    block = dst_meta.block
    sblock = src_meta.block
    sW, sH = src_meta.width, src_meta.height
    dW, dH = dst_meta.width, dst_meta.height
    nbx, nby = dst_meta.n_block_x, dst_meta.n_block_y
    snbx, snby = src_meta.n_block_x, src_meta.n_block_y
    dtype, out_id = dst_meta.dtype, dst_meta.raster_id
    src_dtype = src_meta.dtype  # source blocks decode in THEIR dtype (may
    # differ from dst: gdal_translate -ot / warp -ot dtype conversion)
    nodata = dst_meta.nodata if dst_meta.nodata is not None else 0.0

    spark = src_tiles.sparkSession
    if dst_window is not None:
        # bound key generation to the blocks covering the area of interest
        # (a zoom-z world grid is 4^z blocks — enumerate only the extent)
        wx0, wy0, wx1, wy1 = dst_window
        nwx = wx1 - wx0 + 1
        keys = spark.range(nwx * (wy1 - wy0 + 1)).select(
            (F.col("id") % nwx + wx0).cast("int").alias("dbx"),
            (F.col("id") / nwx + wy0).cast("int").alias("dby"))
    else:
        keys = spark.range(nbx * nby).select(
            (F.col("id") % nbx).cast("int").alias("dbx"),
            (F.col("id") / nbx).cast("int").alias("dby"))
    dst_gt = dst_meta.gt
    if cutline is not None:
        # envelope prune in dst pixel space (cutline blocks only)
        from gdal_spark.functions.geometry import polygon_envelope
        ex0, ey0, ex1, ey1 = polygon_envelope(cutline)
        cpx = [dst_meta.geo_to_pixel(x, y)
               for x in (ex0, ex1) for y in (ey0, ey1)]
        bx_lo = int(math.floor(min(p[0] for p in cpx))) // block
        bx_hi = int(math.ceil(max(p[0] for p in cpx))) // block
        by_lo = int(math.floor(min(p[1] for p in cpx))) // block
        by_hi = int(math.ceil(max(p[1] for p in cpx))) // block
        keys = keys.filter((F.col("dbx") >= bx_lo) & (F.col("dbx") <= bx_hi)
                           & (F.col("dby") >= by_lo) & (F.col("dby") <= by_hi))

    win_schema = T.StructType([
        T.StructField("dbx", T.IntegerType()), T.StructField("dby", T.IntegerType()),
        T.StructField("sx0", T.DoubleType()), T.StructField("sy0", T.DoubleType()),
        T.StructField("sx1", T.DoubleType()), T.StructField("sy1", T.DoubleType()),
    ])

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ComputeSourceWindow analog (gdalwarpoperation.cpp:102): transform a
        # coarse lattice of the dst block, take the bbox, pad by the kernel
        # radius at the local scale + safety (the 21×21-sample trick of
        # GDALSuggestedWarpOutput2, gdaltransformer.cpp:340)
        for pdf in batches:
            rows = []
            for dbx, dby in zip(pdf["dbx"], pdf["dby"]):
                w = min(block, dW - dbx * block)
                h = min(block, dH - dby * block)
                lx = np.linspace(dbx * block, dbx * block + w, lattice)
                ly = np.linspace(dby * block, dby * block + h, lattice)
                LX, LY = np.meshgrid(lx, ly)
                sx, sy = src_from_dst(LX + 0.0, LY + 0.0)
                span_x = max((sx.max() - sx.min()) / max(w, 1), 1e-9)
                span_y = max((sy.max() - sy.min()) / max(h, 1), 1e-9)
                pad_x = (radius + 1) * max(span_x, 1.0) + 2
                pad_y = (radius + 1) * max(span_y, 1.0) + 2
                rows.append((int(dbx), int(dby),
                             float(sx.min() - pad_x), float(sy.min() - pad_y),
                             float(sx.max() + pad_x), float(sy.max() + pad_y)))
            yield pd.DataFrame(rows, columns=["dbx", "dby", "sx0", "sy0",
                                              "sx1", "sy1"])

    wins = keys.mapInPandas(windows, schema=win_schema)
    sb_lo_x = F.greatest(F.floor(F.col("sx0") / sblock), F.lit(0)).cast("int")
    sb_hi_x = F.least(F.floor(F.col("sx1") / sblock), F.lit(snbx - 1)).cast("int")
    sb_lo_y = F.greatest(F.floor(F.col("sy0") / sblock), F.lit(0)).cast("int")
    sb_hi_y = F.least(F.floor(F.col("sy1") / sblock), F.lit(snby - 1)).cast("int")
    pairs = (wins.filter((sb_lo_x <= sb_hi_x) & (sb_lo_y <= sb_hi_y))
             .withColumn("bx", F.explode(F.sequence(sb_lo_x, sb_hi_x)))
             .withColumn("by", F.explode(F.sequence(sb_lo_y, sb_hi_y))))
    if src_alpha is not None:
        # alpha blocks ride along with every data-band tile of the same
        # block key; absent alpha blocks read as 0 (fully transparent)
        alpha_tiles = (src_tiles.filter(F.col("band") == src_alpha)
                       .select("bx", "by", F.col("data").alias("adata")))
        data_tiles = src_tiles.filter(F.col("band") != src_alpha)
        joined = (pairs.join(data_tiles, on=["bx", "by"], how="inner")
                  .join(alpha_tiles, on=["bx", "by"], how="left"))
    else:
        joined = pairs.join(src_tiles, on=["bx", "by"], how="inner")

    def gather(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dbx, dby, band = int(key[0]), int(key[1]), int(key[2])
        dens = None  # graded validity (src_cutline blend), else binary ~inv
        w = min(block, dW - dbx * block)
        h = min(block, dH - dby * block)
        # mosaic the source window (clamped to raster bounds)
        sx0 = max(int(pdf["sx0"].iloc[0] // sblock) * sblock, 0)
        sy0 = max(int(pdf["sy0"].iloc[0] // sblock) * sblock, 0)
        sx1 = min((int(pdf["sx1"].iloc[0] // sblock) + 1) * sblock, sW)
        sy1 = min((int(pdf["sy1"].iloc[0] // sblock) + 1) * sblock, sH)
        buf = np.zeros((sy1 - sy0, sx1 - sx0), dtype=src_dtype)
        abuf = (np.zeros_like(buf, dtype=np.float32)
                if src_alpha is not None else None)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=src_dtype).reshape(r.h, r.w)
            qx, qy = r.bx * sblock - sx0, r.by * sblock - sy0
            buf[qy:qy + r.h, qx:qx + r.w] = sub
            if abuf is not None and r.adata is not None:
                asub = np.frombuffer(bytes(r.adata),
                                     dtype=src_dtype).reshape(r.h, r.w)
                abuf[qy:qy + r.h, qx:qx + r.w] = asub
        DX, DY = np.meshgrid(
            np.arange(dbx * block, dbx * block + w, dtype=np.float64) + 0.5,
            np.arange(dby * block, dby * block + h, dtype=np.float64) + 0.5)
        if method == "average" or method in AOM_METHODS:
            ex0, ey0 = src_from_dst(DX - 0.5, DY - 0.5)
            ex1, ey1 = src_from_dst(DX + 0.5, DY + 0.5)
            box = (buf, sx0, sy0, sW, sH,
                   np.minimum(ex0, ex1), np.minimum(ey0, ey1),
                   np.maximum(ex0, ex1), np.maximum(ey0, ey1))
            if method == "average":
                val, inv = average_grid(*box, nodata=nodata)
            else:
                val, inv = aom_grid(*box, method, nodata=nodata)
        else:
            sx, sy = src_from_dst(DX, DY)
            if scale is not None:
                xscale, yscale = min(scale[0], 1.0), min(scale[1], 1.0)
            else:
                # per-block dst/src density = GDAL's per-chunk dfXScale (:906)
                xscale = (sx.max() - sx.min()) / max(w - 1, 1)
                yscale = (sy.max() - sy.min()) / max(h - 1, 1)
                xscale = 1.0 if xscale <= 0 else min(1.0, 1.0 / xscale)
                yscale = 1.0 if yscale <= 0 else min(1.0, 1.0 / yscale)
            if src_nodata is not None and method != "nearest":
                # density-normalized valid-pixel blend (GDALWarpNoDataMasker
                # + dfDensity, gdalwarper.cpp:364 / gdalwarpkernel.cpp): run
                # the kernel on zero-filled data and on the validity mask,
                # then divide — weights of nodata pixels cancel exactly
                valid = buf != src_nodata
                vsum, inv = resample_grid(
                    np.where(valid, buf, 0).astype(buf.dtype), sx0, sy0,
                    sW, sH, sx, sy, method, xscale, yscale, nodata)
                dens, _ = resample_grid(valid.astype(np.float64), sx0, sy0,
                                        sW, sH, sx, sy, method,
                                        xscale, yscale, nodata)
                with np.errstate(divide="ignore", invalid="ignore"):
                    val = np.where(dens > 1e-9, vsum / dens, nodata)
                inv = inv | (dens <= 1e-9)
            elif src_cutline is not None or src_alpha is not None:
                if src_cutline is not None:
                    dens_win = cutline_density(src_cutline, sx0, sy0,
                                               sy1 - sy0, sx1 - sx0,
                                               cutline_blend)
                else:
                    # GDALWarpSrcAlphaMasker: alpha * (float)0.00392157,
                    # clipped at 1.0 (float32 math, bit-exact)
                    dens_win = np.minimum(
                        abuf * np.float32(0.00392157),
                        np.float32(1.0)).astype(np.float64)
                if method == "nearest":
                    val, inv = resample_grid(buf, sx0, sy0, sW, sH, sx, sy,
                                             method, xscale, yscale, nodata)
                    ix = np.trunc(sx + 1e-10).astype(np.int64)
                    iy = np.trunc(sy + 1e-10).astype(np.int64)
                    lx = np.clip(ix - sx0, 0, dens_win.shape[1] - 1)
                    ly = np.clip(iy - sy0, 0, dens_win.shape[0] - 1)
                    d = np.where(inv, 0.0, dens_win[ly, lx])
                    if src_nodata is not None:
                        inv = inv | (val == src_nodata)
                else:
                    # GWKResample (gdalwarpkernel.cpp:2700+): taps with
                    # zero density are skipped; value is the weight-
                    # normalized sum over surviving taps, density the
                    # weight-normalized mean of tap densities. Ratios of
                    # two same-kernel runs cancel the weight normalizer.
                    m = dens_win > 1e-9
                    vsum, inv = resample_grid(
                        np.where(m, buf, 0).astype(buf.dtype), sx0, sy0,
                        sW, sH, sx, sy, method, xscale, yscale, nodata)
                    msum, _ = resample_grid(m.astype(np.float64), sx0, sy0,
                                            sW, sH, sx, sy, method,
                                            xscale, yscale, nodata)
                    dsum, _ = resample_grid(dens_win, sx0, sy0, sW, sH,
                                            sx, sy, method, xscale, yscale,
                                            nodata)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        val = np.where(msum > 1e-9, vsum / msum, nodata)
                        d = np.where(msum > 1e-9, dsum / msum, 0.0)
                    inv = inv | (msum <= 1e-9)
                d = np.clip(d, 0.0, 1.0)
                val = np.where(d >= 0.9999, val,
                               val * d + nodata * (1.0 - d))
                inv = inv | (d < 0.0001)
                dens = d
            else:
                val, inv = resample_grid(buf, sx0, sy0, sW, sH, sx, sy,
                                         method, xscale, yscale, nodata)
                if src_nodata is not None:  # nearest: sampled value test
                    inv = inv | (val == src_nodata)
        if cutline is not None:
            # validity mask from the cutline polygon: pixel-center test
            # (gdalcutline.cpp:45 blend mask with zero blend distance)
            from gdal_spark.functions.geometry import PreparedPolygons
            gx = dst_gt[0] + DX * dst_gt[1] + DY * dst_gt[2]
            gy = dst_gt[3] + DX * dst_gt[4] + DY * dst_gt[5]
            prep = PreparedPolygons(ids=[0], wkbs=[cutline])
            pi, _g = prep.contains_batch(gx.ravel(), gy.ravel())
            mask = np.zeros(gx.size, dtype=bool)
            mask[pi] = True
            inv = inv | ~mask.reshape(gx.shape)
        out = _round_cast(val, dtype, inv, nodata)
        rows_out = [(out_id, band, dbx, dby, w, h, out.tobytes())]
        if dst_alpha is not None and band == 0:
            a = (np.where(inv, 0.0, 255.0) if dens is None else
                 np.where(inv, 0.0, dens * 255.0))
            alpha = _round_cast(a, dtype, np.zeros(a.shape, dtype=bool), 0.0)
            rows_out.append((out_id, int(dst_alpha), dbx, dby, w, h,
                             alpha.tobytes()))
        return pd.DataFrame(rows_out,
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    return (joined.groupBy("dbx", "dby", "band")
            .applyInPandas(gather, schema=TILE_SCHEMA))
