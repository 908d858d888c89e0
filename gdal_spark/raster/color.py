"""Color-table operators: median-cut palette, Floyd-Steinberg dither,
nearblack collar cleanup.

References:
- GDALComputeMedianCutPCT (gdal/alg/gdalmediancut.cpp:84-520): 5-bit RGB
  histogram, boxes split at the median along the longest axis (RED ≥
  GREEN ≥ BLUE tie priority), new (lower) box PREPENDED to the used list,
  entry color = ((min+max) << 3) / 2 per channel.
- GDALDitherRGB2PCT (gdal/alg/gdaldither.cpp:300-520): error diffusion
  with the reference's integer scheme — nSixth = nError/6 (C truncation),
  next-line error [i-1] += nSixth, [i+1] = nSixth, [i] += nError-5*nSixth,
  same-line carry 2*nSixth; nearest color by Manhattan distance, lowest
  index wins ties (FindNearestColor, gdaldither.cpp:600-628).
- nearblack (gdal/apps/nearblack.cpp:440-770): top-down then bottom-up
  passes, each row processed L→R (with per-column vertical counters) then
  R→L (horizontal only, iEnd exclusive); bottom-up horizontal check runs
  with nMaxNonBlack forced to 0.

Distribution note: the histogram for median cut is a genuinely
distributed groupBy (the collected histogram is ≤ 32^3 rows regardless of
raster size). Dither and nearblack are the reference's own inherently
SEQUENTIAL scans (error diffusion / collar counters carry state row to
row), so the engine runs the exact sequential kernel per raster via
groupBy(raster_id) and distributes ACROSS rasters of a catalog — the same
parallelism budget the single-threaded reference apps have per image,
multiplied by the number of images.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

# ---------------------------------------------------------------------------
# median cut
# ---------------------------------------------------------------------------


def rgb_histogram(tiles: DataFrame, meta: RasterMeta) -> DataFrame:
    """Distributed 5-bit RGB histogram: (code, cnt) with
    code = ((r>>3)*32 + (g>>3))*32 + (b>>3) — ≤ 32768 rows out."""
    dtype = meta.dtype

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        by_band = {}
        for r in pdf.itertuples(index=False):
            by_band[r.band] = np.frombuffer(bytes(r.data), dtype=dtype).reshape(
                r.h, r.w)
        rb, gb, bb = by_band[0], by_band[1], by_band[2]
        code = (((rb.astype(np.int64) >> 3) * 32 + (gb.astype(np.int64) >> 3))
                * 32 + (bb.astype(np.int64) >> 3)).ravel()
        cnt = np.bincount(code, minlength=32 * 32 * 32)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"code": nz, "cnt": cnt[nz]})

    parts = (tiles.groupBy("raster_id", "bx", "by")
             .applyInPandas(run, schema="code long, cnt long"))
    return parts.groupBy("code").agg(F.sum("cnt").alias("cnt"))


class _Box:
    __slots__ = ("rmin", "rmax", "gmin", "gmax", "bmin", "bmax", "total")

    def __init__(self, rmin, rmax, gmin, gmax, bmin, bmax, total):
        self.rmin, self.rmax = rmin, rmax
        self.gmin, self.gmax = gmin, gmax
        self.bmin, self.bmax = bmin, bmax
        self.total = total


def _shrink(box: _Box, hist: np.ndarray) -> None:
    sub = hist[box.rmin:box.rmax + 1, box.gmin:box.gmax + 1,
               box.bmin:box.bmax + 1]
    r_any = np.flatnonzero(sub.sum(axis=(1, 2)))
    g_any = np.flatnonzero(sub.sum(axis=(0, 2)))
    b_any = np.flatnonzero(sub.sum(axis=(0, 1)))
    if len(r_any):
        box.rmin, box.rmax = box.rmin + r_any[0], box.rmin + r_any[-1]
    if len(g_any):
        box.gmin, box.gmax = box.gmin + g_any[0], box.gmin + g_any[-1]
    if len(b_any):
        box.bmin, box.bmax = box.bmin + b_any[0], box.bmin + b_any[-1]


def median_cut_pct(tiles: DataFrame, meta: RasterMeta,
                   n_colors: int = 256) -> np.ndarray:
    """Exact GDALComputeMedianCutPCT on the distributed histogram.
    Returns the palette as an (n, 3) uint8 array in the reference's
    used-list order (each split PREPENDS its new lower box)."""
    hist = np.zeros((32, 32, 32), dtype=np.int64)
    for r in rgb_histogram(tiles, meta).collect():
        c = int(r["code"])
        hist[c // 1024, (c // 32) % 32, c % 32] = int(r["cnt"])
    total = int(hist.sum())

    box0 = _Box(0, 31, 0, 31, 0, 31, total)
    _shrink(box0, hist)
    used = [box0]
    free = n_colors - 1
    while free > 0:
        best = None
        for p in used:  # list order = reference linked-list order
            if (p.rmax > p.rmin or p.gmax > p.gmin or p.bmax > p.bmin) \
                    and (best is None or p.total > best.total):
                best = p
        if best is None:
            break
        ptr = best
        rspan = ptr.rmax - ptr.rmin
        gspan = ptr.gmax - ptr.gmin
        bspan = ptr.bmax - ptr.bmin
        if rspan >= gspan and rspan >= bspan:
            axis, first, last = 0, ptr.rmin, ptr.rmax
            h1 = hist[ptr.rmin:ptr.rmax + 1, ptr.gmin:ptr.gmax + 1,
                      ptr.bmin:ptr.bmax + 1].sum(axis=(1, 2))
        elif gspan >= bspan:
            axis, first, last = 1, ptr.gmin, ptr.gmax
            h1 = hist[ptr.rmin:ptr.rmax + 1, ptr.gmin:ptr.gmax + 1,
                      ptr.bmin:ptr.bmax + 1].sum(axis=(0, 2))
        else:
            axis, first, last = 2, ptr.bmin, ptr.bmax
            h1 = hist[ptr.rmin:ptr.rmax + 1, ptr.gmin:ptr.gmax + 1,
                      ptr.bmin:ptr.bmax + 1].sum(axis=(0, 1))
        # find median point (gdalmediancut.cpp:926-933)
        sum2 = ptr.total // 2
        s = 0
        i = first
        while i <= last:
            s += int(h1[i - first])
            if s >= sum2:
                break
            i += 1
        if i == first:
            i += 1
        sum1 = int(h1[:i - first].sum())
        sum2 = int(h1[i - first:].sum())
        new = _Box(ptr.rmin, ptr.rmax, ptr.gmin, ptr.gmax,
                   ptr.bmin, ptr.bmax, sum1)
        ptr.total = sum2
        if axis == 0:
            new.rmax, ptr.rmin = i - 1, i
        elif axis == 1:
            new.gmax, ptr.gmin = i - 1, i
        else:
            new.bmax, ptr.bmin = i - 1, i
        _shrink(new, hist)
        _shrink(ptr, hist)
        used.insert(0, new)
        free -= 1

    pal = np.zeros((len(used), 3), dtype=np.uint8)
    for k, p in enumerate(used):
        pal[k] = (((p.rmin + p.rmax) << 3) // 2,
                  ((p.gmin + p.gmax) << 3) // 2,
                  ((p.bmin + p.bmax) << 3) // 2)
    return pal


# ---------------------------------------------------------------------------
# dither
# ---------------------------------------------------------------------------


def find_nearest_color(pal: np.ndarray, r: int, g: int, b: int) -> int:
    """Manhattan nearest palette entry, lowest index wins ties
    (gdaldither.cpp FindNearestColor scalar path, initial best 768)."""
    d = (np.abs(pal[:, 0].astype(np.int64) - r)
         + np.abs(pal[:, 1].astype(np.int64) - g)
         + np.abs(pal[:, 2].astype(np.int64) - b))
    return int(np.argmin(d))


def colormap_5bit(pal: np.ndarray) -> np.ndarray:
    """The public GDALDitherRGB2PCT's precomputed 32^3 nearest-color cube
    (gdaldither.cpp:628-651 FindNearestColor map builder, nBits=5): each
    cell's representative is ``(i*255)//31`` and the metric is Manhattan
    with first-minimum tie-break.  Vectorized; shape (32, 32, 32)."""
    rep = (np.arange(32, dtype=np.int64) * 255) // 31
    pr = pal[:, 0].astype(np.int64)
    pg = pal[:, 1].astype(np.int64)
    pb = pal[:, 2].astype(np.int64)
    dr = np.abs(rep[:, None] - pr[None, :])        # (32, n)
    dg = np.abs(rep[:, None] - pg[None, :])
    db = np.abs(rep[:, None] - pb[None, :])
    # (r, g, b, n) Manhattan distances, argmin over palette
    d = (dr[:, None, None, :] + dg[None, :, None, :] + db[None, None, :, :])
    return d.argmin(axis=3).astype(np.uint8)


def dither_kernel(r: np.ndarray, g: np.ndarray, b: np.ndarray,
                  pal: np.ndarray) -> np.ndarray:
    """Exact sequential GDALDitherRGB2PCT scanline loop (driver-portable
    twin; runs inside the per-raster Arrow group at scale).  Nearest
    color resolves through the 5-bit colormap cube exactly as the public
    entry point does (gdaldither.cpp:316-320: ``iRed = v*32/256`` cell
    lookup), not per exact RGB."""
    H, W = r.shape
    cube = colormap_5bit(pal)
    out = np.zeros((H, W), dtype=np.uint8)
    err = np.zeros((W + 2) * 3, dtype=np.int64)
    for y in range(H):
        rr = np.clip(r[y].astype(np.int64) + err[3:3 + W * 3:3], 0, 255)
        gg = np.clip(g[y].astype(np.int64) + err[4:4 + W * 3:3], 0, 255)
        bb = np.clip(b[y].astype(np.int64) + err[5:5 + W * 3:3], 0, 255)
        err[:] = 0
        last = [0, 0, 0]
        for i in range(W):
            rv = max(0, min(255, int(rr[i]) + last[0]))
            gv = max(0, min(255, int(gg[i]) + last[1]))
            bv = max(0, min(255, int(bb[i]) + last[2]))
            idx = int(cube[rv >> 3, gv >> 3, bv >> 3])
            out[y, i] = idx
            for c, val in enumerate((rv, gv, bv)):
                n_err = val - int(pal[idx, c])
                sixth = math.trunc(n_err / 6)
                err[i * 3 + c] += sixth
                err[i * 3 + 6 + c] = sixth
                err[i * 3 + 3 + c] += n_err - 5 * sixth
                last[c] = 2 * sixth
    return out


def _assemble(pdf: pd.DataFrame, meta: RasterMeta, band: int) -> np.ndarray:
    arr = np.zeros((meta.height, meta.width), dtype=meta.dtype)
    b = meta.block
    for r in pdf[pdf["band"] == band].itertuples(index=False):
        sub = np.frombuffer(bytes(r.data), dtype=meta.dtype).reshape(r.h, r.w)
        arr[r.by * b:r.by * b + r.h, r.bx * b:r.bx * b + r.w] = sub
    return arr


def _emit_blocks(arr: np.ndarray, meta: RasterMeta, rid: str,
                 band: int = 0) -> list[tuple]:
    rows = []
    b = meta.block
    for by in range(meta.n_block_y):
        for bx in range(meta.n_block_x):
            sub = np.ascontiguousarray(arr[by * b:(by + 1) * b,
                                           bx * b:(bx + 1) * b])
            rows.append((rid, band, bx, by, sub.shape[1], sub.shape[0],
                         sub.tobytes()))
    return rows


def dither_rgb_to_pct(tiles: DataFrame, meta: RasterMeta,
                      pal: np.ndarray) -> DataFrame:
    """GDALDitherRGB2PCT over 3-band block rows → single-band palette-index
    raster. Sequential per raster (see module docstring), parallel across
    rasters."""
    spark = tiles.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(pal, dtype=np.uint8))

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = str(key[0])
        out = dither_kernel(_assemble(pdf, meta, 0), _assemble(pdf, meta, 1),
                            _assemble(pdf, meta, 2), bc.value)
        return pd.DataFrame(_emit_blocks(out, meta, rid + "_pct"),
                            columns=[f.name for f in TILE_SCHEMA])

    return tiles.groupBy("raster_id").applyInPandas(run, schema=TILE_SCHEMA)


# ---------------------------------------------------------------------------
# nearblack
# ---------------------------------------------------------------------------


def nearblack_kernel(bands: np.ndarray, near_dist: int = 15,
                     max_non_black: int = 2, white: bool = False) -> np.ndarray:
    """Exact port of the nearblack scan structure (nearblack.cpp:440-770):
    top-down pass (each row L→R with vertical counters, then R→L
    horizontal-only, iEnd exclusive), then bottom-up with fresh counters
    and the horizontal max_non_black forced to 0."""
    bands = bands.copy()
    nb, H, W = bands.shape
    seed = np.full(nb, 255 if white else 0, dtype=np.int64)
    replace = 255 if white else 0

    def non_black(px):
        d = seed - px.astype(np.int64)
        return bool(((d > near_dist) | (-d > near_dist)).any())

    def process(y, istart, iend, do_v, bottom_up, counts):
        line = bands[:, y, :]
        if do_v:
            for i in range(max(istart, iend) + 1):
                if counts[i] > max_non_black:
                    continue
                if non_black(line[:, i]):
                    counts[i] += 1
                    if counts[i] > max_non_black:
                        continue
                line[:, i] = replace
        mnb = 0 if bottom_up else max_non_black
        nnb = 0
        idir = 1 if istart < iend else -1
        do_test = True
        i = istart
        while i != iend:
            if do_test:
                if non_black(line[:, i]):
                    nnb = counts[i] if counts[i] <= mnb else nnb + 1
                if nnb > mnb:
                    do_test = False
                else:
                    line[:, i] = replace
            i += idir

    counts = np.zeros(W, dtype=np.int64)
    for y in range(H):
        process(y, 0, W - 1, True, False, counts)
        process(y, W - 1, 0, False, False, counts)
    counts = np.zeros(W, dtype=np.int64)
    for y in range(H - 1, -1, -1):
        process(y, 0, W - 1, True, True, counts)
        process(y, W - 1, 0, False, True, counts)
    return bands


def nearblack(tiles: DataFrame, meta: RasterMeta, near_dist: int = 15,
              max_non_black: int = 2, white: bool = False,
              n_bands: int = 1) -> DataFrame:
    """Distributed-across-rasters nearblack: collar pixels within
    ``near_dist`` of black (or white) flood to exact black/white from the
    image edges."""
    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = str(key[0])
        stack = np.stack([_assemble(pdf, meta, b) for b in range(n_bands)])
        out = nearblack_kernel(stack, near_dist, max_non_black, white)
        rows = []
        for b in range(n_bands):
            rows.extend(_emit_blocks(out[b], meta, rid + "_nb", b))
        return pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA])

    return tiles.groupBy("raster_id").applyInPandas(run, schema=TILE_SCHEMA)
