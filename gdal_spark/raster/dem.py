"""Focal 3×3 DEM derivatives via distributed halo exchange.

Reference: gdaldem (gdal/apps/gdaldem.cpp) — hillshade Horn/combined/
Zevenbergen-Thorne (:471,502,537), slope (:634,654), aspect (:695), TRI
(:1725), TPI (:1745), roughness (:1766). The reference streams 3 scanlines
at a time; here the moving window distributes as a **halo exchange**: each
block ships its 1-pixel border strips to the 8 neighbor block keys, one
shuffle groups block+halo, and the stencil evaluates as 9 shifted numpy
slices — no per-pixel Python, block output independent of partitioning.

Edge semantics both match the reference: default writes dst nodata on the
raster border; ``edges="interpolate"`` reproduces ``-compute_edges``
(INTERPOL(a,b) = 2a - b linear extrapolation, gdaldem.cpp:101).

Scale: halo traffic is O(perimeter/area) = ~1.6% of data at 256² blocks;
the single shuffle is keyed by block id, so skew is impossible by
construction.
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
# 3×3 window algorithms (vectorized; w[k] = afWin[k] plane)
# ---------------------------------------------------------------------------


def _win_planes(p: np.ndarray) -> list[np.ndarray]:
    """p = padded (h+2, w+2) array → 9 shifted (h, w) planes, afWin order
    (0..2 = row above, 3..5 = center row, 6..8 = row below)."""
    return [p[y:y + p.shape[0] - 2, x:x + p.shape[1] - 2]
            for y in (0, 1, 2) for x in (0, 1, 2)]


def hillshade(w, gt, z=1.0, scale=1.0, alt=45.0, az=315.0,
              variant="horn"):
    """GDALHillshadeAlg (:471) / ZevenbergenThorne (:537) / combined (:502),
    including the 1 + 254*cang quantization and cang<=0 → 1 rule."""
    d2r = math.pi / 180.0
    nsres, ewres = gt[5], gt[1]
    zfac = z / ((2 if variant == "zt" else 8) * scale)
    sin_alt = math.sin(alt * d2r)
    cos_alt_z = math.cos(alt * d2r) * zfac
    sq_z = zfac * zfac
    if variant == "zt":
        x = (w[3] - w[5]) / ewres
        y = (w[7] - w[1]) / nsres
    else:
        x = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) / ewres
        y = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) / nsres
    xx_yy = x * x + y * y
    aspect = np.arctan2(y, x)
    base = (sin_alt - cos_alt_z * np.sqrt(xx_yy)
            * np.sin(aspect - az * d2r)) / np.sqrt(1 + sq_z * xx_yy)
    if variant == "combined":
        cang = np.arccos(np.clip(base, -1.0, 1.0))
        cang = 1 - cang * np.arctan(np.sqrt(xx_yy * sq_z)) / (math.pi ** 2 / 4)
    else:
        cang = base
    return np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)


def slope(w, gt, scale=1.0, percent=False, variant="horn"):
    """GDALSlopeHornAlg (:634) / ZevenbergenThorne (:654)."""
    r2d = 180.0 / math.pi
    nsres, ewres = gt[5], gt[1]
    if variant == "zt":
        dx = (w[3] - w[5]) / ewres
        dy = (w[7] - w[1]) / nsres
        div = 2 * scale
    else:
        dx = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) / ewres
        dy = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) / nsres
        div = 8 * scale
    key = np.sqrt(dx * dx + dy * dy) / div
    return 100.0 * key if percent else np.arctan(key) * r2d


def aspect(w, gt, azimuth=True, nodata=-9999.0):
    """GDALAspectAlg (:695): atan2(dy, -dx), flat → nodata."""
    r2d = 180.0 / math.pi
    dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
    dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    a = np.arctan2(dy, -dx) * r2d
    if azimuth:
        a = np.where(a > 90.0, 450.0 - a, 90.0 - a)
    else:
        a = np.where(a < 0, a + 360.0, a)
    a = np.where(a == 360.0, 0.0, a)
    return np.where((dx == 0) & (dy == 0), nodata, a)


def tri(w, gt):
    """Terrain Ruggedness Index (:1725): mean |neighbor - center|."""
    c = w[4]
    return sum(np.abs(w[k] - c) for k in (0, 1, 2, 3, 5, 6, 7, 8)) / 8.0


def tpi(w, gt):
    """Topographic Position Index (:1745): center - neighbor mean."""
    return w[4] - sum(w[k] for k in (0, 1, 2, 3, 5, 6, 7, 8)) / 8.0


def roughness(w, gt):
    """Roughness (:1766): window max - min."""
    stack = np.stack(w)
    return stack.max(axis=0) - stack.min(axis=0)


# ---------------------------------------------------------------------------
# halo-exchange stencil operator
# ---------------------------------------------------------------------------

_STRIP = T.StructType([
    T.StructField("tbx", T.IntegerType()), T.StructField("tby", T.IntegerType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("ox", T.IntegerType()), T.StructField("oy", T.IntegerType()),
    T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
    T.StructField("data", T.BinaryType()),
])


def stencil_apply(tiles: DataFrame, meta: RasterMeta, out_id: str,
                  fn: Callable[[list[np.ndarray], tuple], np.ndarray],
                  halo: int = 1, out_dtype: str = "float32",
                  edges: str = "nodata", dst_nodata: float = -9999.0,
                  planes: bool = True) -> tuple[DataFrame, RasterMeta]:
    """Apply ``fn`` per block with ``halo`` border pixels exchanged.

    ``fn(w, gt)`` gets the 9 afWin planes (``planes=True``, halo must be 1)
    or the raw padded array, and returns the (h, w) output. Raster-border
    handling per ``edges`` ("nodata" | "interpolate")."""
    from dataclasses import replace
    dtype, block, gt = meta.dtype, meta.block, meta.gt
    width, height = meta.width, meta.height
    nbx, nby = meta.n_block_x, meta.n_block_y

    def strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        tbx, tby = r.bx + dx, r.by + dy
                        if not (0 <= tbx < nbx and 0 <= tby < nby):
                            continue
                        th = min(block, height - tby * block)
                        tw = min(block, width - tbx * block)
                        # the part of us landing in the target's halo buffer:
                        # we are above target (dy=+1) → our bottom rows go to
                        # the target's top halo [0:halo]; below → top rows to
                        # [halo+th:]; same row → full rows at [halo:]
                        sub = arr[
                            (slice(r.h - halo, r.h) if dy == 1 else
                             slice(0, halo) if dy == -1 else slice(None)),
                            (slice(r.w - halo, r.w) if dx == 1 else
                             slice(0, halo) if dx == -1 else slice(None))]
                        if sub.size == 0:
                            continue
                        oy = 0 if dy == 1 else (halo + th if dy == -1 else halo)
                        ox = 0 if dx == 1 else (halo + tw if dx == -1 else halo)
                        rows.append((int(tbx), int(tby), r.band, ox, oy,
                                     sub.shape[1], sub.shape[0],
                                     np.ascontiguousarray(sub).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in _STRIP])

    def apply_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by, band = int(key[0]), int(key[1]), int(key[2])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        pad = np.full((h + 2 * halo, w + 2 * halo), np.nan)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            pad[r.oy:r.oy + r.h, r.ox:r.ox + r.w] = sub
        if edges == "interpolate" and halo == 1:
            # INTERPOL(a, b) = 2a - b (gdaldem.cpp:101) on raster borders
            if by == 0:
                pad[0, :] = 2 * pad[1, :] - pad[2, :]
            if by == nby - 1 or h < block:
                pad[h + 1, :] = 2 * pad[h, :] - pad[h - 1, :]
            if bx == 0:
                pad[:, 0] = 2 * pad[:, 1] - pad[:, 2]
            if bx == nbx - 1 or w < block:
                pad[:, w + 1] = 2 * pad[:, w, ] - pad[:, w - 1]
        out = fn(_win_planes(pad) if planes else pad, gt)
        if edges == "nodata":
            bad = np.zeros((h, w), dtype=bool)
            # any window touching a never-filled halo cell → nodata
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    bad |= np.isnan(pad[dy:dy + h, dx:dx + w])
            out = np.where(bad, dst_nodata, out)
        else:
            out = np.where(np.isnan(out), dst_nodata, out)
        if np.dtype(out_dtype).kind in "ui":
            out = np.clip(np.floor(out + 0.5), np.iinfo(out_dtype).min,
                          np.iinfo(out_dtype).max)
        return pd.DataFrame([(out_id, band, bx, by, w, h,
                              out.astype(out_dtype).tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out_meta = replace(meta, raster_id=out_id, dtype=out_dtype,
                       nodata=dst_nodata)
    strip_df = tiles.mapInPandas(strips, schema=_STRIP)
    out = (strip_df.groupBy("tbx", "tby", "band")
           .applyInPandas(apply_block, schema=TILE_SCHEMA))
    return out, out_meta
