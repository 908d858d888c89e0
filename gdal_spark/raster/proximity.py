"""Distance-to-target rasters and nodata filling.

- :func:`proximity` — GDALComputeProximity (gdal/alg/gdalproximity.cpp:102):
  per-pixel distance to the nearest target pixel, capped at max_distance
  (beyond → nodata). The reference's two-pass top-down/bottom-up line sweep
  (:38) is a sequential approximation of the exact Euclidean distance
  transform; this engine computes the *exact* Euclidean distance, which is
  what the sweep converges to on the autotest fixtures.

  Spark shape: target pixels fan out to every block key within
  max_distance (pure column sequence/explode — bounded by
  ceil(maxdist/block)+1 per axis), one shuffle groups (block × nearby
  targets), and a chunked numpy min-reduction scores the block. Blocks with
  no target in range are simply absent (all-nodata).

- :func:`fillnodata` — GDALFillNodata (gdal/alg/rasterfill.cpp:389): nodata
  pixels take the inverse-distance-weighted mean of the nearest valid pixel
  in each of the 4 axis directions within max_search_dist (quad search
  :334), optional 3x3 smoothing passes. Runs per block with a
  max_search_dist halo via the stencil exchange.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster import dem as DEM
from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta


def proximity(tiles: DataFrame, meta: RasterMeta, max_distance: float,
              target_values: list[float] | None = None,
              out_id: str = "proximity", nodata: float = 65535.0,
              distunits_geo: bool = False) -> tuple[DataFrame, RasterMeta]:
    """Returns (tiles, meta) of float32 distances (pixel units unless
    ``distunits_geo``). Targets = nonzero pixels, or ``target_values``."""
    from dataclasses import replace
    dtype, block = meta.dtype, meta.block
    width, height = meta.width, meta.height
    nbx, nby = meta.n_block_x, meta.n_block_y
    scale = abs(meta.gt[1]) if distunits_geo else 1.0
    maxdist_px = max_distance / scale
    reach = int(np.ceil(maxdist_px / block)) + 1

    tgt_schema = T.StructType([
        T.StructField("px", T.LongType()), T.StructField("py", T.LongType())])

    def targets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                if target_values is None:
                    m = arr != 0
                else:
                    m = np.isin(arr.astype(np.float64), target_values)
                ys, xs = np.nonzero(m)
                outs.append(pd.DataFrame({"px": xs + r.bx * block,
                                          "py": ys + r.by * block}))
            yield pd.concat(outs) if outs else pd.DataFrame({"px": [], "py": []})

    tgt = tiles.mapInPandas(targets, schema=tgt_schema)
    bx = F.floor(F.col("px") / block)
    by = F.floor(F.col("py") / block)
    fan = (tgt
           .withColumn("bx", F.explode(F.sequence(
               F.greatest(bx - reach, F.lit(0)),
               F.least(bx + reach, F.lit(nbx - 1)))))
           .withColumn("by", F.explode(F.sequence(
               F.greatest(by - reach, F.lit(0)),
               F.least(by + reach, F.lit(nby - 1)))))
           .withColumn("bx", F.col("bx").cast("int"))
           .withColumn("by", F.col("by").cast("int")))

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        X = np.arange(bx * block, bx * block + w, dtype=np.float64)[None, :]
        Y = np.arange(by * block, by * block + h, dtype=np.float64)[:, None]
        best = np.full((h, w), np.inf)
        txs = pdf["px"].to_numpy(dtype=np.float64)
        tys = pdf["py"].to_numpy(dtype=np.float64)
        for s in range(0, len(txs), 512):
            dx = X[:, :, None] - txs[None, None, s:s + 512]
            dy = Y[:, :, None] - tys[None, None, s:s + 512]
            best = np.minimum(best, (dx * dx + dy * dy).min(axis=2))
        dist = np.sqrt(best) * scale
        out = np.where(dist <= max_distance, dist, nodata)
        return pd.DataFrame([(out_id, 0, bx, by, w, h,
                              out.astype(np.float32).tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = fan.groupBy("bx", "by").applyInPandas(score, schema=TILE_SCHEMA)
    out_meta = replace(meta, raster_id=out_id, dtype="float32", nodata=nodata)
    return out, out_meta


def fill_window(arr: np.ndarray, nodata: float, max_search: int,
                smoothing_iterations: int = 0,
                outside: np.ndarray | None = None) -> np.ndarray:
    """Single-window GDALFillNodata kernel (rasterfill.cpp:389 semantics):
    4-direction nearest-valid IDW, then optional 3x3 averaging restricted
    to filled pixels (masked mean over in-domain cells — ``outside`` marks
    beyond-raster halo cells that are neither sources nor targets)."""
    h, w = arr.shape
    out = arr.astype(np.float64).copy()
    bad = (arr == nodata) | np.isnan(arr)
    if outside is not None:
        bad = bad | outside
    if not bad.any():
        return out
    # distance+value of nearest valid pixel in each of 4 directions
    vals = np.full((4, h, w), np.nan)
    dists = np.full((4, h, w), np.inf)
    for d, (axis, flip) in enumerate(((1, False), (1, True), (0, False), (0, True))):
        a = out.copy()
        a[bad] = np.nan
        if flip:
            a = np.flip(a, axis=axis)
        run = np.full(a.shape, np.inf)
        val = np.full(a.shape, np.nan)
        if axis == 1:
            for x in range(w):
                col_ok = ~np.isnan(a[:, x])
                if x == 0:
                    run[:, x] = np.where(col_ok, 0, np.inf)
                    val[:, x] = a[:, x]
                else:
                    carry = run[:, x - 1] + 1
                    run[:, x] = np.where(col_ok, 0, carry)
                    val[:, x] = np.where(col_ok, a[:, x], val[:, x - 1])
        else:
            for y in range(h):
                row_ok = ~np.isnan(a[y, :])
                if y == 0:
                    run[y, :] = np.where(row_ok, 0, np.inf)
                    val[y, :] = a[y, :]
                else:
                    carry = run[y - 1, :] + 1
                    run[y, :] = np.where(row_ok, 0, carry)
                    val[y, :] = np.where(row_ok, a[y, :], val[y - 1, :])
        if flip:
            run = np.flip(run, axis=axis)
            val = np.flip(val, axis=axis)
        dists[d] = run
        vals[d] = val
    with np.errstate(divide="ignore", invalid="ignore"):
        wgt = np.where((dists <= max_search) & ~np.isnan(vals), 1.0 / dists, 0.0)
        num = np.nansum(np.where(wgt > 0, wgt * vals, 0.0), axis=0)
        den = wgt.sum(axis=0)
        filled = num / den
    inside = ~outside if outside is not None else np.ones((h, w), dtype=bool)
    target = bad & (den > 0) & inside
    out[target] = filled[target]
    for _ in range(smoothing_iterations):
        vpad = np.pad(np.where(inside, out, 0.0), 1)
        mpad = np.pad(inside.astype(np.float64), 1)
        num = sum(vpad[dy:dy + h, dx:dx + w]
                  for dy in (0, 1, 2) for dx in (0, 1, 2))
        cnt = sum(mpad[dy:dy + h, dx:dx + w]
                  for dy in (0, 1, 2) for dx in (0, 1, 2))
        out[target] = (num / cnt)[target]
    return out


def fillnodata(tiles: DataFrame, meta: RasterMeta, max_search: int,
               smoothing_iterations: int = 0,
               out_id: str = "filled") -> tuple[DataFrame, RasterMeta]:
    """Distributed GDALFillNodata: per-block fill with max_search halo."""
    nodata = meta.nodata if meta.nodata is not None else 0.0

    def fn(pad, gt):
        h, w = pad.shape[0] - 2 * max_search, pad.shape[1] - 2 * max_search
        outside = np.isnan(pad)
        res = fill_window(np.where(outside, nodata, pad), nodata, max_search,
                          smoothing_iterations, outside=outside)
        return res[max_search:max_search + h, max_search:max_search + w]

    out, out_meta = DEM.stencil_apply(
        tiles, meta, out_id, fn, halo=max_search, out_dtype="float64",
        edges="interpolate", dst_nodata=nodata, planes=False)
    return out, out_meta
