"""Distance-to-target rasters and nodata filling.

- :func:`proximity` — GDALComputeProximity (gdal/alg/gdalproximity.cpp:102):
  per-pixel distance to the nearest target pixel, capped at max_distance
  (beyond → nodata). The reference's two-pass top-down/bottom-up line sweep
  (:38) is a sequential approximation of the exact Euclidean distance
  transform; this engine computes the *exact* Euclidean distance, which is
  what the sweep converges to on the autotest fixtures.

  Spark shape (separable EDT, density-independent — the round-2 per-target
  fan-out is gone): (1) each block emits per-column target extremes
  (≤ 1 tiny row per column per block, *regardless of target density*);
  (2) extremes fan vertically within ceil(maxdist/block) block rows and
  cogroup with the tiles to produce a per-block column-distance map G
  (exact in-block two-pass sweep + extreme-based out-of-block part — exact
  because an out-of-block pixel always faces a column's topmost/bottommost
  target); (3) G blocks fan horizontally within reach and a vectorized
  lower-envelope min over dx² + G² scores each pixel. Work per block is
  O(pixels × strip_width) — independent of how dense the targets are; a
  100%-target raster costs the same as a 0.1% one. Blocks with no target
  in range are simply absent (all-nodata by the sparse-raster convention).

- :func:`fillnodata` — GDALFillNodata (gdal/alg/rasterfill.cpp:389): nodata
  pixels take the inverse-distance-weighted mean of the nearest valid pixel
  in each of the 4 axis directions within max_search_dist (quad search
  :334 — here linear per-direction sweeps, not per-pixel search), optional
  3x3 smoothing passes. Runs per block with a max_search_dist halo via the
  stencil exchange.
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
    ``distunits_geo``). Targets = nonzero pixels, or ``target_values``.
    Separable exact EDT — see the module docstring for the three-phase
    distributed shape; cost per block is independent of target density."""
    from dataclasses import replace
    dtype, block = meta.dtype, meta.block
    width, height = meta.width, meta.height
    nbx, nby = meta.n_block_x, meta.n_block_y
    scale = abs(meta.gt[1]) if distunits_geo else 1.0
    maxdist_px = max_distance / scale
    reach = int(np.ceil(maxdist_px / block)) + 1

    # ---- phase 1: per-block-column target extremes (global coords) ----
    ext_schema = T.StructType([
        T.StructField("x", T.LongType()), T.StructField("by", T.IntegerType()),
        T.StructField("mn", T.LongType()), T.StructField("mx", T.LongType())])

    def colext(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                if target_values is None:
                    m = arr != 0
                else:
                    m = np.isin(arr.astype(np.float64), target_values)
                has = m.any(axis=0)
                if not has.any():
                    continue
                xs = np.flatnonzero(has)
                ys = np.arange(r.h)[:, None]
                mn = np.where(m[:, xs], ys, r.h).min(axis=0) + r.by * block
                mx = np.where(m[:, xs], ys, -1).max(axis=0) + r.by * block
                outs.append(pd.DataFrame({
                    "x": xs + r.bx * block, "by": np.full(len(xs), r.by),
                    "mn": mn, "mx": mx}))
            yield (pd.concat(outs) if outs
                   else pd.DataFrame({"x": [], "by": [], "mn": [], "mx": []}))

    ext = tiles.mapInPandas(colext, schema=ext_schema)

    # vertical fan: each block-column extreme reaches consumer block rows
    # within `reach`; self excluded (the in-block part is exact per-pixel)
    by_c = F.col("by")
    cons = (ext
            .withColumn("cby", F.explode(F.sequence(
                F.greatest(by_c - reach, F.lit(0)),
                F.least(by_c + reach, F.lit(nby - 1)))))
            .filter(F.col("cby") != by_c)
            .select((F.col("x") / block).cast("int").alias("bx"),
                    F.col("cby").cast("int").alias("by"),
                    "x", F.col("by").alias("sby"), "mn", "mx"))

    keyed_tiles = tiles.filter(F.col("band") == 0)
    inf32 = np.float32(np.inf)

    # ---- phase 2: per-block column-distance map G ----
    def build_g(key, contribs: pd.DataFrame, tile: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        y0 = by * block
        ygl = np.arange(y0, y0 + h, dtype=np.float64)[:, None]
        G = np.full((h, w), np.inf)
        if len(tile):
            r = tile.iloc[0]
            arr = np.frombuffer(bytes(r["data"]), dtype=dtype).reshape(h, w)
            if target_values is None:
                m = arr != 0
            else:
                m = np.isin(arr.astype(np.float64), target_values)
            if m.any():
                # exact in-block two-pass column sweep (the gdalproximity
                # top-down/bottom-up lines, restricted to the block)
                last = np.full(w, -np.inf)
                down = np.empty((h, w))
                for y in range(h):
                    last = np.where(m[y], y, last)
                    down[y] = y - last
                nxt = np.full(w, np.inf)
                up = np.empty((h, w))
                for y in range(h - 1, -1, -1):
                    nxt = np.where(m[y], y, nxt)
                    up[y] = nxt - y
                G = np.minimum(down, up)
        if len(contribs):
            xs = contribs["x"].to_numpy() - bx * block
            above = np.full(w, -np.inf)
            below = np.full(w, np.inf)
            mxv = contribs["mx"].to_numpy(dtype=np.float64)
            mnv = contribs["mn"].to_numpy(dtype=np.float64)
            sby = contribs["sby"].to_numpy()
            up_sel = sby < by
            dn_sel = sby > by
            np.maximum.at(above, xs[up_sel], mxv[up_sel])
            np.minimum.at(below, xs[dn_sel], mnv[dn_sel])
            G = np.minimum(G, ygl - above[None, :])
            G = np.minimum(G, below[None, :] - ygl)
        if not (G <= maxdist_px).any():
            return pd.DataFrame(columns=["raster_id", "band", "bx", "by",
                                         "w", "h", "data"])
        return pd.DataFrame([(out_id, 0, bx, by, w, h,
                              G.astype(np.float32).tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    g = (cons.groupBy("bx", "by")
         .cogroup(keyed_tiles.groupBy("bx", "by"))
         .applyInPandas(build_g, schema=TILE_SCHEMA))

    # ---- phase 3: horizontal lower-envelope over dx² + G² ----
    gfan = (g.withColumn("cbx", F.explode(F.sequence(
                F.greatest(F.col("bx") - reach, F.lit(0)),
                F.least(F.col("bx") + reach, F.lit(nbx - 1)))))
             .withColumn("cbx", F.col("cbx").cast("int")))

    def envelope(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        sb = pdf["bx"].to_numpy()
        x_lo = int(sb.min()) * block
        x_hi = max(int(r.bx) * block + int(r.w) for r in pdf.itertuples(index=False))
        S = x_hi - x_lo
        strip = np.full((h, S), np.inf, dtype=np.float64)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=np.float32).reshape(r.h, r.w)
            strip[:, r.bx * block - x_lo:r.bx * block - x_lo + r.w] = sub
        X = np.arange(bx * block, bx * block + w, dtype=np.float64)
        XS = np.arange(x_lo, x_hi, dtype=np.float64)
        dx2 = (X[:, None] - XS[None, :]) ** 2          # (w, S)
        # prune strip columns that cannot contribute (dx alone > maxdist)
        keep = (np.abs(X[:, None] - XS[None, :]) <= maxdist_px + 1).any(axis=0)
        dx2 = dx2[:, keep]
        strip = strip[:, keep]
        if strip.shape[1] == 0:
            out = np.full((h, w), nodata, dtype=np.float32)
            return pd.DataFrame([(out_id, 0, bx, by, w, h, out.tobytes())],
                                columns=["raster_id", "band", "bx", "by",
                                         "w", "h", "data"])
        g2 = strip * strip                              # (h, S')
        best = np.empty((h, w))
        step = max(1, int(4e6 // max(dx2.size, 1)))
        for y0_ in range(0, h, step):
            y1_ = min(y0_ + step, h)
            d2 = dx2[None, :, :] + g2[y0_:y1_, None, :]
            best[y0_:y1_] = d2.min(axis=2)
        dist = np.sqrt(best) * scale
        out = np.where(dist <= max_distance, dist, nodata)
        return pd.DataFrame([(out_id, 0, bx, by, w, h,
                              out.astype(np.float32).tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = gfan.groupBy("cbx", "by").applyInPandas(envelope, schema=TILE_SCHEMA)
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
