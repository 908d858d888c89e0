"""Histogram equalization (gdalenhance analog).

Re-expresses gdal/apps/gdalenhance.cpp as two distributed stages:

1. ``equalization_lut`` — ComputeEqualizationLUTs
   (gdalenhance.cpp:ComputeEqualizationLUTs): default byte histogram
   (-0.5 .. 255.5, 256 buckets), extreme bins zeroed, cumulative
   histogram ``cum[i] = sum(hist[:i]) + hist[i]/2`` (integer halves, as
   the reference's GUIntBig math), LUT
   ``clamp((cum[(i*histSize)/lutBins] * lutBins) / total, 0, lutBins-1)``.
   The histogram reduce is distributed (one partial-agg shuffle); only
   the 256-row result is collected — metadata-scale, like the
   reference's own in-memory histogram.

2. ``equalize`` — EnhancerCallback (gdalenhance.cpp:EnhancerCallback):
   per tile, ``bin = clamp(int((v - scale_min) * lutBins /
   (scale_max - scale_min)), 0, lutBins-1)``, output ``lut[bin]``;
   nodata pixels pass through unchanged.  Pure numpy per Arrow batch, no
   shuffle — the LUT ships as a broadcast-sized closure constant.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster import stats as RST
from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta


def lut_from_histogram(hist: np.ndarray, lut_bins: int = 256) -> np.ndarray:
    """LUT from a raw histogram, reference math exactly."""
    hist = hist.astype(np.int64).copy()
    hist[0] = 0          # zero out extremes (nodata etc.), as the reference
    hist[-1] = 0
    cum = np.cumsum(hist) - hist + hist // 2
    total = int(hist.sum())
    if total == 0:
        total = 1
    n = len(hist)
    idx = (np.arange(lut_bins, dtype=np.int64) * n) // lut_bins
    return np.clip((cum[idx] * lut_bins) // total, 0, lut_bins - 1)


def equalization_lut(tiles: DataFrame, meta: RasterMeta,
                     lut_bins: int = 256) -> tuple[np.ndarray, float, float]:
    """Distributed histogram → (lut, scale_min, scale_max)."""
    if meta.dtype != "uint8":
        raise NotImplementedError(
            "gdalenhance parity is defined for Byte rasters "
            "(the reference exits on non-Byte output)")
    lo, hi, hist_size = -0.5, 255.5, 256
    rows = (RST.histogram(tiles, meta, lo, hi, hist_size)
            .select("bucket", "count").collect())
    hist = np.zeros(hist_size, dtype=np.int64)
    for r in rows:
        hist[r["bucket"]] = r["count"]
    return lut_from_histogram(hist, lut_bins), lo, hi


def equalize(tiles: DataFrame, meta: RasterMeta, lut: np.ndarray,
             scale_min: float, scale_max: float,
             lut_bins: int = 256) -> DataFrame:
    """Apply the LUT per tile (EnhancerCallback semantics)."""
    dtype, nodata = meta.dtype, meta.nodata
    lut = np.asarray(lut, dtype=np.int64)
    scale = lut_bins / (scale_max - scale_min)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            data = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(
                    r.h, r.w).astype(np.float64)
                bins = np.clip(((arr - scale_min) * scale).astype(np.int64),
                               0, lut_bins - 1)
                eq = lut[bins].astype(dtype)
                if nodata is not None:
                    eq = np.where(arr == nodata, np.asarray(nodata, dtype),
                                  eq)
                data.append(eq.tobytes())
            out["data"] = data
            yield out

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def enhance(tiles: DataFrame, meta: RasterMeta,
            lut_bins: int = 256) -> DataFrame:
    """gdalenhance -equalize end-to-end: compute per-band LUT, apply."""
    lut, lo, hi = equalization_lut(tiles, meta, lut_bins)
    return equalize(tiles, meta, lut, lo, hi, lut_bins)
