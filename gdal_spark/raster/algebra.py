"""Pixel algebra and color operations.

- :func:`map_pixels` — gdal_calc.py / VRT pixel functions
  (gdal/swig/python/scripts/gdal_calc.py:63-84,
  gdal/frmts/vrt/vrtderivedrasterband.cpp:103): apply a vectorized numpy
  expression per block. Multi-raster algebra composes via
  :func:`zip_pixels` (same-grid blocks joined on the block key).

- :func:`color_relief` — gdaldem color-relief (gdal/apps/gdaldem.cpp:
  805-1265): piecewise-linear RGB ramp lookup per elevation value. Emits
  three bands (r, g, b) as separate band rows.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta


def map_pixels(tiles: DataFrame, meta: RasterMeta, out_id: str,
               fn: Callable[[np.ndarray], np.ndarray],
               out_dtype: str | None = None) -> tuple[DataFrame, RasterMeta]:
    """Per-block numpy expression — a narrow map stage (no shuffle)."""
    from dataclasses import replace
    dtype = meta.dtype
    odt = out_dtype or dtype

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                out = np.asarray(fn(arr)).astype(odt)
                rows.append((out_id, r.band, r.bx, r.by, r.w, r.h,
                             out.tobytes()))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bx", "by",
                                              "w", "h", "data"])

    return (tiles.mapInPandas(run, schema=TILE_SCHEMA),
            replace(meta, raster_id=out_id, dtype=odt))


def zip_pixels(a: DataFrame, b: DataFrame, meta: RasterMeta, out_id: str,
               fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
               out_dtype: str | None = None) -> tuple[DataFrame, RasterMeta]:
    """Two-raster algebra (gdal_calc -A -B): same-grid blocks equi-joined
    on (band, bx, by) — co-partitioned, single shuffle."""
    from dataclasses import replace
    dtype = meta.dtype
    odt = out_dtype or dtype
    joined = (a.select("band", "bx", "by", "w", "h",
                       F.col("data").alias("_da"))
              .join(b.select("band", "bx", "by", F.col("data").alias("_db")),
                    on=["band", "bx", "by"]))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column zip: itertuples mangles _-prefixed names
            for band, bx, by, w, h, da, db in zip(
                    pdf["band"], pdf["bx"], pdf["by"], pdf["w"], pdf["h"],
                    pdf["_da"], pdf["_db"]):
                aa = np.frombuffer(bytes(da), dtype=dtype).reshape(h, w)
                bb = np.frombuffer(bytes(db), dtype=dtype).reshape(h, w)
                out = np.asarray(fn(aa, bb)).astype(odt)
                rows.append((out_id, int(band), int(bx), int(by), int(w),
                             int(h), out.tobytes()))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bx", "by",
                                              "w", "h", "data"])

    return (joined.mapInPandas(run, schema=TILE_SCHEMA),
            replace(meta, raster_id=out_id, dtype=odt))


def color_relief(tiles: DataFrame, meta: RasterMeta, out_id: str,
                 ramp: list[tuple[float, int, int, int]],
                 interpolate: bool = True) -> tuple[DataFrame, RasterMeta]:
    """Elevation → RGB ramp (gdaldem color-relief, gdaldem.cpp:805-1265).
    ``ramp`` = sorted (elevation, r, g, b); values between entries blend
    linearly (GDALColorReliefGetRGBA interpolation) unless ``interpolate``
    is False (exact-bucket mode). Output: 3 band rows (0=r, 1=g, 2=b)."""
    from dataclasses import replace
    dtype = meta.dtype
    elev = np.array([e for e, *_ in ramp], dtype=np.float64)
    rgb = np.array([[r, g, b] for _e, r, g, b in ramp], dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype) \
                    .reshape(r.h, r.w).astype(np.float64)
                if interpolate:
                    chans = [np.interp(arr, elev, rgb[:, c]) for c in range(3)]
                else:
                    idx = np.clip(np.searchsorted(elev, arr, side="right") - 1,
                                  0, len(elev) - 1)
                    chans = [rgb[idx, c] for c in range(3)]
                for band, ch in enumerate(chans):
                    # the reference truncates with a 0.45 offset, not
                    # round-half-up (GDALColorReliefGetRGBA,
                    # gdaldem.cpp:915-929)
                    out = np.clip(np.floor(ch + 0.45), 0, 255).astype(np.uint8)
                    rows.append((out_id, band, r.bx, r.by, r.w, r.h,
                                 out.tobytes()))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bx", "by",
                                              "w", "h", "data"])

    return (tiles.mapInPandas(run, schema=TILE_SCHEMA),
            replace(meta, raster_id=out_id, dtype="uint8"))
