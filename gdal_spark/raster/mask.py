"""GDAL band-mask model: GetMaskBand / GetMaskFlags.

Reference: gdal/gcore/gdalrasterband.cpp (GetMaskBand ~:5150,
GetMaskFlags) — the default mask for a band is derived, in priority
order, from (a) an alpha band on the dataset (GMF_ALPHA |
GMF_PER_DATASET; the mask IS the alpha band, not a threshold of it),
(b) the band's nodata value (GMF_NODATA; 255 where pixel != nodata,
0 where it equals), else (c) all-valid (GMF_ALL_VALID; constant 255).
The alpha band itself reports GMF_ALL_VALID.

Execution model: one narrow mapInPandas over the band's tiles — no
shuffle, block-parallel, scale-free. Over the engine's sparse rasters
the mask is emitted only for blocks that exist; absent blocks read as
0 (invalid) under the sparse convention, which matches the warp
maskers' treatment of unsupported dst blocks.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

# gdal/gcore/gdal.h GMF_* flag values
GMF_ALL_VALID = 0x01
GMF_PER_DATASET = 0x02
GMF_ALPHA = 0x04
GMF_NODATA = 0x08

__all__ = ["GMF_ALL_VALID", "GMF_PER_DATASET", "GMF_ALPHA", "GMF_NODATA",
           "mask_flags", "mask_band"]


def mask_flags(meta: RasterMeta, band: int = 0,
               alpha_band: int | None = None) -> int:
    """GetMaskFlags: alpha beats nodata beats all-valid; the alpha band
    itself is all-valid (autotest/gcore/mask.py mask_3)."""
    if alpha_band is not None and band != alpha_band:
        return GMF_ALPHA | GMF_PER_DATASET
    if meta.nodata is not None and (alpha_band is None
                                    or band != alpha_band):
        return GMF_NODATA
    return GMF_ALL_VALID


def mask_band(tiles: DataFrame, meta: RasterMeta, band: int = 0,
              alpha_band: int | None = None,
              out_id: str | None = None) -> tuple[DataFrame, RasterMeta]:
    """GetMaskBand as a derived uint8 raster (band 0 of the result)."""
    flags = mask_flags(meta, band, alpha_band)
    out_meta = replace(meta, raster_id=out_id or f"{meta.raster_id}__mask",
                       dtype="uint8", nodata=None)
    if flags & GMF_ALPHA:
        src_band = alpha_band
    else:
        src_band = band
    src = tiles.filter(F.col("band") == src_band)
    dtype, oid = meta.dtype, out_meta.raster_id
    nodata = meta.nodata

    def derive(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(
                    r.h, r.w)
                if flags & GMF_ALPHA:
                    m = arr.astype(np.uint8)  # the alpha values verbatim
                elif flags & GMF_NODATA:
                    m = np.where(arr != nodata, 255, 0).astype(np.uint8)
                else:
                    m = np.full((r.h, r.w), 255, dtype=np.uint8)
                rows.append((oid, 0, r.bx, r.by, r.w, r.h, m.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name
                                              for f in TILE_SCHEMA.fields])

    return src.mapInPandas(derive, TILE_SCHEMA), out_meta
