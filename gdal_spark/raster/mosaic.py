"""Mosaicking and re-blocking.

- :func:`mosaic` — gdalbuildvrt / gdal_merge.py semantics
  (gdal/apps/gdalbuildvrt.cpp, gdal/swig/python/scripts/gdal_merge.py:55
  ``raster_copy``): later inputs paint over earlier ones, nodata pixels
  don't overwrite ("last-on-top, nodata-aware"). Inputs must share a grid
  (same geotransform/block layout — the gdalbuildvrt common case); the
  distributed form is a ``unionByName`` + one groupBy(block) overlay
  reduce.

- :func:`reblock` — gdal_retile.py (re-chop into a different block size):
  every source block shatters into the sub-rectangles that land in each
  target block (pure index arithmetic per block row), one shuffle keyed by
  the target block assembles them. Partition-shape change without touching
  pixel values — the Spark analog of re-chunking a 100 TB raster.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta


def mosaic(inputs: list[tuple[DataFrame, RasterMeta]], out_id: str,
           nodata: float | None = None) -> tuple[DataFrame, RasterMeta]:
    """Overlay same-grid rasters, last-on-top, nodata-aware. ``inputs`` are
    (tiles, meta) in paint order (gdal_merge processes files in argument
    order, last wins on overlap unless the pixel is nodata)."""
    base_meta = inputs[0][1]
    nd = nodata if nodata is not None else (base_meta.nodata or 0.0)
    dtype, block = base_meta.dtype, base_meta.block
    width, height = base_meta.width, base_meta.height
    parts = []
    for prio, (tiles, meta) in enumerate(inputs):
        if (meta.width, meta.height, meta.block, meta.gt) != \
                (base_meta.width, base_meta.height, base_meta.block, base_meta.gt):
            raise ValueError("mosaic inputs must share the grid; warp first")
        parts.append(tiles.withColumn("_prio", F.lit(prio)))
    allt = parts[0]
    for p in parts[1:]:
        allt = allt.unionByName(p)

    def overlay(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by, band = int(key[0]), int(key[1]), int(key[2])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        out = np.full((h, w), nd, dtype=dtype)
        for r in pdf.sort_values("_prio").itertuples(index=False):
            arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            paint = arr != nd
            out[:r.h, :r.w][paint] = arr[paint]
        return pd.DataFrame([(out_id, band, bx, by, w, h, out.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = (allt.groupBy("bx", "by", "band")
           .applyInPandas(overlay, schema=TILE_SCHEMA))
    return out, replace(base_meta, raster_id=out_id, nodata=nd)


_FRAG = T.StructType([
    T.StructField("tbx", T.IntegerType()), T.StructField("tby", T.IntegerType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("ox", T.IntegerType()), T.StructField("oy", T.IntegerType()),
    T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
    T.StructField("data", T.BinaryType()),
])


def reblock(tiles: DataFrame, meta: RasterMeta, new_block: int,
            out_id: str | None = None) -> tuple[DataFrame, RasterMeta]:
    """Re-chop into ``new_block``-sized blocks (gdal_retile.py shape)."""
    out_meta = replace(meta, raster_id=out_id or meta.raster_id,
                       block=new_block)
    dtype, block = meta.dtype, meta.block
    width, height = meta.width, meta.height

    def shatter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                gx0, gy0 = r.bx * block, r.by * block
                tb_lo_x = gx0 // new_block
                tb_hi_x = (gx0 + r.w - 1) // new_block
                tb_lo_y = gy0 // new_block
                tb_hi_y = (gy0 + r.h - 1) // new_block
                for tby in range(tb_lo_y, tb_hi_y + 1):
                    for tbx in range(tb_lo_x, tb_hi_x + 1):
                        x0 = max(gx0, tbx * new_block)
                        x1 = min(gx0 + r.w, (tbx + 1) * new_block)
                        y0 = max(gy0, tby * new_block)
                        y1 = min(gy0 + r.h, (tby + 1) * new_block)
                        sub = arr[y0 - gy0:y1 - gy0, x0 - gx0:x1 - gx0]
                        rows.append((tbx, tby, r.band,
                                     x0 - tbx * new_block, y0 - tby * new_block,
                                     x1 - x0, y1 - y0,
                                     np.ascontiguousarray(sub).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAG])

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tbx, tby, band = int(key[0]), int(key[1]), int(key[2])
        w = min(new_block, width - tbx * new_block)
        h = min(new_block, height - tby * new_block)
        out = np.zeros((h, w), dtype=dtype)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            out[r.oy:r.oy + r.h, r.ox:r.ox + r.w] = sub
        return pd.DataFrame([(out_meta.raster_id, band, tbx, tby, w, h,
                              out.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    frags = tiles.mapInPandas(shatter, schema=_FRAG)
    out = frags.groupBy("tbx", "tby", "band").applyInPandas(assemble,
                                                            schema=TILE_SCHEMA)
    return out, out_meta
