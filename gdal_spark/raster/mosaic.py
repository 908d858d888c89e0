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


_FRAGP = T.StructType(list(_FRAG) + [T.StructField("_prio", T.IntegerType())])


def gdal_merge(inputs: list[tuple[DataFrame, RasterMeta]], out_id: str,
               nodata: float | None = None,
               ul_lr: tuple[float, float, float, float] | None = None
               ) -> tuple[DataFrame, RasterMeta]:
    """gdal_merge.py semantics (gdal/swig/python/scripts/gdal_merge.py:259
    names_to_fileinfos + :55 raster_copy): the output grid is the union
    extent of all inputs at the first input's pixel size; each input is
    copied into place in argument order (last wins; with a nodata value,
    nodata pixels don't overwrite). Inputs may sit anywhere on the shared
    resolution grid — unlike :func:`mosaic` they need not share origins.

    Spark shape: every input block shatters into output-block fragments
    (pure arithmetic, no shuffle), one groupBy(out block) paints fragments
    in priority order. One shuffle keyed by output block.
    """
    base = inputs[0][1]
    psx, psy = base.gt[1], base.gt[5]
    if ul_lr is not None:
        ulx, uly, lrx, lry = ul_lr
    else:
        ulx = min(m.gt[0] for _t, m in inputs)
        uly = max(m.gt[3] for _t, m in inputs)
        lrx = max(m.gt[0] + m.width * m.gt[1] for _t, m in inputs)
        lry = min(m.gt[3] + m.height * m.gt[5] for _t, m in inputs)
    W = int((lrx - ulx) / psx + 0.5)
    H = int((lry - uly) / psy + 0.5)
    out_gt = (ulx, psx, base.gt[2], uly, base.gt[4], psy)
    block = base.block
    dtype = base.dtype
    nd = nodata if nodata is not None else (base.nodata
                                            if base.nodata is not None
                                            else 0.0)
    out_meta = RasterMeta(out_id, W, H, gt=out_gt, dtype=dtype, block=block,
                          nodata=base.nodata)

    frag_parts = []
    for prio, (tiles, meta) in enumerate(inputs):
        if abs(meta.gt[1] - psx) > 1e-12 or abs(meta.gt[5] - psy) > 1e-12:
            raise ValueError("gdal_merge inputs must share pixel size; "
                             "warp first")
        # integer placement of this input on the output grid
        # (raster_copy window math, gdal_merge.py:55-116)
        xoff = int((meta.gt[0] - ulx) / psx + 0.1)
        yoff = int((meta.gt[3] - uly) / psy + 0.1)
        in_block, in_dtype = meta.block, meta.dtype

        def shatter(batches, xoff=xoff, yoff=yoff, in_block=in_block,
                    in_dtype=in_dtype, prio=prio):
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    arr = np.frombuffer(bytes(r.data),
                                        dtype=in_dtype).reshape(r.h, r.w)
                    gx0 = r.bx * in_block + xoff
                    gy0 = r.by * in_block + yoff
                    x_lo = max(gx0, 0)
                    y_lo = max(gy0, 0)
                    x_hi = min(gx0 + r.w, W)
                    y_hi = min(gy0 + r.h, H)
                    if x_lo >= x_hi or y_lo >= y_hi:
                        continue
                    for tby in range(y_lo // block, (y_hi - 1) // block + 1):
                        for tbx in range(x_lo // block,
                                         (x_hi - 1) // block + 1):
                            x0 = max(x_lo, tbx * block)
                            x1 = min(x_hi, (tbx + 1) * block)
                            y0 = max(y_lo, tby * block)
                            y1 = min(y_hi, (tby + 1) * block)
                            sub = arr[y0 - gy0:y1 - gy0, x0 - gx0:x1 - gx0]
                            rows.append((tbx, tby, r.band,
                                         x0 - tbx * block, y0 - tby * block,
                                         x1 - x0, y1 - y0,
                                         np.ascontiguousarray(sub).astype(
                                             dtype).tobytes(), prio))
                yield pd.DataFrame(rows,
                                   columns=[f.name for f in _FRAGP])

        frag_parts.append(tiles.mapInPandas(shatter, schema=_FRAGP))

    frags = frag_parts[0]
    for p in frag_parts[1:]:
        frags = frags.unionByName(p)

    def paint(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tbx, tby, band = int(key[0]), int(key[1]), int(key[2])
        w = min(block, W - tbx * block)
        h = min(block, H - tby * block)
        out = np.full((h, w), nd, dtype=dtype)
        for r in pdf.sort_values("_prio").itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            if nodata is not None:
                hit = sub != nd
                out[r.oy:r.oy + r.h, r.ox:r.ox + r.w][hit] = sub[hit]
            else:
                out[r.oy:r.oy + r.h, r.ox:r.ox + r.w] = sub
        return pd.DataFrame([(out_id, band, tbx, tby, w, h, out.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = frags.groupBy("tbx", "tby", "band").applyInPandas(
        paint, schema=TILE_SCHEMA)
    return out, out_meta
