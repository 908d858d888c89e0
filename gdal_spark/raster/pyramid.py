"""Overview / tile-pyramid reduction for block-row rasters.

Reference: GDALRegenerateOverviews average path (gdal/gcore/overview.cpp:
206-501 — integer types accumulate in int and round half-up:
``(total + count/2) / count``, 2×2 fast path ``(total + 2) / 4``,
overview.cpp:340-355) and the gdal2tiles overview pass that builds zoom
z-1 tiles from 4 children (gdal/swig/python/scripts/gdal2tiles.py:
1313-1400).

Spark shape: one overview level = ``groupBy(bx//2, by//2)`` + a 4-child
mosaic-downsample kernel — a narrow shuffle whose key count shrinks 4× per
level. Iterating levels gives the full pyramid. Determinism: each child
lands in a fixed quadrant of the 2B×2B mosaic, so the reduction is
order-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.model import BLOCK, TILE_SCHEMA, RasterMeta


def downsample2x_average(arr: np.ndarray) -> np.ndarray:
    """Exact reference average-2x2: integer accumulate, (sum + n/2) / n
    (overview.cpp:340-355 fast path / :379-395 general). Odd edges fall
    back to 1x2 / 2x1 / 1x1 boxes with the same rounding."""
    h, w = arr.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    if arr.dtype.kind in "ui":
        acc = np.zeros((oh, ow), dtype=np.int64)
        cnt = np.zeros((oh, ow), dtype=np.int64)
        for dy in (0, 1):
            for dx in (0, 1):
                sub = arr[dy::2, dx::2].astype(np.int64)
                acc[:sub.shape[0], :sub.shape[1]] += sub
                cnt[:sub.shape[0], :sub.shape[1]] += 1
        # C truncating division (reference: (nTotal + nCount/2)/nCount
        # truncates toward zero) — floor division would round signed
        # negative box sums off-by-one (e.g. int16 DEMs).
        num = acc + cnt // 2
        q = num // cnt
        q += (num < 0) & (num % cnt != 0)
        return q.astype(arr.dtype)
    acc = np.zeros((oh, ow), dtype=np.float64)
    cnt = np.zeros((oh, ow), dtype=np.int64)
    for dy in (0, 1):
        for dx in (0, 1):
            sub = arr[dy::2, dx::2].astype(np.float64)
            acc[:sub.shape[0], :sub.shape[1]] += sub
            cnt[:sub.shape[0], :sub.shape[1]] += 1
    return (acc / cnt).astype(arr.dtype)


def downsample2x_nearest(arr: np.ndarray) -> np.ndarray:
    """NEAREST overview: top-left sample of each 2x2 box
    (overview.cpp NEAREST path takes nSrcXOff sample)."""
    return arr[::2, ::2].copy()


def overview_level(tiles: DataFrame, meta: RasterMeta, out_id: str,
                   method: str = "average") -> tuple[DataFrame, RasterMeta]:
    """One /2 overview level. Returns (tiles_df, out_meta)."""
    if method not in ("average", "nearest"):
        raise ValueError(f"unsupported method {method!r}")
    out_meta = meta.scaled(out_id, 2)
    dtype, block = meta.dtype, meta.block
    ow_full, oh_full = out_meta.width, out_meta.height
    down = downsample2x_average if method == "average" else downsample2x_nearest

    keyed = tiles.withColumn("obx", F.floor(F.col("bx") / 2).cast("int")) \
                 .withColumn("oby", F.floor(F.col("by") / 2).cast("int"))

    def reduce_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, obx, oby = key
        # mosaic up to 4 children into their fixed quadrants
        mw = min(2 * block, meta.width - obx * 2 * block)
        mh = min(2 * block, meta.height - oby * 2 * block)
        mosaic = np.zeros((mh, mw), dtype=dtype)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            qx = (r.bx - obx * 2) * block
            qy = (r.by - oby * 2) * block
            mosaic[qy:qy + r.h, qx:qx + r.w] = sub
        out = down(mosaic)
        w = min(block, ow_full - obx * block)
        h = min(block, oh_full - oby * block)
        out = out[:h, :w]
        return pd.DataFrame([(out_id, band, int(obx), int(oby),
                              int(out.shape[1]), int(out.shape[0]),
                              out.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = (keyed.groupBy("raster_id", "band", "obx", "oby")
           .applyInPandas(reduce_group, schema=TILE_SCHEMA))
    return out, out_meta


def build_pyramid(tiles: DataFrame, meta: RasterMeta, levels: int,
                  method: str = "average") -> list[tuple[DataFrame, RasterMeta]]:
    """Full overview chain [(level1, meta1), ...] — iterated narrow-ish
    shuffles, the gdal2tiles overview-loop shape."""
    out = []
    cur, cur_meta = tiles, meta
    for i in range(1, levels + 1):
        cur, cur_meta = overview_level(
            cur, cur_meta, f"{meta.raster_id}_ov{i}", method)
        out.append((cur, cur_meta))
    return out
