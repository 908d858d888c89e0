"""Distributed vector→raster burn (gdal_rasterize).

Reference: GDALRasterizeGeometries (gdal/alg/gdalrasterize.cpp:560) drives
the scanline polygon fill GDALdllImageFilledPolygon (method=1 variant,
gdal/alg/llrasterize.cpp:91-248): for each scanline center dy = y + 0.5,
collect edge crossings where (oriented) ymin <= dy < ymax at
x = floor(intersect + 0.5), sort, fill even-odd spans
[x[2i], x[2i+1] - 1]; bottom-exact horizontal segments fill separately.
Points burn their containing pixel (GDALdllImagePoint) and linestrings use
the reference Bresenham walk (GDALdllImageLine, llrasterize.cpp:254+).
The reference chunks scanlines ~10 MB at a time (gdalrasterize.cpp:639-645)
— here the block is the chunk.

Spark shape: geometries → covering block keys (bbox → key range, pure
column sequence/explode, the gdaltindex manifest trick) → groupBy block →
numpy fill kernel per block over that block's geometries (burn in
feature order, later features overwrite — gdalrasterize.cpp burn loop
semantics). One shuffle keyed by block; skewed giant polygons fan out to
exactly the blocks they touch.

The fill kernel is O(H·W + E·H) per block via a crossing-count parity
cumsum — no per-pixel Python, no per-scanline sort.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import geometry as G
from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta


# ---------------------------------------------------------------------------
# numpy fill kernels (pixel space), exact llrasterize.cpp semantics
# ---------------------------------------------------------------------------

def fill_polygon_mask(rings: list[np.ndarray], y0: int, y1: int,
                      x0: int, x1: int) -> np.ndarray:
    """Boolean mask of burned pixels for the window rows [y0,y1) ×
    cols [x0,x1), rings in *pixel* coordinates (closed or not).

    Parity trick: a pixel x on scanline dy is inside an even-odd span iff
    the number of rounded crossings <= x is odd, so one histogram + cumsum
    per scanline replaces sort + span fill (llrasterize.cpp:236-248).
    """
    H, W = y1 - y0, x1 - x0
    diff = np.zeros((H, W + 1), dtype=np.int64)
    horiz = np.zeros((H, W), dtype=bool)
    dy = (np.arange(y0, y1, dtype=np.float64) + 0.5)[:, None]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        if len(r) < 2:
            continue
        ex1, ey1 = r[:-1, 0], r[:-1, 1]
        ex2, ey2 = r[1:, 0], r[1:, 1]
        # non-horizontal edges: oriented so (lowy, lowx) is the lower end
        nh = ey1 != ey2
        lowy = np.where(ey1 < ey2, ey1, ey2)[nh]
        lowx = np.where(ey1 < ey2, ex1, ex2)[nh]
        highy = np.where(ey1 < ey2, ey2, ey1)[nh]
        highx = np.where(ey1 < ey2, ex2, ex1)[nh]
        if lowy.size:
            cross = (dy >= lowy[None, :]) & (dy < highy[None, :])  # (H, E)
            rows, edges = np.nonzero(cross)
            if rows.size:
                inter = ((dy[rows, 0] - lowy[edges])
                         * (highx[edges] - lowx[edges])
                         / (highy[edges] - lowy[edges]) + lowx[edges])
                xi = np.floor(inter + 0.5).astype(np.int64) - x0
                np.add.at(diff, (rows, np.clip(xi, 0, W)), 1)
        # bottom-exact horizontal edges, right-to-left (llrasterize.cpp:198-213)
        hz = (ey1 == ey2) & (ex1 > ex2)
        for xa, xb, yy in zip(ex2[hz], ex1[hz], ey1[hz]):
            # fires only when the scanline center equals the edge y exactly
            row = yy - 0.5
            if row != np.floor(row):
                continue
            ri = int(row) - y0
            if not (0 <= ri < H):
                continue
            hx1 = int(np.floor(xa + 0.5))
            hx2 = int(np.floor(xb + 0.5))
            if hx2 <= x0:  # C: horizontal_x2 <= minx
                continue
            horiz[ri, max(hx1 - x0, 0):max(hx2 - x0, 0)] = True
    inside = (np.cumsum(diff[:, :W], axis=1) % 2).astype(bool)
    return inside | horiz


def bresenham_line_mask(coords: np.ndarray, y0: int, y1: int,
                        x0: int, x1: int) -> np.ndarray:
    """GDALdllImageLine (gdal/alg/llrasterize.cpp): classic integer
    Bresenham over floor()ed endpoints — the default (non-ALL_TOUCHED)
    polyline burn.  Tie handling (error exactly balanced, e.g. slope
    1/2) steps the minor axis on >= — anchored on the reference's own
    golden (autotest/alg/rasterize.py rasterize_1 checksum 6452; the
    strict-> reading of the loop produces 6443)."""
    H, W = y1 - y0, x1 - x0
    mask = np.zeros((H, W), dtype=bool)
    c = np.asarray(coords, dtype=np.float64)
    for j in range(1, len(c)):
        ix = int(np.floor(c[j - 1, 0]))
        iy = int(np.floor(c[j - 1, 1]))
        ix1 = int(np.floor(c[j, 0]))
        iy1 = int(np.floor(c[j, 1]))
        dx = abs(ix1 - ix)
        dy = abs(iy1 - iy)
        sx = -1 if ix > ix1 else 1
        sy = -1 if iy > iy1 else 1
        if dx >= dy:
            xerr = dy << 1
            yerr = xerr - (dx << 1)
            err = xerr - dx
            n = dx
            while n >= 0:
                if x0 <= ix < x1 and y0 <= iy < y1:
                    mask[iy - y0, ix - x0] = True
                ix += sx
                if err >= 0:
                    iy += sy
                    err += yerr
                else:
                    err += xerr
                n -= 1
        else:
            xerr = dx << 1
            yerr = xerr - (dy << 1)
            err = xerr - dy
            n = dy
            while n >= 0:
                if x0 <= ix < x1 and y0 <= iy < y1:
                    mask[iy - y0, ix - x0] = True
                iy += sy
                if err >= 0:
                    ix += sx
                    err += yerr
                else:
                    err += xerr
                n -= 1
    return mask


def burn_line_mask(coords: np.ndarray, y0: int, y1: int,
                   x0: int, x1: int) -> np.ndarray:
    """All pixels the polyline passes through (GDALdllImageLineAllTouched
    spirit): dense sampling at sub-pixel step — exact for the fixture
    scales we verify; vertices burn floor() pixels like GDALdllImagePoint."""
    H, W = y1 - y0, x1 - x0
    mask = np.zeros((H, W), dtype=bool)
    c = np.asarray(coords, dtype=np.float64)
    for i in range(len(c) - 1):
        (xa, ya), (xb, yb) = c[i], c[i + 1]
        n = int(max(abs(xb - xa), abs(yb - ya)) * 4) + 2
        t = np.linspace(0.0, 1.0, n)
        xs = np.floor(xa + (xb - xa) * t).astype(np.int64) - x0
        ys = np.floor(ya + (yb - ya) * t).astype(np.int64) - y0
        ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        mask[ys[ok], xs[ok]] = True
    return mask


# ---------------------------------------------------------------------------
# distributed operator
# ---------------------------------------------------------------------------

def rasterize(geoms: DataFrame, meta: RasterMeta,
              geom_id: str = "geom_id", wkb: str = "wkb",
              burn: str = "burn", init: float = 0.0,
              merge_alg: str = "replace",
              all_touched: bool = False) -> DataFrame:
    """Burn a geometry layer into block rows of ``meta``.

    ``geoms`` columns: geom_id (burn order — later ids overwrite), wkb
    (Point/LineString/Polygon/MultiPolygon, coords in the raster's geo
    space), burn (numeric burn value). Returns only blocks intersected by
    at least one geometry bbox; absent blocks are implicitly ``init``.

    ``merge_alg="add"`` accumulates instead of overwriting, in the
    band's dtype with native wraparound — GRMA_Add's in-place ``+=`` on
    the working buffer (gdal/alg/gdalrasterize.cpp:82-160).
    ``all_touched=True`` additionally burns every pixel a polygon
    boundary passes through (GDALdllImageLineAllTouched over each ring,
    gdal/alg/gdalrasterize.cpp:392-441), not just scanline-center fills.
    """
    g = meta.gt
    if g[2] != 0 or g[4] != 0:
        raise NotImplementedError("rotated geotransforms not supported")
    inv_px = 1.0 / g[1]
    inv_py = 1.0 / g[5]
    block, dtype = meta.block, meta.dtype
    width, height = meta.width, meta.height
    nbx, nby = meta.n_block_x, meta.n_block_y
    rid = meta.raster_id

    env = _with_envelope_px(geoms, wkb, g)
    # covering block range per geometry — pure column math + explode
    bx_lo = F.greatest(F.floor(F.col("_pxmin") / block), F.lit(0)).cast("int")
    bx_hi = F.least(F.floor(F.col("_pxmax") / block), F.lit(nbx - 1)).cast("int")
    by_lo = F.greatest(F.floor(F.col("_pymin") / block), F.lit(0)).cast("int")
    by_hi = F.least(F.floor(F.col("_pymax") / block), F.lit(nby - 1)).cast("int")
    keyed = (env.filter((bx_lo <= bx_hi) & (by_lo <= by_hi))
             .withColumn("bx", F.explode(F.sequence(bx_lo, bx_hi)))
             .withColumn("by", F.explode(F.sequence(by_lo, by_hi)))
             .select("bx", "by", F.col(geom_id).alias("_gid"),
                     F.col(wkb).alias("_wkb"), F.col(burn).alias("_burn")))

    def burn_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        arr = np.full((h, w), init, dtype=dtype)
        px0, py0 = bx * block, by * block
        pdf = pdf.sort_values("_gid")
        # zip columns: itertuples mangles underscore-prefixed names
        for wb, bv in zip(pdf["_wkb"], pdf["_burn"]):
            mask = _geom_mask(bytes(wb), g, inv_px, inv_py,
                              py0, py0 + h, px0, px0 + w,
                              all_touched=all_touched)
            if merge_alg == "add":
                # GRMA_Add: in-dtype +=, native wraparound like the
                # reference's unsigned char arithmetic
                arr[mask] += np.asarray(bv).astype(dtype)
            else:
                arr[mask] = bv
        return pd.DataFrame([(rid, 0, bx, by, w, h, arr.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    return keyed.groupBy("bx", "by").applyInPandas(burn_block, schema=TILE_SCHEMA)


def _geom_mask(wkb_bytes: bytes, g, inv_px, inv_py, y0, y1, x0, x1,
               all_touched: bool = False) -> np.ndarray:
    gtype = wkb_bytes[1] if wkb_bytes[0] == 1 else wkb_bytes[4]
    to_px = lambda c: np.column_stack((  # noqa: E731
        (c[:, 0] - g[0]) * inv_px, (c[:, 1] - g[3]) * inv_py))
    if gtype == G.WKB_POINT:
        x, y = G.decode_point(wkb_bytes)
        px = int(np.floor((x - g[0]) * inv_px))
        py = int(np.floor((y - g[3]) * inv_py))
        mask = np.zeros((y1 - y0, x1 - x0), dtype=bool)
        if y0 <= py < y1 and x0 <= px < x1:
            mask[py - y0, px - x0] = True
        return mask
    if gtype == G.WKB_LINESTRING:
        fn = burn_line_mask if all_touched else bresenham_line_mask
        return fn(to_px(G.decode_linestring(wkb_bytes)), y0, y1, x0, x1)
    # polygon / multipolygon: even-odd over all rings of all parts
    rings = [to_px(r) for part in G.decode_polygons(wkb_bytes) for r in part]
    mask = fill_polygon_mask(rings, y0, y1, x0, x1)
    if all_touched:
        for r in rings:
            mask |= burn_line_mask(r, y0, y1, x0, x1)
    return mask


def rasterize_points(points: DataFrame, meta: RasterMeta,
                     lon: str = "lon", lat: str = "lat",
                     burn: str = "burn", order: str | None = None,
                     merge_alg: str = "replace") -> DataFrame:
    """Zero-UDF point burn: pixel rows (px, py, burn_val).

    GDALdllImagePoint semantics (containing pixel = floor) as pure column
    math; overlapping points resolve last-wins in ``order`` (the reference
    burns features in layer order — gdalrasterize.cpp:560 loop) via a
    max_by aggregate, or accumulate with ``merge_alg="add"`` (GRMA_Add,
    gvBurnPoint += — gdal/alg/gdalrasterize.cpp:141, in-dtype wraparound
    applied for integer rasters). Entirely JVM-side: at 10^12 points this
    is one shuffle keyed by pixel.
    """
    g = meta.gt
    px = F.floor((F.col(lon) - F.lit(g[0])) / F.lit(g[1])).cast("long")
    py = F.floor((F.col(lat) - F.lit(g[3])) / F.lit(g[5])).cast("long")
    df = (points.withColumn("px", px).withColumn("py", py)
          .filter((F.col("px") >= 0) & (F.col("px") < meta.width)
                  & (F.col("py") >= 0) & (F.col("py") < meta.height)))
    if merge_alg == "add":
        acc = F.sum(F.col(burn).cast("double"))
        if meta.dtype == "uint8":
            acc = acc.cast("long") % 256  # unsigned-char += wraparound
        return df.groupBy("px", "py").agg(acc.cast("double").alias("burn_val"))
    winner = (F.max_by(F.col(burn), F.col(order)) if order
              else F.max(F.col(burn)))
    return df.groupBy("px", "py").agg(winner.alias("burn_val"))


def pixels_to_blocks(pixels: DataFrame, meta: RasterMeta,
                     val: str = "burn_val") -> DataFrame:
    """Scatter sparse pixel rows into dense block rows (absent pixels = 0).
    One groupBy(block) + numpy scatter per block."""
    block, dtype = meta.block, meta.dtype
    width, height, rid = meta.width, meta.height, meta.raster_id
    keyed = (pixels
             .withColumn("bx", F.floor(F.col("px") / block).cast("int"))
             .withColumn("by", F.floor(F.col("py") / block).cast("int")))

    def scatter(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bx, by = int(key[0]), int(key[1])
        w = min(block, width - bx * block)
        h = min(block, height - by * block)
        arr = np.zeros((h, w), dtype=dtype)
        lx = pdf["px"].to_numpy() - bx * block
        ly = pdf["py"].to_numpy() - by * block
        arr[ly, lx] = pdf[val].to_numpy()
        return pd.DataFrame([(rid, 0, bx, by, w, h, arr.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    return keyed.groupBy("bx", "by").applyInPandas(scatter, schema=TILE_SCHEMA)


def _with_envelope_px(geoms: DataFrame, wkb: str, g) -> DataFrame:
    """Attach pixel-space envelope columns in one Arrow pass."""
    schema = T.StructType(list(geoms.schema.fields) + [
        T.StructField(n, T.DoubleType(), True)
        for n in ("_pxmin", "_pymin", "_pxmax", "_pymax")])
    wkb_i = geoms.schema.fieldNames().index(wkb)
    inv_px, inv_py = 1.0 / g[1], 1.0 / g[5]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            pxmin = np.empty(n); pymin = np.empty(n)
            pxmax = np.empty(n); pymax = np.empty(n)
            for i, b in enumerate(pdf.iloc[:, wkb_i]):
                wb = bytes(b)
                gtype = wb[1] if wb[0] == 1 else wb[4]
                if gtype == G.WKB_POINT:
                    x, y = G.decode_point(wb)
                    xmin = xmax = x; ymin = ymax = y
                elif gtype == G.WKB_LINESTRING:
                    c = G.decode_linestring(wb)
                    xmin, ymin = c.min(axis=0); xmax, ymax = c.max(axis=0)
                else:
                    xmin, ymin, xmax, ymax = G.polygon_envelope(wb)
                xs = ((np.array([xmin, xmax]) - g[0]) * inv_px)
                ys = ((np.array([ymin, ymax]) - g[3]) * inv_py)
                pxmin[i], pxmax[i] = xs.min(), xs.max()
                pymin[i], pymax[i] = ys.min(), ys.max()
            out = pdf.copy()
            out["_pxmin"] = pxmin; out["_pymin"] = pymin
            out["_pxmax"] = pxmax; out["_pymax"] = pymax
            yield out

    return geoms.mapInPandas(run, schema=schema)
