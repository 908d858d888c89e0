"""Rasterlite reader — SpatiaLite databases holding tiled rasters.

Reference semantics: gdal/frmts/rasterlite/rasterlitedataset.cpp — a
dataset named ``RASTERLITE:file,table=T[,minx=..,...][,bands=N][,level=L]``
reads ``T_metadata`` rows (tile bounds in a SpatiaLite geometry BLOB,
width/height/pixel sizes) joined 1:1 to ``T_rasters`` image BLOBs
(JPEG/PNG/GIF/TIFF per tile); distinct pixel_x_size values form the
overview levels (raster_pyramids table :331-392), the dataset extent is
the union of tile MBRs (or a user extent), and GIF/PNG palettes load as
a color table unless bands=3 expansion is requested (:744-788).

Spark shape: the metadata table is index-scale (one row per tile) and
loads on the driver; tile BLOBs decode in executors (mapInPandas over
the tile list, one read-only sqlite connection per task, same pattern
as raster/mbtiles.py). A continent-scale rasterlite DB fans out to
#tiles-way parallelism with zero driver pixel traffic."""
from __future__ import annotations

import sqlite3
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.raster.imagecodec import (decode_any, detect_format,
                                          gif_decode_indexed,
                                          png_decode_indexed)
from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta


def _mbr(geom: bytes) -> tuple[float, float, float, float]:
    """SpatiaLite geometry BLOB header: 00, endian byte, srid int32,
    then the MBR as 4 doubles (minx miny maxx maxy)."""
    if not geom or geom[0] != 0:
        raise ValueError("not a SpatiaLite geometry blob")
    bo = "<" if geom[1] == 1 else ">"
    return struct.unpack_from(bo + "4d", geom, 6)


class Rasterlite:
    """Driver-side handle: metadata rows, levels, extent, color table."""

    def __init__(self, path: str, table: str | None = None,
                 extent: tuple[float, float, float, float] | None = None):
        self.path = path
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            if table is None:
                tabs = [r[0] for r in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table' "
                    "AND name LIKE '%_metadata'")]
                if len(tabs) != 1:
                    raise ValueError(
                        f"need explicit table=, found {tabs}")
                table = tabs[0][:-len("_metadata")]
            self.table = table
            rows = con.execute(
                f'SELECT m.id, m.width, m.height, m.pixel_x_size, '
                f'm.pixel_y_size, m.geometry FROM "{table}_metadata" m '
                f'WHERE m.width > 0').fetchall()
            try:
                srid = con.execute(
                    "SELECT srid FROM geometry_columns WHERE "
                    "f_table_name LIKE ?", (f"{table}_metadata",)
                ).fetchone()
                self.srid = srid[0] if srid else None
            except sqlite3.OperationalError:
                self.srid = None
        finally:
            con.close()
        if not rows:
            raise ValueError(f"no tiles in {table}_metadata")
        self.tiles = []
        for tid, w, h, px, py, geom in rows:
            minx, miny, maxx, maxy = _mbr(geom)
            self.tiles.append((tid, w, h, px, py, minx, miny, maxx, maxy))
        self.levels = sorted({round(t[3], 10) for t in self.tiles})
        self.user_extent = extent

    def level_tiles(self, level: int = 0):
        px = self.levels[level]
        return [t for t in self.tiles if round(t[3], 10) == px]

    def geometry(self, level: int = 0):
        """(extent, xsize, ysize, px, py) at one pyramid level."""
        tiles = self.level_tiles(level)
        px, py = tiles[0][3], tiles[0][4]
        if self.user_extent is not None:
            minx, miny, maxx, maxy = self.user_extent
        else:
            minx = min(t[5] for t in tiles)
            miny = min(t[6] for t in tiles)
            maxx = max(t[7] for t in tiles)
            maxy = max(t[8] for t in tiles)
        # C (int)(x + 0.5): truncation toward zero after +0.5, exactly
        # rasterlitedataset.cpp's size/placement rounding
        xsize = int((maxx - minx) / px + 0.5)
        ysize = int((maxy - miny) / py + 0.5)
        return (minx, miny, maxx, maxy), xsize, ysize, px, py

    def color_table(self) -> np.ndarray | None:
        """Palette of the first tile when it is an indexed format."""
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        try:
            tid = self.level_tiles(0)[0][0]
            blob = con.execute(
                f'SELECT raster FROM "{self.table}_rasters" WHERE id=?',
                (tid,)).fetchone()[0]
        finally:
            con.close()
        kind = detect_format(bytes(blob))
        try:
            if kind == "gif":
                return gif_decode_indexed(bytes(blob))[1]
            if kind == "png":
                return png_decode_indexed(bytes(blob))[1]
        except Exception:
            return None
        return None


def open_rasterlite(path: str, table: str | None = None,
                    extent=None) -> Rasterlite:
    return Rasterlite(path, table, extent)


def read_rasterlite(spark: SparkSession, path: str,
                    table: str | None = None, level: int = 0,
                    bands: int | None = None, extent=None,
                    raster_id: str = "rasterlite",
                    ) -> tuple[DataFrame, RasterMeta]:
    """Tiles DataFrame (TILE_SCHEMA, one row per tile per band) + meta.
    ``bands=3`` expands an indexed palette to RGB
    (rasterlitedataset.cpp color-table expansion); default keeps the
    palette index band when the tiles are GIF/PNG-indexed."""
    rl = Rasterlite(path, table, extent)
    (minx, miny, maxx, maxy), xsize, ysize, px, py = rl.geometry(level)
    tiles = rl.level_tiles(level)
    gt = (minx, px, 0.0, maxy, 0.0, -py)
    first_kind = None
    expand = bands == 3
    tab = rl.table

    cells = pd.DataFrame(
        tiles, columns=["tid", "w", "h", "px", "py",
                        "minx", "miny", "maxx", "maxy"])
    cdf = spark.createDataFrame(cells)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    blob = con.execute(
                        f'SELECT raster FROM "{tab}_rasters" '
                        f'WHERE id=?', (int(r.tid),)).fetchone()[0]
                    blob = bytes(blob)
                    kind = detect_format(blob)
                    if not expand and kind == "gif":
                        arr = gif_decode_indexed(blob)[0]
                    elif not expand and kind == "png":
                        try:
                            arr = png_decode_indexed(blob)[0]
                        except Exception:
                            arr = decode_any(blob)
                    else:
                        arr = decode_any(blob)
                    if arr.ndim == 2:
                        arr = arr[:, :, None]
                    if expand and arr.shape[2] == 1:
                        pal = (gif_decode_indexed(blob)[1]
                               if kind == "gif"
                               else png_decode_indexed(blob)[1])
                        arr = pal[arr[:, :, 0]][:, :, :3]
                    # pixel placement from the tile MBR with the
                    # reference's per-block C rounding
                    # (rasterlitedataset.cpp:185-219): the +0.5 trunc
                    # of both edges can claim one extra dst row/col,
                    # which re-reads (replicates) the last source
                    # row/col — the autotest overview checksums
                    # depend on it
                    x0 = int((r.minx - minx) / px + 0.5)
                    y0 = int((maxy - r.maxy) / py + 0.5)
                    x1 = int((r.maxx - minx) / px + 0.5)
                    y1 = int((maxy - r.miny) / py + 0.5)
                    h, w = arr.shape[:2]
                    dx = np.arange(max(0, x0), min(x1, xsize))
                    dy = np.arange(max(0, y0), min(y1, ysize))
                    if not len(dx) or not len(dy):
                        continue
                    sub = arr[np.clip(dy - y0, 0, h - 1)][
                        :, np.clip(dx - x0, 0, w - 1)]
                    for b in range(sub.shape[2]):
                        out.append((raster_id, b, int(dx[0]), int(dy[0]),
                                    sub.shape[1], sub.shape[0],
                                    np.ascontiguousarray(
                                        sub[:, :, b]).tobytes()))
                yield pd.DataFrame(
                    out, columns=[f.name for f in TILE_SCHEMA])
        finally:
            con.close()

    # block=1 marks free-form tile placement (bx/by are pixel offsets)
    meta = RasterMeta(raster_id, xsize, ysize, gt=gt, dtype="uint8",
                      block=1)
    return cdf.mapInPandas(run, schema=TILE_SCHEMA), meta


def rasterlite_to_array(spark: SparkSession, path: str, band: int = 0,
                        **kw) -> np.ndarray:
    """Assemble one band (tests / small outputs)."""
    df, meta = read_rasterlite(spark, path, **kw)
    arr = np.zeros((meta.height, meta.width), np.uint8)
    for r in df.filter(df.band == band).collect():
        block = np.frombuffer(bytes(r["data"]), np.uint8) \
            .reshape(r["h"], r["w"])
        arr[r["by"]:r["by"] + r["h"], r["bx"]:r["bx"] + r["w"]] = block
    return arr
