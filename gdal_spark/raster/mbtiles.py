"""MBTiles reader — sqlite tile pyramids (the MapBox spec), mirroring
the reference driver's semantics (gdal/frmts/mbtiles/mbtilesdataset.cpp):

- ``tiles(zoom_level, tile_column, tile_row, tile_data)`` with TMS row
  order (row 0 at the south edge);
- dataset = the maximum zoom level, extent snapped to the union of its
  tiles on the global Web-Mercator grid; lower zoom levels surface as
  overviews;
- tile blobs are PNG or JPEG, sniffed per tile and decoded with the
  engine's own codecs; band count follows the first tile (palette PNGs
  expand to RGB);
- ``metadata`` key/values (bounds etc.) pass through.

Scale shape: the tile index is tiny driver-side metadata; tile blobs
decode in executor tasks (mapInPandas over the tile list, one sqlite
read-only connection per task) — the engine's 256-px TILE_SCHEMA grid
maps 1:1 onto MBTiles tiles, so the read is shuffle-free.
"""

from __future__ import annotations

import sqlite3

import numpy as np

# Web-Mercator full extent (gdal2tiles/mbtiles share this constant)
MAX_EXTENT = 20037508.34
TILE = 256


def _decode_tile(blob: bytes) -> np.ndarray:
    """(256, 256, C) uint8 from a PNG or JPEG tile blob."""
    from gdal_spark.raster.imagecodec import png_decode
    from gdal_spark.raster.jpegcodec import jpeg_decode
    if blob[:2] == b"\xff\xd8":
        arr = jpeg_decode(bytes(blob))
    elif blob[:8] == b"\x89PNG\r\n\x1a\n":
        arr = png_decode(bytes(blob))
    else:
        raise ValueError("tile blob is neither PNG nor JPEG")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


class MBTiles:
    def __init__(self, path: str, zoom: int | None = None):
        self.path = path
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            self.metadata = dict(con.execute(
                "SELECT name, value FROM metadata").fetchall())
        except sqlite3.OperationalError:
            self.metadata = {}
        zooms = [z for (z,) in con.execute(
            "SELECT DISTINCT zoom_level FROM tiles ORDER BY 1")]
        if not zooms:
            con.close()
            raise ValueError("mbtiles file has no tiles")
        self.zooms = zooms
        self.zoom = zoom if zoom is not None else zooms[-1]
        (self.min_col, self.max_col, self.min_row,
         self.max_row) = con.execute(
            "SELECT min(tile_column), max(tile_column), "
            "min(tile_row), max(tile_row) FROM tiles WHERE zoom_level=?",
            (self.zoom,)).fetchone()
        first = con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? LIMIT 1",
            (self.zoom,)).fetchone()[0]
        self.n_bands = _decode_tile(first).shape[2]
        con.close()

        self.width = (self.max_col - self.min_col + 1) * TILE
        self.height = (self.max_row - self.min_row + 1) * TILE

    def geotransform(self):
        res = 2 * MAX_EXTENT / (TILE << self.zoom)
        ulx = -MAX_EXTENT + self.min_col * TILE * res
        uly = -MAX_EXTENT + (self.max_row + 1) * TILE * res
        return (ulx, res, 0.0, uly, 0.0, -res)

    def read_band(self, band: int = 0, zoom: int | None = None
                  ) -> np.ndarray:
        """Assembled band at a zoom level (defaults to the dataset
        zoom; lower zooms are the reference's overviews)."""
        z = self.zoom if zoom is None else zoom
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        rows = con.execute(
            "SELECT tile_column, tile_row, tile_data FROM tiles "
            "WHERE zoom_level=?", (z,)).fetchall()
        con.close()
        if z == self.zoom:
            c0, r1 = self.min_col, self.max_row
            w, h = self.width, self.height
        else:
            cols = [r[0] for r in rows]
            trows = [r[1] for r in rows]
            c0, r1 = min(cols), max(trows)
            w = (max(cols) - c0 + 1) * TILE
            h = (r1 - min(trows) + 1) * TILE
        out = np.zeros((h, w), np.uint8)
        for col, trow, blob in rows:
            arr = _decode_tile(blob)
            b = min(band, arr.shape[2] - 1)
            x0 = (col - c0) * TILE
            y0 = (r1 - trow) * TILE
            out[y0:y0 + TILE, x0:x0 + TILE] = arr[:, :, b]
        return out


def open_mbtiles(path: str, zoom: int | None = None) -> MBTiles:
    return MBTiles(path, zoom)


def read_mbtiles(spark, path: str, zoom: int | None = None,
                 raster_id: str | None = None):
    """Distributed read: the tile index frames the plan on the driver;
    each executor task decodes its tiles from a read-only sqlite
    connection.  Output tiles land directly on the engine's 256-px
    block grid (no re-blocking, no shuffle)."""
    import os

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

    mb = open_mbtiles(path, zoom)
    rid = raster_id or os.path.splitext(os.path.basename(path))[0]
    meta = RasterMeta(rid, mb.width, mb.height, gt=mb.geotransform(),
                      dtype="uint8", block=TILE)
    z, c0, r1 = mb.zoom, mb.min_col, mb.max_row
    n_bands = mb.n_bands

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    index = con.execute(
        "SELECT tile_column, tile_row FROM tiles WHERE zoom_level=?",
        (z,)).fetchall()
    con.close()

    spec = spark.createDataFrame(
        [(int(c), int(r)) for c, r in index],
        StructType([StructField("col", IntegerType()),
                    StructField("row", IntegerType())]))

    def run(batches):
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        for pdf in batches:
            rows = []
            for col, trow in zip(pdf["col"], pdf["row"]):
                blob = con.execute(
                    "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
                    "tile_column=? AND tile_row=?",
                    (z, int(col), int(trow))).fetchone()[0]
                arr = _decode_tile(blob)
                bx = int(col) - c0
                by = r1 - int(trow)
                for b in range(n_bands):
                    ch = min(b, arr.shape[2] - 1)
                    rows.append((rid, b, bx, by, TILE, TILE,
                                 np.ascontiguousarray(
                                     arr[:, :, ch]).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA])
        con.close()

    return spec.mapInPandas(run, schema=TILE_SCHEMA), meta


# ---------------------------------------------------------------------------
# MBTiles writer (round 5 — writer parity for pipeline sinks). Mirrors
# the reference CreateCopy (gdal/frmts/mbtiles/mbtilesdataset.cpp):
# tiles(zoom_level, tile_column, tile_row, tile_data) in TMS row order
# with PNG blobs from the engine's own encoder, plus the metadata
# key/values (name/type/version/description/format/bounds). The raster
# must sit on the global Web-Mercator grid at the chosen zoom (the
# MBTiles contract). Tile PNGs are encoded executor-side (Arrow batch
# per task); the single-writer sqlite insert is the only driver step.
# ---------------------------------------------------------------------------

def write_mbtiles(tiles_df, meta, path: str, zoom: int | None = None,
                  name: str | None = None) -> None:
    import math
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.raster.imagecodec import png_encode

    if meta.block != TILE:
        raise ValueError(f"MBTiles writes need {TILE}-px blocks")
    g = meta.gt
    if zoom is None:
        res = g[1]
        zoom = int(round(math.log2(2 * MAX_EXTENT / (TILE * res))))
    res = 2 * MAX_EXTENT / (TILE * (1 << zoom))
    if abs(g[1] - res) > 1e-6 * res:
        raise ValueError(
            f"geotransform pixel size {g[1]} is not the z{zoom} "
            f"Web-Mercator resolution {res}")
    col0 = int(round((g[0] + MAX_EXTENT) / (TILE * res)))
    row1 = int(round((MAX_EXTENT - g[3]) / (TILE * res)))  # top tile row (XYZ)
    nz = (1 << zoom)

    n_bands = tiles_df.select("band").distinct().count()

    def enc(batches):
        for pdf in batches:
            by_tile = {}
            for r in pdf.itertuples(index=False):
                by_tile.setdefault((r.bx, r.by), {})[r.band] = r
            rows = []
            for (bx, by), bands in by_tile.items():
                if len(bands) != n_bands:
                    # bands of one tile can land in different Arrow
                    # batches; route stragglers through a second pass
                    for b, r in bands.items():
                        rows.append((int(bx), int(by), int(b), False,
                                     r.w, r.h, bytes(r.data)))
                    continue
                arr = np.zeros((TILE, TILE, n_bands), np.uint8)
                for b, r in bands.items():
                    a = np.frombuffer(r.data, np.uint8).reshape(r.h, r.w)
                    arr[:r.h, :r.w, b] = a
                rows.append((int(bx), int(by), -1, True, TILE, TILE,
                             png_encode(arr[:, :, 0] if n_bands == 1
                                        else arr)))
            yield pd.DataFrame(rows, columns=["bx", "by", "band", "done",
                                              "w", "h", "blob"])

    # repartition so all bands of a tile share a task
    parts = tiles_df.repartition(32, "bx", "by").mapInPandas(
        enc, schema="bx int, by int, band int, done boolean, w int, "
                    "h int, blob binary").collect()
    blobs = {}
    strag = {}
    for r in parts:
        if r["done"]:
            blobs[(r["bx"], r["by"])] = bytes(r["blob"])
        else:
            strag.setdefault((r["bx"], r["by"]), {})[r["band"]] = r
    for (bx, by), bands in strag.items():
        arr = np.zeros((TILE, TILE, n_bands), np.uint8)
        for b, r in bands.items():
            a = np.frombuffer(r["blob"], np.uint8).reshape(r["h"], r["w"])
            arr[:r["h"], :r["w"], b] = a
        blobs[(bx, by)] = png_encode(arr[:, :, 0] if n_bands == 1 else arr)

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE metadata (name text, value text)")
    con.execute("CREATE TABLE tiles (zoom_level integer, "
                "tile_column integer, tile_row integer, tile_data blob)")
    con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                "(zoom_level, tile_column, tile_row)")
    # lon/lat bounds via inverse Web-Mercator
    def lon(xm):
        return xm / MAX_EXTENT * 180.0

    def lat(ym):
        return math.degrees(
            2 * math.atan(math.exp(ym / MAX_EXTENT * math.pi)) - math.pi / 2)
    minx, maxy = g[0], g[3]
    maxx = g[0] + meta.width * g[1]
    miny = g[3] + meta.height * g[5]
    md = {"name": name or os.path.splitext(os.path.basename(path))[0],
          "type": "overlay", "version": "1.1",
          "description": "gdal_spark MBTiles writer",
          "format": "png",
          "bounds": f"{lon(minx):.7f},{lat(miny):.7f},"
                    f"{lon(maxx):.7f},{lat(maxy):.7f}"}
    con.executemany("INSERT INTO metadata VALUES (?, ?)", md.items())
    for (bx, by), blob in blobs.items():
        col = col0 + bx
        xyz_row = row1 + by
        tms_row = nz - 1 - xyz_row
        con.execute("INSERT INTO tiles VALUES (?, ?, ?, ?)",
                    (zoom, col, tms_row, blob))
    con.commit()
    con.close()
