"""Arc/Info Binary Grid (AIG) coverage reader — pure numpy, from the
public grid layout as implemented by the reference
(gdal/frmts/aigrid/: gridlib.c block codecs, aigopen.c tile naming,
aigdataset.cpp band typing).

A coverage is a directory: ``hdr.adf`` (cell type, block grid, cell
size), ``dblbnd.adf`` (bounds, 4 MSB doubles), ``sta.adf`` (min max
mean stddev), ``w001001.adf`` + ``w001001x.adf`` (tile data + block
index; extra tiles w%03d001 / z%03d%03d for huge grids), optional
``<name>.clr`` colormap and ``vat.adf`` attribute table.

Integer blocks decode through the magic-coded schemes: raw 1/4/8/16/
32-bit, constant, CCITT-RLE 1-bit (fax.decode_rle), and the run-length
families 0xE0/0xF0/0xF8/0xFC/0xD7/0xCF/0xDF with min-offset and
>128 nodata runs.  Band type follows the reference: Byte when stats
fit 0..254 (nodata 255), Int16 within +/-32767 (nodata -32768), else
Int32 (nodata -2147483647); float grids are raw MSB f32.
"""

from __future__ import annotations

import os
import struct

import numpy as np

NO_DATA = -2147483647
FLOAT_NO_DATA = -3.4028234663852886e38


class AIGGrid:
    def _file(self, name: str) -> str:
        """Coverage member by case-insensitive name (uppercase
        coverages are common on CD distributions — autotest aigrid_4)."""
        p = os.path.join(self.path, name)
        if os.path.exists(p):
            return p
        for f in os.listdir(self.path):
            if f.lower() == name:
                return os.path.join(self.path, f)
        return p                              # let open() raise

    def __init__(self, path: str):
        """path: the coverage directory (or any file inside it)."""
        if os.path.isfile(path):
            path = os.path.dirname(path)
        self.path = path
        h = open(self._file("hdr.adf"), "rb").read()
        if h[:8] != b"GRID1.2\x00":
            raise ValueError("not an Arc/Info binary grid (hdr.adf magic)")
        self.cell_type = struct.unpack_from(">i", h, 16)[0]
        self.compressed = struct.unpack_from(">i", h, 20)[0] == 0
        self.cell_dx, self.cell_dy = struct.unpack_from(">2d", h, 256)
        self.blocks_per_row = struct.unpack_from(">i", h, 288)[0]
        self.blocks_per_col = struct.unpack_from(">i", h, 292)[0]
        self.block_w = struct.unpack_from(">i", h, 296)[0]
        self.block_h = struct.unpack_from(">i", h, 304)[0]

        b = open(self._file("dblbnd.adf"), "rb").read()
        self.llx, self.lly, self.urx, self.ury = struct.unpack(">4d", b[:32])
        self.width = int((self.urx - self.llx + 0.5 * self.cell_dx)
                         / self.cell_dx)
        self.height = int((self.ury - self.lly + 0.5 * self.cell_dy)
                          / self.cell_dy)

        self.dfmin = self.dfmax = 0.0
        sta = self._file("sta.adf")
        if os.path.exists(sta):
            s = open(sta, "rb").read()
            if len(s) >= 16:
                self.dfmin, self.dfmax = struct.unpack(">2d", s[:16])

        self.tile_w = self.block_w * self.blocks_per_row
        self.tile_h = self.block_h * self.blocks_per_col
        self.tiles_per_row = (self.width - 1) // self.tile_w + 1
        self.tiles_per_col = (self.height - 1) // self.tile_h + 1

    # -------------- typing --------------

    def dtype(self):
        if self.cell_type != 1:
            return np.dtype(np.float32)
        if 0.0 <= self.dfmin and self.dfmax <= 254.0:
            return np.dtype(np.uint8)
        if -32767 <= self.dfmin and self.dfmax <= 32767:
            return np.dtype(np.int16)
        return np.dtype(np.int32)

    def nodata(self):
        dt = self.dtype()
        return {np.dtype(np.uint8): 255.0, np.dtype(np.int16): -32768.0,
                np.dtype(np.int32): float(NO_DATA)}.get(dt, FLOAT_NO_DATA)

    # -------------- tiles --------------

    def _tile_basename(self, tx: int, ty: int) -> str:
        if ty == 0:
            return "w%03d001" % (tx + 1)
        if ty == 1:
            return "w%03d000" % (tx + 1)
        return "z%03d%03d" % (tx + 1, ty - 1)

    def _tile_index(self, base: str):
        """(offset, size) pairs from the <base>x.adf block index."""
        d = open(self._file(base + "x.adf"), "rb").read()
        if d[2] != 0x27 or d[3] != 0x0A:
            raise ValueError("block index magic corrupt")
        length = struct.unpack_from(">i", d, 24)[0] * 2
        n_blocks = (length - 100) // 8
        idx = np.frombuffer(d, ">u4", n_blocks * 2, 100).reshape(-1, 2)
        return idx[:, 0].astype(np.int64) * 2, idx[:, 1].astype(np.int64) * 2

    def read_band(self, band: int = 0) -> np.ndarray:
        out_dt = self.dtype()
        full = np.empty((self.tiles_per_col * self.tile_h,
                         self.tiles_per_row * self.tile_w),
                        np.float32 if self.cell_type == 2 else np.int64)
        full[:] = NO_DATA if self.cell_type == 1 else FLOAT_NO_DATA
        for ty in range(self.tiles_per_col):
            for tx in range(self.tiles_per_row):
                base = self._tile_basename(tx, ty)
                grid_path = self._file(base + ".adf")
                if not os.path.exists(grid_path):
                    continue                 # missing tile = nodata
                offs, sizes = self._tile_index(base)
                data = open(grid_path, "rb").read()
                for i in range(len(offs)):
                    by, bx = divmod(i, self.blocks_per_row)
                    blk = self._read_block(data, int(offs[i]),
                                           int(sizes[i]))
                    y0 = ty * self.tile_h + by * self.block_h
                    x0 = tx * self.tile_w + bx * self.block_w
                    full[y0:y0 + self.block_h,
                         x0:x0 + self.block_w] = \
                        blk.reshape(self.block_h, self.block_w)
        full = full[:self.height, :self.width]
        if self.cell_type == 2:
            return full.astype(np.float32)
        out = full.copy()
        nd = int(self.nodata()) if out_dt.kind in "iu" else NO_DATA
        out[full == NO_DATA] = nd
        return out.astype(out_dt)

    def _read_block(self, data: bytes, off: int, size: int) -> np.ndarray:
        n = self.block_w * self.block_h
        if size == 0:
            return np.full(n, NO_DATA, np.int64)
        stored = (data[off] * 256 + data[off + 1]) * 2
        if stored != size:
            raise ValueError("block size mismatch")
        cur = off + 2
        if self.cell_type == 2:               # float: raw MSB f32
            return np.frombuffer(data, ">f4", n, cur).astype(np.float32)
        if not self.compressed:
            return np.frombuffer(data, ">i4", n, cur).astype(np.int64)

        magic = data[cur]
        min_size = data[cur + 1]
        cur += 2
        nmin = 0
        if min_size == 4:
            nmin = struct.unpack_from(">i", data, cur)[0]
        elif min_size:
            for k in range(min_size):
                nmin = nmin * 256 + data[cur + k]
            if data[cur] > 127:               # sign-extend
                nmin -= 1 << (8 * min_size)
        cur += min_size
        avail = off + 2 + size - cur

        if magic == 0x08:
            return np.frombuffer(data, np.uint8, n, cur) \
                .astype(np.int64) + nmin
        if magic == 0x04:
            b = np.frombuffer(data, np.uint8, (n + 1) // 2, cur)
            v = np.empty(len(b) * 2, np.int64)
            v[0::2] = b >> 4
            v[1::2] = b & 0xF
            return v[:n] + nmin
        if magic == 0x01:
            b = np.frombuffer(data, np.uint8, (n + 7) // 8, cur)
            return np.unpackbits(b)[:n].astype(np.int64) + nmin
        if magic == 0x00:
            return np.full(n, nmin, np.int64)
        if magic == 0x10:
            return np.frombuffer(data, ">u2", n, cur).astype(np.int64) + nmin
        if magic == 0x20:
            return np.frombuffer(data, ">i4", n, cur).astype(np.int64) + nmin
        if magic == 0xFF:
            from gdal_spark.raster.fax import decode_rle
            bits = decode_rle(bytes(data[cur:cur + avail]),
                              self.block_w, self.block_h)
            return bits.reshape(-1).astype(np.int64) + nmin
        return self._rle_block(data, cur, avail, magic, nmin, n)

    def _rle_block(self, data, cur, avail, magic, nmin, n):
        """gridlib.c AIGProcessBlock run families."""
        out = np.empty(n, np.int64)
        pos = 0
        end = cur + avail
        while pos < n and cur < end:
            marker = data[cur]
            cur += 1
            if magic == 0xE0:
                v = struct.unpack_from(">i", data, cur)[0] + nmin
                cur += 4
                out[pos:pos + marker] = v
                pos += marker
            elif magic == 0xF0:
                v = data[cur] * 256 + data[cur + 1] + nmin
                cur += 2
                out[pos:pos + marker] = v
                pos += marker
            elif magic in (0xFC, 0xF8):
                out[pos:pos + marker] = data[cur] + nmin
                cur += 1
                pos += marker
            elif magic == 0xDF and marker < 128:
                out[pos:pos + marker] = nmin
                pos += marker
            elif magic == 0xD7 and marker < 128:
                out[pos:pos + marker] = np.frombuffer(
                    data, np.uint8, marker, cur).astype(np.int64) + nmin
                cur += marker
                pos += marker
            elif magic == 0xCF and marker < 128:
                out[pos:pos + marker] = np.frombuffer(
                    data, ">u2", marker, cur).astype(np.int64) + nmin
                cur += 2 * marker
                pos += marker
            elif marker > 128:
                run = 256 - marker
                out[pos:pos + run] = NO_DATA
                pos += run
            else:
                raise ValueError(f"AIG block magic 0x{magic:02X}")
        if pos < n:
            raise ValueError("AIG block ran out of data")
        return out

    def geotransform(self):
        return (self.llx, self.cell_dx, 0.0, self.ury, 0.0, -self.cell_dy)

    def color_table(self):
        """256-entry RGBA from the coverage's .clr file, or None."""
        clr = None
        for f in os.listdir(self.path):
            if f.lower().endswith(".clr"):
                clr = os.path.join(self.path, f)
                break
        if clr is None:
            return None
        out = np.zeros((256, 4), np.uint8)
        out[:, 3] = 255
        maxv = 0
        for line in open(clr):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            v = int(parts[0])
            out[v, :3] = [int(parts[1]), int(parts[2]), int(parts[3])]
            maxv = max(maxv, v)
        return out[:max(maxv + 1, 256)]


def open_aig(path: str) -> AIGGrid:
    return AIGGrid(path)


def read_aig(spark, path: str, raster_id: str | None = None,
             block: int = 256):
    """Distributed read: header/index on the driver, tile data decoded
    in executor tasks (one task per coverage tile via mapInPandas)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

    g = open_aig(path)
    rid = raster_id or os.path.basename(os.path.normpath(g.path))
    meta = RasterMeta(rid, g.width, g.height, gt=g.geotransform(),
                      dtype=g.dtype().name, block=block,
                      nodata=g.nodata())
    height, width = g.height, g.width
    dt = g.dtype()

    spec = spark.createDataFrame(
        [(0,)], StructType([StructField("part", IntegerType())]))

    def run(batches):
        gg = open_aig(path)
        arr = gg.read_band(0).astype(dt, copy=False)
        for pdf in batches:
            rows = []
            for _ in pdf["part"]:
                for by in range((height + block - 1) // block):
                    for bx in range((width + block - 1) // block):
                        sub = np.ascontiguousarray(
                            arr[by * block:(by + 1) * block,
                                bx * block:(bx + 1) * block])
                        rows.append((rid, 0, bx, by, sub.shape[1],
                                     sub.shape[0], sub.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA])

    return spec.mapInPandas(run, schema=TILE_SCHEMA), meta
