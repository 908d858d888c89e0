"""Intergraph Raster (INGR .cot/.cit) reader.

Reference semantics: gdal/frmts/ingr/ — packed 512-byte Header One +
256-byte Header Two-A per band (IngrTypes.cpp INGR_HeaderOneDiskToMem
field order), bands catenated via CatenatedFilePointer
(IntergraphDataset.cpp:Open), data at bandOffset + 2*(WordsToFollow+1)
+ 2, IGDS color table right after Header Two (IngrTypes.cpp
INGR_GetIGDSColors), optional 140-byte tile directory when
DataTypeCode==65 (INGR_GetTileDirectory; zero-Start tiles are constant
fills from Used, IntergraphBand.cpp HandleUninstantiatedTile).
Decoders: signed-atom RLE (IngrTypes.cpp INGR_DecodeRunLength),
per-line paletted word RLE (:1006), bitonal word RLE with optional
0x5900 scanline headers (:1070) and its tiled variant (:1208); CCITT
G4 data is bit-reversed then fed to a fax decode
(INGR_CreateVirtualFile:819-831); JPEG bands store a raw entropy scan
completed by the canned JFIF header of JpegHelper.cpp
JPGHLP_HeaderMaker (fixed Huffman/quant tables, quality-30 halving).
Formats 27/67 decode to band-interleaved-by-line triples, 28 is
pixel-interleaved raw (IntergraphBand.cpp RGB/RLE IReadBlock).

Spark shape: headers parse on the driver (KB-scale); pixel work
distributes as one task row per tile per band for tiled files and one
per band for the stream-RLE/whole-image codings (the reference is
likewise a sequential single-stream decode there), mapInPandas over a
work-unit frame with executors reading their own byte ranges."""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

_DTYPES = {1: "uint8", 2: "uint8", 3: "int16", 4: "int32", 5: "float32",
           6: "float64", 9: "uint8", 10: "uint8", 24: "uint8",
           27: "uint8", 28: "uint8", 29: "uint8", 30: "uint8",
           31: "uint8", 67: "uint8"}

_RGB_FORMATS = {27, 28, 31, 67}
_STREAM_RLE = {9, 10, 27, 29, 67}

_ZIGZAG = np.array([
    0, 1, 5, 6, 14, 15, 27, 28, 2, 4, 7, 13, 16, 26, 29, 42,
    3, 8, 12, 17, 25, 30, 41, 43, 9, 11, 18, 24, 31, 40, 44, 53,
    10, 19, 23, 32, 39, 45, 52, 54, 20, 22, 33, 38, 46, 51, 55, 60,
    21, 34, 37, 47, 50, 56, 59, 61, 35, 36, 48, 49, 57, 58, 62, 63])

_DQT_LUM = bytes([
    10, 7, 6, 10, 14, 24, 31, 37, 7, 7, 8, 11, 16, 35, 36, 33,
    8, 8, 10, 14, 24, 34, 41, 34, 8, 10, 13, 17, 31, 52, 48, 37,
    11, 13, 22, 34, 41, 65, 62, 46, 14, 21, 33, 38, 49, 62, 68, 55,
    29, 38, 47, 52, 62, 73, 72, 61, 43, 55, 57, 59, 67, 60, 62, 59])

_DQT_CHR = bytes([
    10, 11, 14, 28, 59, 59, 59, 59, 11, 13, 16, 40, 59, 59, 59, 59,
    14, 16, 34, 59, 59, 59, 59, 59, 28, 40, 59, 59, 59, 59, 59, 59,
    59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59,
    59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59, 59])

_DC_CODES = [bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
             bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])]
_DC_SYMS = bytes(range(12))
_AC_CODES = [bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]),
             bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119])]
# ITU T.81 Annex K typical AC symbol tables (same bytes the reference
# embeds in JpegHelper.cpp)
_AC_SYMS = [bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xCA, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa]),
    bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xCA, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])]

_BITREV = np.array([int(f"{i:08b}"[::-1], 2) for i in range(256)],
                   np.uint8)


def _jfif_header(cols: int, rows: int, ncomp: int, quality: int) -> bytes:
    """JPGHLP_HeaderMaker byte-for-byte (JpegHelper.cpp:144-317)."""
    out = bytearray(b"\xff\xd8")
    out += bytes([0xFF, 0xE0, 0, 0x10]) + b"JFIF\x00\x01\x01\x00" \
        + bytes([0, 1, 0, 1, 0, 0])
    for i, tab in enumerate((_DQT_LUM, _DQT_CHR)[:min(2, ncomp)]):
        q = np.zeros(64, np.uint8)
        q[_ZIGZAG] = np.frombuffer(tab, np.uint8)
        if quality == 30:
            q = (q.astype(np.float64) * 0.5).astype(np.uint8)
        out += bytes([0xFF, 0xDB, 0, 67, i]) + q.tobytes()
    out += bytes([0xFF, 0xC0, 0, 17 if ncomp > 1 else 11, 8,
                  rows >> 8, rows & 255, cols >> 8, cols & 255, ncomp,
                  0, 0x21, 0])
    if ncomp > 1:
        out += bytes([1, 0x11, 1, 2, 0x11, 1])
    for i in range(min(2, ncomp)):
        for j, (codes, syms) in enumerate(
                ((_DC_CODES[i], _DC_SYMS), (_AC_CODES[i], _AC_SYMS[i]))):
            out += bytes([0xFF, 0xC4, 0, 3 + len(codes) + len(syms),
                          (j << 4) | i]) + codes + syms
    if ncomp > 1:
        out += bytes([0xFF, 0xDA, 0, 12, 3, 0, 0, 1, 0x11, 2, 0x11])
    else:
        out += bytes([0xFF, 0xDA, 0, 8, 1, 0, 0])
    out += bytes([0, 63, 0])
    return bytes(out)


# ---------------------------------------------------------------------------
# RLE decoders (IngrTypes.cpp:938-1280)
# ---------------------------------------------------------------------------

def _rle_atoms(src: bytes, out_size: int, start: int = 0
               ) -> tuple[np.ndarray, int]:
    """Signed-atom RLE: +n literal bytes, -n repeats of next byte."""
    out = np.empty(out_size, np.uint8)
    i, o, n = start, 0, len(src)
    while i < n and o < out_size:
        head = src[i]
        i += 1
        if head < 128 and head > 0:
            run = min(head, n - i, out_size - o)
            out[o:o + run] = np.frombuffer(src, np.uint8, run, i)
            i += run
            o += run
        elif head >= 128:
            run = min(256 - head, out_size - o)
            if i < n:
                out[o:o + run] = src[i]
                o += run
            i += 1
    return out[:o], i


def _rle_paletted_line(u16: np.ndarray, width: int, start: int
                       ) -> tuple[np.ndarray, int]:
    """(color, count) word pairs; 0x5900/0x5901 line headers skip one
    extra word (INGR_DecodeRunLengthPaletted)."""
    out = np.empty(width, np.uint8)
    i, o, n = start, 0, len(u16)
    while i < n and o < width:
        color = int(u16[i])
        i += 1
        if color in (0x5900, 0x5901):
            i += 1
            continue
        count = int(u16[i]) if i < n else 0
        i += 1
        run = min(count, width - o)
        out[o:o + run] = color & 0xFF
        o += run
    return out[:o], i


def _rle_bitonal_line(u16: np.ndarray, width: int, start: int
                      ) -> tuple[np.ndarray, int]:
    """Alternating white/black span words with the reference's
    header-sniffing and trailing-zero-span resync
    (INGR_DecodeRunLengthBitonal)."""
    out = np.zeros(width, np.uint8)
    i, n = start, len(u16)
    if i >= n:
        return out, i
    header = False
    if int(u16[i]) == 0x5900:
        if width < 0x5900:
            header = True
        elif (n - i >= 5 and int(u16[i + 1]) >= 3 and
              (int(u16[i + 1]) & 1) and int(u16[i + 3]) == 0):
            wts = int(u16[i + 1]) + 2
            header = True
            if n - i >= wts + 5:
                if (int(u16[i + wts]) != 0x5900 or
                        int(u16[i + wts + 1]) < 3 or
                        (int(u16[i + wts + 1]) & 1) == 0 or
                        int(u16[i + wts + 3]) != 0 or
                        ((int(u16[i + 2]) + 1) & 0xFFFF) !=
                        int(u16[i + wts + 2])):
                    header = False
            elif n - i < wts:
                header = False
            if header and int(np.sum(
                    u16[i + 4:i + wts].astype(np.int64))) != width:
                header = False
    if header:
        i += 4
    o = 0
    val = 0
    while i < n and o < width:
        run = int(u16[i])
        i += 1
        take = min(run, width - o)
        if val:
            out[o:o + take] = 1
        o += take
        val ^= 1
    # skip empty end-of-line spans, realigning parity
    if i < n and int(u16[i]) == 0:
        while i < n and int(u16[i]) == 0:
            i += 1
        if (i - start) & 1 == 0:
            i -= 1
    return out, i


def _rle_bitonal_tile(u16: np.ndarray, size: int) -> np.ndarray:
    """INGR_DecodeRunLengthBitonalTiled — with or without 0x5900
    headers, double-zero-span line resets in the headerless form."""
    out = np.zeros(size, np.uint8)
    i, o, n = 0, 0, len(u16)
    if n == 0:
        return out
    val = 0
    if int(u16[0]) != 0x5900:
        prev = 256
        while i < n and o < size:
            run = int(u16[i])
            i += 1
            if run == 0 and prev == 0:
                val = 0
            take = min(run, size - o)
            if val:
                out[o:o + take] = 1
            o += take
            if run != 0:
                val ^= 1
            prev = run
    else:
        while i < n and o < size:
            run = int(u16[i])
            i += 1
            if run == 0x5900:
                i += 3
                continue
            take = min(run, size - o)
            if val:
                out[o:o + take] = 1
            o += take
            val ^= 1
    return out


# ---------------------------------------------------------------------------
# Header parse (driver side)
# ---------------------------------------------------------------------------

class INGRBand:
    def __init__(self, data: bytes, offset: int, fsize: int):
        self.offset = offset
        h = data
        (self.htc, self.wtf, self.dtc, self.app) = \
            struct.unpack_from("<4H", h, offset)
        self.matrix = struct.unpack_from("<16d", h, offset + 56)
        self.width, self.height = struct.unpack_from("<2I", h, offset + 184)
        self.orientation = h[offset + 194]
        (self.ct_type,) = struct.unpack_from("<H", h, offset + 512 + 20)
        (self.n_ct,) = struct.unpack_from("<I", h, offset + 512 + 24)
        (self.catenated,) = struct.unpack_from("<I", h, offset + 512 + 16)
        (self.app_ptr, self.app_len) = \
            struct.unpack_from("<2I", h, offset + 512 + 28)
        self.data_offset = offset + 2 + 2 * (self.wtf + 1)
        self.format = self.dtc
        self.tiles = None
        self.tile_size = 0
        if self.dtc == 65:
            t = self.data_offset
            (app, sub) = struct.unpack_from("<2H", h, t)
            (self.format,) = struct.unpack_from("<H", h, t + 18)
            (self.tile_size,) = struct.unpack_from("<I", h, t + 120)
            ntx = -(-self.width // self.tile_size)
            nty = -(-self.height // self.tile_size)
            items = np.frombuffer(h, "<u4", 3 * ntx * nty, t + 128)
            self.tiles = items.reshape(-1, 3)  # start, allocated, used
        end = self.catenated if self.catenated else fsize
        self.data_size = end - self.data_offset
        # color tables: IGDS rgb triples right after header two-A,
        # Environ-V (slot, r, g, b) u16 entries after the full second
        # header block, normalized to 0-255 by the channel maximum
        # (INGR_GetIGDSColors / INGR_GetEnvironVColors)
        self.palette = None
        if self.n_ct and self.ct_type == 1:
            pal = np.frombuffer(h, np.uint8, min(self.n_ct, 256) * 3,
                                offset + 512 + 256).reshape(-1, 3)
            self.palette = pal.copy()
        elif self.n_ct and self.ct_type == 2:
            vlt = np.frombuffer(h, "<u2", self.n_ct * 4,
                                offset + 512 + 512).reshape(-1, 4)
            norm = vlt[:, 1:].max()
            norm = 255.0 / norm if norm else 0.0
            pal = np.zeros((256, 3), np.uint8)
            pal[vlt[:, 0] & 0xFF] = (vlt[:, 1:] * norm).astype(np.uint8)
            self.palette = pal

    @property
    def geotransform(self):
        m = self.matrix
        if not any(m[k] for k in (0, 2, 3, 4, 5, 7)):
            return (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
        return (m[3] - m[0] / 2, m[0], m[1], m[7] + m[5] / 2, m[4], -m[5])


class INGRFile:
    def __init__(self, path: str):
        data = open(path, "rb").read()
        if len(data) < 1024:
            raise ValueError("not an INGR file")
        htc = struct.unpack_from("<H", data)[0]
        # HTC bitfield: Version bits 0-5, Is2Dor3D bits 6-7, Type 8-15
        if (htc >> 8) != 9 or (htc & 0x3F) != 8 or \
                ((htc >> 6) & 3) not in (0, 3) or \
                data[511] not in (1, 2, 3):
            raise ValueError("not an INGR file")
        self.path = path
        self.data = data
        self.bands = []
        off = 0
        while True:
            b = INGRBand(data, off, len(data))
            self.bands.append(b)
            if not b.catenated:
                break
            off = b.catenated

    def n_output_bands(self) -> int:
        return sum(3 if b.format in _RGB_FORMATS else 1
                   for b in self.bands)


def open_ingr(path: str) -> INGRFile:
    return INGRFile(path)


# ---------------------------------------------------------------------------
# Band decode (executor side)
# ---------------------------------------------------------------------------

def _decode_band(data: bytes, b: INGRBand) -> list[np.ndarray]:
    """Whole-band decode -> one array per output band (1 or 3)."""
    fmt = b.format
    W, H = b.width, b.height
    dt = np.dtype(_DTYPES[fmt]).newbyteorder("<")
    raw = data[b.data_offset:b.data_offset + b.data_size]

    def finish(arr):
        return [arr] if arr.ndim == 2 else \
            [np.ascontiguousarray(arr[:, :, k]) for k in range(3)]

    if b.tiles is not None:
        ts = b.tile_size
        ntx = -(-W // ts)
        nch = 3 if fmt in _RGB_FORMATS else 1
        out = np.zeros((H, W, nch), dt) if nch == 3 else np.zeros((H, W), dt)
        for idx, (start, _alloc, used) in enumerate(b.tiles):
            ty, tx = divmod(idx, ntx)
            x0, y0 = tx * ts, ty * ts
            cw = min(ts, W - x0)
            ch = min(ts, H - y0)
            dst = out[y0:y0 + ch, x0:x0 + cw]
            if start == 0:
                # uninstantiated: constant fill from Used (per channel
                # byte shifts for RGB)
                if nch == 3:
                    for k, sh in ((0, 16), (1, 8), (2, 0)):
                        dst[:, :, k] = (int(used) >> sh) & 0xFF
                else:
                    dst[...] = np.array(int(used) & 0xFF).astype(dt)
                continue
            chunk = data[b.data_offset + int(start):
                         b.data_offset + int(start) + int(used)]
            dst[...] = _decode_tile(chunk, fmt, cw, ch, ts, dt, nch)
        return finish(out)

    if fmt in (2, 3, 4, 5, 6):
        arr = np.frombuffer(raw, dt, W * H).reshape(H, W)
        return [arr]
    if fmt == 28:
        arr = np.frombuffer(raw, np.uint8, W * H * 3).reshape(H, W, 3)
        return finish(arr)
    if fmt in (27, 67, 29):
        nch = 3 if fmt != 29 else 1
        dec, _ = _rle_atoms(raw, W * H * nch)
        full = np.zeros(W * H * nch, np.uint8)
        full[:len(dec)] = dec
        if nch == 1:
            return [full.reshape(H, W)]
        bil = full.reshape(H, 3, W)  # line-interleaved R,G,B
        return [np.ascontiguousarray(bil[:, k, :]) for k in range(3)]
    if fmt in (9, 10):
        u16 = np.frombuffer(raw, "<u2", len(raw) // 2)
        out = np.zeros((H, W), np.uint8)
        pos = 0
        line = _rle_bitonal_line if fmt == 9 else _rle_paletted_line
        for y in range(H):
            dec, pos = line(u16, W, pos)
            out[y, :len(dec)] = dec
        return [out]
    if fmt == 24:
        from gdal_spark.raster.fax import decode_g4
        rev = _BITREV[np.frombuffer(raw, np.uint8)].tobytes()
        return [decode_g4(rev, W, H)]
    if fmt in (30, 31):
        from gdal_spark.raster.jpegcodec import jpeg_decode
        ncomp = 3 if fmt == 31 else 1
        quality = _jpeg_quality(data, b)
        stream = _jfif_header(W, H, ncomp, quality) + raw
        arr = jpeg_decode(stream)
        return finish(arr if ncomp == 3 else arr)
    raise NotImplementedError(f"INGR format {fmt}")


def _decode_tile(chunk: bytes, fmt: int, cw: int, ch: int, ts: int,
                 dt, nch: int) -> np.ndarray:
    """One tile -> (ch, cw[, nch]) array. Edge tiles store cw-wide rows
    (ReshapeBlock semantics)."""
    if fmt in (2, 3, 4, 5, 6):
        return np.frombuffer(chunk, dt, cw * ch).reshape(ch, cw)
    if fmt == 28:
        return np.frombuffer(chunk, np.uint8, cw * ch * 3) \
            .reshape(ch, cw, 3)
    if fmt in (27, 67, 29):
        dec, _ = _rle_atoms(chunk, cw * ch * nch)
        full = np.zeros(cw * ch * nch, np.uint8)
        full[:len(dec)] = dec
        if nch == 1:
            return full.reshape(ch, cw)
        return np.stack([full.reshape(ch, 3, cw)[:, k, :]
                         for k in range(3)], axis=-1)
    if fmt == 9:
        u16 = np.frombuffer(chunk, "<u2", len(chunk) // 2)
        return _rle_bitonal_tile(u16, cw * ch).reshape(ch, cw)
    if fmt == 10:
        u16 = np.frombuffer(chunk, "<u2", len(chunk) // 2)
        out = np.zeros((ch, cw), np.uint8)
        pos = 0
        for y in range(ch):
            dec, pos = _rle_paletted_line(u16, cw, pos)
            out[y, :len(dec)] = dec
        return out
    if fmt == 24:
        from gdal_spark.raster.fax import decode_g4
        rev = _BITREV[np.frombuffer(chunk, np.uint8)].tobytes()
        return decode_g4(rev, cw, ch)
    if fmt in (30, 31):
        from gdal_spark.raster.jpegcodec import jpeg_decode
        ncomp = 3 if fmt == 31 else 1
        stream = _jfif_header(ts, ts, ncomp, 30) + chunk
        arr = jpeg_decode(stream)
        sub = arr[:ch, :cw]
        return sub if nch == 3 else sub
    raise NotImplementedError(f"INGR tiled format {fmt}")


def _jpeg_quality(data: bytes, b: INGRBand) -> int:
    """INGR_ReadJpegQuality (IngrTypes.cpp:870-900): walk application
    packets for type 2 / subtype 12."""
    ptr = b.app_ptr
    if ptr == 0:
        return 30
    limit = b.offset + b.app_len
    while ptr + 12 <= len(data):
        app, sub, remaining, _ver, quality = \
            struct.unpack_from("<HHIHH", data, ptr)
        if app == 2 and sub == 12:
            return quality
        ptr += remaining
        if remaining == 0 or ptr > limit - 12:
            return 30
    return 30


# ---------------------------------------------------------------------------
# Spark entry
# ---------------------------------------------------------------------------

def read_ingr(spark: SparkSession, path: str, raster_id: str = "ingr",
              block: int = 512) -> tuple[DataFrame, RasterMeta]:
    """Tiles DataFrame (TILE_SCHEMA; one band per output channel,
    RGB formats expand to 3) + meta from the first band header."""
    f = INGRFile(path)
    b0 = f.bands[0]
    units = []
    out_band = 0
    for bi, b in enumerate(f.bands):
        units.append((bi, out_band))
        out_band += 3 if b.format in _RGB_FORMATS else 1
    meta = RasterMeta(raster_id, b0.width, b0.height,
                      gt=b0.geotransform, dtype=_DTYPES[b0.format],
                      block=block)
    udf_df = spark.createDataFrame(
        pd.DataFrame(units, columns=["band_idx", "out_band"]))
    blk = block

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        data = open(path, "rb").read()
        ff = INGRFile(path)
        for pdf in batches:
            rows = []
            for bi, ob in zip(pdf["band_idx"], pdf["out_band"]):
                arrs = _decode_band(data, ff.bands[int(bi)])
                for k, arr in enumerate(arrs):
                    for by in range(0, arr.shape[0], blk):
                        for bx in range(0, arr.shape[1], blk):
                            sub = np.ascontiguousarray(
                                arr[by:by + blk, bx:bx + blk])
                            rows.append((raster_id, int(ob) + k,
                                         bx // blk, by // blk,
                                         sub.shape[1], sub.shape[0],
                                         sub.tobytes()))
            yield pd.DataFrame(rows, columns=[x.name for x in TILE_SCHEMA])

    return udf_df.mapInPandas(run, schema=TILE_SCHEMA), meta
