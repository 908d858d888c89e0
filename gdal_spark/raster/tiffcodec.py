"""TIFF compression codecs in pure Python/numpy: LZW, PackBits, Deflate.

Re-implemented from the public TIFF 6.0 specification (section 9 LZW with
the "early change" convention every mainstream writer uses, section 13
PackBits) and the Adobe Deflate extension (Compression=8, and the legacy
32946 alias) via the stdlib ``zlib``. Reference driver semantics:
gdal/frmts/gtiff/geotiff.cpp (codec negotiation) — no code is shared; the
reference delegates to libtiff, this module is the spec re-expressed.

Horizontal-differencing Predictor=2 (TIFF 6.0 section 14) is implemented
as vectorized numpy cumsum/diff across the row axis.

Scale model: codecs run inside Arrow batches on executors — one tile
(<= block² pixels) per call. LZW is bounded per tile; Deflate dominates
for throughput and is the default compressed write path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF Compression tag values
COMP_NONE = 1
COMP_LZW = 5
COMP_DEFLATE = 8
COMP_PACKBITS = 32773
COMP_DEFLATE_LEGACY = 32946

NAMES = {"none": COMP_NONE, "lzw": COMP_LZW, "deflate": COMP_DEFLATE,
         "packbits": COMP_PACKBITS}

_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (9→12-bit codes, MSB-first bit packing, early
    change: the code width grows when the table reaches 2^bits - 1)."""
    out = bytearray()
    table: list[bytes] = []
    nbits = 9
    prev = b""
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + nbits <= total_bits and len(out) < max_out:
        b0 = bitpos >> 3
        chunk = int.from_bytes(data[b0:b0 + 3].ljust(3, b"\x00"), "big")
        code = (chunk >> (24 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = b""
            continue
        if code == _EOI:
            break
        if not prev:
            entry = table[code]
        else:
            entry = table[code] if code < len(table) else prev + prev[:1]
            table.append(prev + entry[:1])
            # "early change" (TIFF 6.0 section 9 + libtiff convention):
            # widen one entry before the 2^bits boundary — validated
            # against javax.imageio's libtiff-compatible LZW writer.
            if len(table) == (1 << nbits) - 1 and nbits < 12:
                nbits += 1
        out += entry
        prev = entry
    return bytes(out)


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.n = 0
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (early change; Clear emitted whenever the
    table would exceed the 12-bit ceiling). Round-trips with lzw_decode
    and follows the same convention as the spec's sample code."""
    w = _BitWriter()
    nbits = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    w.put(_CLEAR, nbits)
    run = b""
    for i in range(len(data)):
        ch = data[i:i + 1]
        cand = run + ch
        if cand in table:
            run = cand
            continue
        w.put(table[run], nbits)
        table[cand] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by one entry, so the
        # encoder widens at 2^bits to match the decoder's 2^bits - 1
        # (one earlier than classic LZW's 2^bits + 1 — "early change")
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
        if next_code >= 4094:  # 12-bit table nearly full → restart
            w.put(_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        run = ch
    if run:
        w.put(table[run], nbits)
    w.put(_EOI, nbits)
    return w.done()


def packbits_decode(data: bytes, max_out: int) -> bytes:
    """TIFF 6.0 section 13 / Apple PackBits run-length decoding."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < max_out:
        h = data[i]
        i += 1
        if h == 128:  # noop
            continue
        if h < 128:  # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        else:  # repeat next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """PackBits encoder: replicate runs >= 3 become repeat packets,
    everything between becomes literal packets (<=128 bytes each)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal: extend until a run of >=3 starts (or 128 bytes)
        lit_start = i
        i = j
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        lit = data[lit_start:min(i, lit_start + 128)]
        i = lit_start + len(lit)
        out.append(len(lit) - 1)
        out += lit
    return bytes(out)


def decompress(codec: int, data: bytes, max_out: int) -> bytes:
    if codec == COMP_NONE:
        return data
    if codec in (COMP_DEFLATE, COMP_DEFLATE_LEGACY):
        return zlib.decompress(data)
    if codec == COMP_LZW:
        return lzw_decode(data, max_out)
    if codec == COMP_PACKBITS:
        return packbits_decode(data, max_out)
    raise ValueError(f"compressed TIFF (Compression={codec}) unsupported: "
                     "only none/LZW/Deflate/PackBits are implemented "
                     "(no JPEG codec libraries in this environment)")


def compress(codec: int, data: bytes) -> bytes:
    if codec == COMP_NONE:
        return data
    if codec in (COMP_DEFLATE, COMP_DEFLATE_LEGACY):
        return zlib.compress(data, 6)
    if codec == COMP_LZW:
        return lzw_encode(data)
    if codec == COMP_PACKBITS:
        return packbits_encode(data)
    raise ValueError(f"unsupported write codec {codec}")


def predictor_undo(raw: bytes, width: int, height: int,
                   dtype: str, spp: int = 1) -> bytes:
    """Predictor=2 (horizontal differencing): rows store per-sample
    deltas; reconstruct with cumsum along the row (modular integer
    arithmetic, so plain wrapping cumsum in the storage dtype)."""
    arr = np.frombuffer(raw, dtype=np.dtype(dtype)).copy()
    arr = arr.reshape(height, width, spp)
    np.cumsum(arr, axis=1, dtype=arr.dtype, out=arr)
    return arr.tobytes()


def predictor_apply(raw: bytes, width: int, height: int,
                    dtype: str, spp: int = 1) -> bytes:
    arr = np.frombuffer(raw, dtype=np.dtype(dtype)).reshape(
        height, width, spp)
    out = arr.copy()
    out[:, 1:, :] = arr[:, 1:, :] - arr[:, :-1, :]
    return out.tobytes()
