"""Pure-Python/numpy image + audio codecs: PNG, BMP, PPM/PGM, WAV.

Round 2/3 carried ``operators/multimodal.decode_image`` as an honest
stub ("no codec libraries in this container"). These formats need no
library — PNG is zlib (stdlib) + per-row filters (numpy), BMP/PPM/WAV
are plain structs — so the decode step is now real for the formats a
web-crawl pipeline actually meets in bulk. JPEG/video stay stubbed
(DCT entropy coding is a genuinely separate project).

Everything is re-implemented from the public specifications:

- PNG: RFC 2083 / W3C PNG spec (chunk layout, IHDR/PLTE/IDAT/IEND,
  filter types 0-4 incl. the Paeth predictor). The reference's PNG
  driver (gdal/frmts/png/pngdataset.cpp) delegates to libpng; this is
  the spec re-expressed, no shared code.
- BMP: BITMAPINFOHEADER layout (reference: gdal/frmts/bmp/bmpdataset.cpp
  semantics — bottom-up rows, BGR order, 4-byte row stride padding).
- PPM/PGM: netpbm P5/P6 binary headers.
- WAV: RIFF/WAVE canonical PCM layout (fmt + data chunks).

Scale model: codecs run inside Arrow batches on executors, one blob per
call; decode filters are vectorized per scanline (Sub via per-lane
cumsum, Up via row add), with a Python fallback loop only for the
left-dependent Average/Paeth filters that our own encoder never emits.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + kind + data
            + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(H,W) gray / (H,W,3) RGB / (H,W,4) RGBA uint8 (or uint16) → PNG.
    Filter strategy: row 0 None, other rows Up — both decode fully
    vectorized and Up compresses smooth rasters nearly as well as Paeth."""
    if arr.ndim == 2:
        ctype, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        ctype, ch = 2, 3
    elif arr.shape[2] == 4:
        ctype, ch = 6, 4
    elif arr.shape[2] == 2:
        ctype, ch = 4, 2
    else:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    H, W = arr.shape[:2]
    if depth == 16:
        flat = np.frombuffer(arr.astype(">u2").tobytes(),
                             dtype=np.uint8).reshape(H, W * ch * 2)
    else:
        flat = arr.reshape(H, W * ch)
    # filter: None for row 0, Up for the rest (mod-256 difference)
    filt = np.empty((H, flat.shape[1] + 1), dtype=np.uint8)
    filt[0, 0] = 0
    filt[0, 1:] = flat[0]
    if H > 1:
        filt[1:, 0] = 2
        filt[1:, 1:] = flat[1:] - flat[:-1]
    ihdr = struct.pack(">IIBBBBB", W, H, depth, ctype, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(filt.tobytes(), level))
            + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, H: int, row_bytes: int,
              bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw is (H, 1+row_bytes) filter-prefixed
    rows; returns (H, row_bytes) reconstructed bytes."""
    out = np.zeros((H, row_bytes), dtype=np.uint8)
    lanes = row_bytes // bpp
    for y in range(H):
        ft = int(raw[y, 0])
        row = raw[y, 1:]
        prev = out[y - 1] if y else np.zeros(row_bytes, dtype=np.uint8)
        if ft == 0:
            out[y] = row
        elif ft == 1:  # Sub: per-lane cumulative sum
            r = row[:lanes * bpp].reshape(lanes, bpp).astype(np.int64)
            out[y, :lanes * bpp] = (np.cumsum(r, axis=0) % 256
                                    ).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            out[y] = row + prev
        elif ft == 3:  # Average: left-dependent, sequential per lane
            o = out[y]
            for x in range(row_bytes):
                left = int(o[x - bpp]) if x >= bpp else 0
                o[x] = (int(row[x]) + (left + int(prev[x])) // 2) % 256
        elif ft == 4:  # Paeth predictor
            o = out[y]
            for x in range(row_bytes):
                a = int(o[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                o[x] = (int(row[x]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG → (H,W) or (H,W,C) uint8/uint16 array. Color types 0/2/3/4/6,
    bit depths 1/2/4/8 (palette/gray) and 16 (gray/RGB/RGBA), no
    interlace (Adam7 rejected with a clear error)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif kind == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat.append(body)
        elif kind == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    W, H, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG unsupported")
    ch = _PNG_CHANNELS.get(ctype)
    if ch is None:
        raise ValueError(f"bad PNG color type {ctype}")
    bits_px = ch * depth
    row_bytes = (W * bits_px + 7) // 8
    bpp = max(1, bits_px // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                        dtype=np.uint8)
    if raw.size != H * (row_bytes + 1):
        raise ValueError("PNG pixel payload size mismatch")
    recon = _unfilter(raw.reshape(H, row_bytes + 1), H, row_bytes, bpp)
    if depth == 16:
        px = recon.reshape(H, row_bytes).view(">u2").astype(np.uint16)
        px = px.reshape(H, W, ch)
    elif depth == 8:
        px = recon.reshape(H, W, ch)
    else:  # 1/2/4-bit gray or palette: unpack bit groups, row-padded
        per_byte = 8 // depth
        shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * depth
        mask = (1 << depth) - 1
        unpacked = ((recon[:, :, None] >> shifts[None, None, :]) & mask)
        px = unpacked.reshape(H, -1)[:, :W].astype(np.uint8)
        if ctype == 0:  # scale sub-byte gray to full 8-bit range
            px = (px * (255 // mask)).astype(np.uint8)
        px = px[:, :, None]
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
        ch = 3
    return px[:, :, 0] if ch == 1 else px


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, bottom-up, BGR, 4-byte row stride)
# ---------------------------------------------------------------------------

def bmp_encode(arr: np.ndarray) -> bytes:
    """(H,W,3) RGB or (H,W) gray uint8 → 24-bit BI_RGB BMP."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    H, W = arr.shape[:2]
    stride = (W * 3 + 3) & ~3
    rows = np.zeros((H, stride), dtype=np.uint8)
    rows[:, :W * 3] = arr[::-1, :, ::-1].reshape(H, W * 3)  # bottom-up BGR
    pix = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return header + info + pix


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit BI_RGB and 8-bit palette BMPs → (H,W,3) / (H,W) uint8."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    size, W, H, planes, bits, comp = struct.unpack_from("<IiiHHI", data, 14)
    if comp != 0:
        raise ValueError(f"compressed BMP (method {comp}) unsupported")
    flip = H > 0
    H = abs(H)
    if bits == 24:
        stride = (W * 3 + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=H * stride,
                             offset=off).reshape(H, stride)
        img = rows[:, :W * 3].reshape(H, W, 3)[:, :, ::-1]
        return img[::-1] if flip else img
    if bits == 8:
        (used,) = struct.unpack_from("<I", data, 46)
        n_pal = used or 256
        pal = np.frombuffer(data, dtype=np.uint8, count=n_pal * 4,
                            offset=14 + size).reshape(n_pal, 4)[:, :3][:, ::-1]
        stride = (W + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=H * stride,
                             offset=off).reshape(H, stride)[:, :W]
        img = pal[rows]
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
            img = img[:, :, 0]  # gray palette → single band
        return img[::-1] if flip else img
    raise ValueError(f"{bits}-bit BMP unsupported")


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary)
# ---------------------------------------------------------------------------

def pnm_encode(arr: np.ndarray) -> bytes:
    """(H,W) → P5 PGM; (H,W,3) → P6 PPM (maxval 255)."""
    H, W = arr.shape[:2]
    magic = b"P5" if arr.ndim == 2 else b"P6"
    return magic + f"\n{W} {H}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def pnm_decode(data: bytes) -> np.ndarray:
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    ch = 1 if data[:2] == b"P5" else 3
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end:end + 1].isspace():
            end += 1
        vals.append(int(data[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    W, H, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval=255 PNM supported")
    px = np.frombuffer(data, dtype=np.uint8, count=H * W * ch, offset=pos)
    return px.reshape(H, W) if ch == 1 else px.reshape(H, W, 3)


# ---------------------------------------------------------------------------
# WAV (RIFF canonical PCM)
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 (or uint8) PCM → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if samples.dtype == np.int16:
        bits = 16
        payload = samples.astype("<i2").tobytes()
    elif samples.dtype == np.uint8:
        bits = 8
        payload = samples.tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) int16/uint8 array, sample rate).
    Canonical PCM only (format tag 1); skips unknown chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        kind = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln % 2)
        if kind == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif kind == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _byps, _block, bits = fmt
    if tag != 1:
        raise ValueError(f"non-PCM WAV (format tag {tag}) unsupported")
    if bits == 16:
        a = np.frombuffer(payload, dtype="<i2").astype(np.int16)
    elif bits == 8:
        a = np.frombuffer(payload, dtype=np.uint8)
    else:
        raise ValueError(f"{bits}-bit WAV unsupported")
    return a.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def detect_format(data: bytes) -> str:
    """Magic-byte sniff: png/bmp/pnm/wav/tiff/gif/jpeg/unknown."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "pnm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"GIF8":
        return "gif"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return "unknown"


def to_gray(img: np.ndarray) -> np.ndarray:
    """RGB(A) → 8-bit luma via the BT.601 integer weights
    (77R + 150G + 29B + 128) >> 8; gray passes through."""
    if img.ndim == 2:
        return img.astype(np.uint8)
    r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
    return ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)


def decode_any(data: bytes) -> np.ndarray:
    """Sniff + decode one image blob to an array. JPEG/GIF raise the same
    honest NotImplementedError the old stub did — entropy-coded formats
    stay out of scope in this container."""
    kind = detect_format(bytes(data))
    if kind == "png":
        return png_decode(data)
    if kind == "bmp":
        return bmp_decode(data)
    if kind == "pnm":
        return pnm_decode(data)
    if kind == "tiff":
        from gdal_spark.raster.formats import parse_geotiff
        bands, _meta = parse_geotiff(bytes(data), "blob")
        return bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    if kind in ("gif", "jpeg"):
        raise NotImplementedError(
            f"{kind} decode needs an entropy codec not available here")
    raise ValueError("unrecognized image format")
