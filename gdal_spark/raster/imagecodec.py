"""Pure-Python/numpy image + audio codecs: PNG, BMP, PPM/PGM, GIF, WAV.

Round 2/3 carried ``operators/multimodal.decode_image`` as an honest
stub ("no codec libraries in this container"). These formats need no
library — PNG is zlib (stdlib) + per-row filters (numpy), BMP/PPM/WAV
are plain structs — so the decode step is now real for the formats a
web-crawl pipeline actually meets in bulk; baseline JPEG decode lives
in raster/jpegcodec.py. Only video containers stay stubbed.

Everything is re-implemented from the public specifications:

- PNG: RFC 2083 / W3C PNG spec (chunk layout, IHDR/PLTE/IDAT/IEND,
  filter types 0-4 incl. the Paeth predictor). The reference's PNG
  driver (gdal/frmts/png/pngdataset.cpp) delegates to libpng; this is
  the spec re-expressed, no shared code.
- BMP: BITMAPINFOHEADER layout (reference: gdal/frmts/bmp/bmpdataset.cpp
  semantics — bottom-up rows, BGR order, 4-byte row stride padding).
- PPM/PGM: netpbm P5/P6 binary headers.
- GIF: GIF89a spec (LZW with LSB-first variable-width codes — the
  no-early-change sibling of tiffcodec.py's TIFF LZW — interlace,
  local color tables); encoder verified read-back by javax.imageio.
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


def _png_rows_to_px(recon: np.ndarray, w: int, h: int, ch: int,
                    depth: int, ctype: int) -> np.ndarray:
    """Unfiltered scanline bytes (h, row_bytes) → (h, w, ch) samples."""
    row_bytes = (w * ch * depth + 7) // 8
    if depth == 16:
        px = recon.reshape(h, row_bytes).view(">u2").astype(np.uint16)
        return px.reshape(h, w, ch)
    if depth == 8:
        return recon.reshape(h, w, ch)
    per_byte = 8 // depth
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * depth
    mask = (1 << depth) - 1
    unpacked = ((recon[:, :, None] >> shifts[None, None, :]) & mask)
    px = unpacked.reshape(h, -1)[:, :w].astype(np.uint8)
    if ctype == 0:  # scale sub-byte gray to full 8-bit range
        px = (px * (255 // mask)).astype(np.uint8)
    return px[:, :, None]


# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec section 8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def png_decode(data: bytes, _return_index: bool = False) -> np.ndarray:
    """PNG → (H,W) or (H,W,C) uint8/uint16 array. Color types 0/2/3/4/6,
    bit depths 1/2/4/8 (palette/gray) and 16 (gray/RGB/RGBA), both
    sequential and Adam7-interlaced row organizations."""
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
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = _PNG_CHANNELS.get(ctype)
    if ch is None:
        raise ValueError(f"bad PNG color type {ctype}")
    bits_px = ch * depth
    row_bytes = (W * bits_px + 7) // 8
    bpp = max(1, bits_px // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                        dtype=np.uint8)
    if interlace == 0:
        if raw.size != H * (row_bytes + 1):
            raise ValueError("PNG pixel payload size mismatch")
        recon = _unfilter(raw.reshape(H, row_bytes + 1), H, row_bytes, bpp)
        px = _png_rows_to_px(recon, W, H, ch, depth, ctype)
    else:
        # Adam7: seven independently filtered sub-images, scattered onto
        # the (x0 + i*dx, y0 + j*dy) grid (PNG spec 8.2)
        px = np.zeros((H, W, ch),
                      dtype=np.uint16 if depth == 16 else np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (W - x0 + dx - 1) // dx
            ph = (H - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            prb = (pw * bits_px + 7) // 8
            need = ph * (prb + 1)
            if pos + need > raw.size:
                raise ValueError("PNG interlaced payload size mismatch")
            sub = raw[pos:pos + need]
            pos += need
            recon = _unfilter(sub.reshape(ph, prb + 1), ph, prb, bpp)
            px[y0::dy, x0::dx, :] = _png_rows_to_px(recon, pw, ph, ch,
                                                    depth, ctype)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if _return_index:
            return px[:, :, 0], plte
        px = plte[px[:, :, 0]]
        ch = 3
    if _return_index:
        raise ValueError("not a palette PNG")
    return px[:, :, 0] if ch == 1 else px


def png_decode_indexed(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Palette PNG (color type 3) -> (index band, (N,3) palette) — the
    GDAL view: GDALDataset exposes the index band plus a color table
    (frmts/png PNG color-table path), so checksums run over indices."""
    return png_decode(data, _return_index=True)


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
    if bits in (1, 4, 8):
        rows, pal = _bmp_indices(data, off, size, W, H, bits)
        img = pal[rows]
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
            img = img[:, :, 0]  # gray palette → single band
        return img[::-1] if flip else img
    raise ValueError(f"{bits}-bit BMP unsupported")


def _bmp_indices(data: bytes, off: int, size: int, W: int, H: int,
                 bits: int) -> tuple[np.ndarray, np.ndarray]:
    (used,) = struct.unpack_from("<I", data, 46)
    n_pal = used or (1 << bits)
    pal = np.frombuffer(data, dtype=np.uint8, count=n_pal * 4,
                        offset=14 + size).reshape(n_pal, 4)[:, :3][:, ::-1]
    stride = ((W * bits + 7) // 8 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=H * stride,
                        offset=off).reshape(H, stride)
    if bits == 8:
        rows = raw[:, :W]
    else:
        per = 8 // bits
        shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * bits
        mask = (1 << bits) - 1
        rows = ((raw[:, :, None] >> shifts[None, None, :]) & mask
                ).reshape(H, -1)[:, :W]
    return rows, pal


def bmp_decode_indexed(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Paletted BMP (1/4/8-bit) -> (index band, (N,3) palette) — GDAL's
    view of palette BMPs (frmts/bmp exposes indices + color table)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    size, W, H, planes, bits, comp = struct.unpack_from("<IiiHHI", data, 14)
    if comp != 0:
        raise ValueError(f"compressed BMP (method {comp}) unsupported")
    if bits not in (1, 4, 8):
        raise ValueError(f"{bits}-bit BMP has no palette")
    flip = H > 0
    H = abs(H)
    rows, pal = _bmp_indices(data, off, size, W, H, bits)
    return (rows[::-1] if flip else rows), pal


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
    if maxval > 65535:
        raise ValueError("PNM maxval out of range")
    if maxval > 255:   # 2-byte big-endian samples (netpbm "plain raster")
        px = np.frombuffer(data, dtype=">u2", count=H * W * ch,
                           offset=pos).astype(np.uint16)
    else:
        px = np.frombuffer(data, dtype=np.uint8, count=H * W * ch,
                           offset=pos)
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
# GIF (GIF89a; LZW per the spec appendix — LSB-first variable-width codes,
# no early change, 12-bit ceiling with deferred clear)
# ---------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code: int, max_out: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    nbits = min_code + 1
    out = bytearray()
    prev = b""
    acc = n = 0
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= nbits:
            code = acc & ((1 << nbits) - 1)
            acc >>= nbits
            n -= nbits
            if code == clear:
                table, nbits, prev = fresh(), min_code + 1, b""
                continue
            if code == eoi:
                return bytes(out)
            if not prev:
                entry = table[code]
            else:
                entry = table[code] if code < len(table) else prev + prev[:1]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
                    if len(table) == (1 << nbits) and nbits < 12:
                        nbits += 1
            out += entry
            prev = entry
            if len(out) >= max_out:
                return bytes(out)
    return bytes(out)


def _gif_lzw_encode(data: bytes, min_code: int) -> bytes:
    """Width sync: the DECODER appends its table entry while processing
    the 2nd..Nth code after a clear (never the 1st), so the width bump
    lands one code later than TIFF's early-change convention — track the
    decoder's table size by emit count, not by our dict size."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = n = 0
    nbits = min_code + 1

    def put(code: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += nbits
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    def widen_after_emit() -> None:
        nonlocal nbits
        if emit_count >= 2:
            dec_size = clear + 2 + (emit_count - 1)
            if dec_size == (1 << nbits) and nbits < 12:
                nbits += 1

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit_count = 0
    put(clear)
    run = b""
    for i in range(len(data)):
        cand = run + data[i:i + 1]
        if cand in table:
            run = cand
            continue
        put(table[run])
        emit_count += 1
        widen_after_emit()
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            put(clear)  # table full: reset both sides (nbits is 12 here)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            nbits = min_code + 1
            emit_count = 0
        run = data[i:i + 1]
    if run:
        put(table[run])
        emit_count += 1
        widen_after_emit()
    put(eoi)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode_frames(data: bytes,
                      max_frames: int | None = None) -> list[np.ndarray]:
    """All frames of a GIF87a/89a, composited onto the logical screen →
    list of (H,W,3) uint8 arrays. Honors local color tables, interlace,
    frame offsets, GCE transparency, and disposal methods 0/1 (leave),
    2 (restore background) and 3 (restore previous)."""
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF")
    W, H = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos, gct = 13, None
    if packed & 0x80:
        ncol = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, ncol * 3, pos).reshape(ncol, 3)
        pos += ncol * 3
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    disposal, transp = 0, None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:  # GCE
                flags = data[pos + 3]
                disposal = (flags >> 2) & 7
                transp = data[pos + 6] if (flags & 1) else None
            pos += 2
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<4H", data, pos + 1)
            ipk = data[pos + 9]
            pos += 10
            ct = gct
            if ipk & 0x80:
                ncol = 2 << (ipk & 7)
                ct = np.frombuffer(data, np.uint8, ncol * 3,
                                   pos).reshape(ncol, 3)
                pos += ncol * 3
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            comp = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                comp += data[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.frombuffer(_gif_lzw_decode(bytes(comp), min_code,
                                                w * h),
                                dtype=np.uint8, count=w * h).reshape(h, w)
            if ipk & 0x40:  # interlace: rows arrive in 4-pass order
                order = np.concatenate(
                    [np.arange(s, h, step) for s, step in _GIF_INTERLACE])
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            before = canvas.copy() if disposal == 3 else None
            piece = ct[idx]
            win = canvas[top:top + h, left:left + w]
            if transp is None:
                win[:] = piece
            else:
                mask = idx != transp
                win[mask] = piece[mask]
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[top:top + h, left:left + w] = 0
            elif disposal == 3 and before is not None:
                canvas = before
            disposal, transp = 0, None
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contained no image frame")
    return frames


def gif_decode(data: bytes) -> np.ndarray:
    """First frame of a GIF → (H,W,3) uint8, collapsed to (H,W) when the
    frame is pure gray."""
    rgb = gif_decode_frames(data, max_frames=1)[0]
    if (rgb[:, :, 0] == rgb[:, :, 1]).all() \
            and (rgb[:, :, 1] == rgb[:, :, 2]).all():
        return rgb[:, :, 0]
    return rgb


def gif_decode_indexed(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """First GIF frame as (index band, (N,3) color table) — GDAL's view
    (frmts/gif exposes the palette index band)."""
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF")
    packed = data[10]
    pos, gct = 13, None
    if packed & 0x80:
        ncol = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, ncol * 3, pos).reshape(ncol, 3)
        pos += ncol * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:
            left, top, w, h = struct.unpack_from("<4H", data, pos + 1)
            ipk = data[pos + 9]
            pos += 10
            ct = gct
            if ipk & 0x80:
                ncol = 2 << (ipk & 7)
                ct = np.frombuffer(data, np.uint8, ncol * 3,
                                   pos).reshape(ncol, 3)
                pos += ncol * 3
            min_code = data[pos]
            pos += 1
            comp = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                comp += data[pos + 1:pos + 1 + ln]
                pos += ln + 1
            idx = np.frombuffer(_gif_lzw_decode(bytes(comp), min_code,
                                                w * h),
                                dtype=np.uint8, count=w * h).reshape(h, w)
            if ipk & 0x40:
                order = np.concatenate(
                    [np.arange(s, h, step) for s, step in _GIF_INTERLACE])
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            if ct is None:
                raise ValueError("GIF image without a color table")
            return idx, ct
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contained no image frame")


def gif_encode_frames(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Animated GIF89a from full-size frames — gray (H,W) frames share
    the 256-gray palette; RGB frames need a ≤256-color union palette.
    Every frame is a full-screen replace (disposal 1) with a NETSCAPE2.0
    infinite-loop block, the layout mainstream writers emit."""
    H, W = frames[0].shape[:2]
    if all(f.ndim == 2 for f in frames):
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idxs = [f.astype(np.uint8) for f in frames]
    else:
        rgbs = [f if f.ndim == 3 else np.repeat(f[:, :, None], 3, axis=2)
                for f in frames]
        colors = np.unique(np.vstack([f.reshape(-1, 3) for f in rgbs]),
                           axis=0)
        if len(colors) > 256:
            raise ValueError(f"{len(colors)} colors across frames: "
                             "quantize to ≤256 first")
        key = colors.astype(np.uint32)
        keyv = (key[:, 0] << 16) | (key[:, 1] << 8) | key[:, 2]
        order = np.argsort(keyv)
        sorted_keys = keyv[order]
        idxs = []
        for f in rgbs:
            fk = f.astype(np.uint32)
            fv = (fk[:, :, 0] << 16) | (fk[:, :, 1] << 8) | fk[:, :, 2]
            idxs.append(order[np.searchsorted(sorted_keys, fv)
                              ].astype(np.uint8))
        pal = np.vstack([colors,
                         np.zeros((256 - len(colors), 3), np.uint8)])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | 7, 0, 0)
    out += pal.astype(np.uint8).tobytes()
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in idxs:
        out += (b"\x21\xf9\x04" + bytes([1 << 2])
                + struct.pack("<H", delay_cs) + b"\x00\x00")
        out += b"\x2C" + struct.pack("<4HB", 0, 0, W, H, 0) + b"\x08"
        comp = _gif_lzw_encode(idx.tobytes(), 8)
        for i in range(0, len(comp), 255):
            chunk = comp[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def gif_encode(arr: np.ndarray) -> bytes:
    """(H,W) gray (256-gray palette) or (H,W,3) with ≤256 distinct colors
    → single-frame GIF89a. More colors raise (quantize first —
    raster/color.py median_cut is the engine's palette builder)."""
    if arr.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = arr.astype(np.uint8)
    else:
        flat = arr.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(f"{len(pal)} colors: quantize to ≤256 first "
                             "(raster/color.py median_cut)")
        pal = np.vstack([pal, np.zeros((256 - len(pal), 3), np.uint8)])
        idx = inv.astype(np.uint8).reshape(arr.shape[:2])
    H, W = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | 7, 0, 0)  # GCT, 256 entries
    out += pal.astype(np.uint8).tobytes()
    out += b"\x2C" + struct.pack("<4HB", 0, 0, W, H, 0) + b"\x08"
    comp = _gif_lzw_encode(idx.tobytes(), 8)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI (RIFF 'AVI ' container, MJPEG video stream — the one video container
# expressible with the codecs above: each '00dc' chunk is a baseline JPEG)
# ---------------------------------------------------------------------------

def avi_encode_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Minimal spec-conformant single-stream MJPEG AVI (OpenDML layout:
    hdrl(avih + strl(strh+strf)) + movi + idx1)."""
    n = len(jpeg_frames)
    maxlen = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack("<10I16x", 1_000_000 // fps, maxlen * fps, 0,
                       0x10, n, 0, 1, maxlen, width, height)
    strh = (b"vidsMJPG" + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1,
                                      fps, 0, n, maxlen, 0xFFFFFFFF, 0,
                                      0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)

    def chunk(ckid: bytes, body: bytes) -> bytes:
        return (ckid + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) % 2 else b""))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for f in jpeg_frames:
        idx += b"00dc" + struct.pack("<III", 0x10,
                                     len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    body = b"AVI " + hdrl + chunk(b"LIST", bytes(movi_body)) \
        + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode_frames(data: bytes) -> list[bytes]:
    """Video frame payloads ('##dc'/'##db' chunks inside LIST movi) of an
    AVI container; MJPEG payloads decode with jpegcodec.jpeg_decode."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        p = start
        while p + 8 <= end:
            ckid = data[p:p + 4]
            (ln,) = struct.unpack_from("<I", data, p + 4)
            body_start = p + 8
            if ckid == b"LIST":
                kind = data[body_start:body_start + 4]
                if kind in (b"movi", b"rec ", b"hdrl"):
                    walk(body_start + 4, body_start + ln)
            elif len(ckid) == 4 and ckid[2:4] in (b"dc", b"db"):
                frames.append(bytes(data[body_start:body_start + ln]))
            p = body_start + ln + (ln % 2)

    walk(12, len(data))
    return frames


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
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
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
    """Sniff + decode one image blob to an array (PNG/BMP/PNM/GIF/TIFF
    here, baseline JPEG via raster/jpegcodec.py)."""
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
    if kind == "gif":
        return gif_decode(bytes(data))
    if kind == "jpeg":
        from gdal_spark.raster.jpegcodec import jpeg_decode
        return jpeg_decode(bytes(data))
    raise ValueError("unrecognized image format")
