"""NITF (National Imagery Transmission Format) reader — pure numpy,
from the public MIL-STD-2500 layout as exercised by the reference
driver (gdal/frmts/nitf/: nitffile.c file header + segment lists,
nitfimage.c image subheader / IGEOLO / block maps / masked IC,
nitfdataset.cpp corner-GCP -> geotransform and BLOCKA metadata).

Supported surface:

- versions NITF02.10 / NSIF01.00 / NITF02.00 / NITF01.10;
- image segments: IMODE B/P/R/S, uncompressed (IC=NC) and masked
  uncompressed (IC=NM, IMDATOFF block-offset table + pad-pixel
  nodata), JPEG (IC=C3/M3, each block a standalone JFIF stream fed
  to the engine's bit-exact baseline/progressive decoder);
- 1-bit data (MSB-first packed, promoted to Byte like the reference);
- band LUTs -> RGBA color table;
- ICORDS G/C (DMS), D (decimal degrees), N/S (UTM) corner coords,
  solved to an affine geotransform through the same 4-corner
  center-of-pixel least-squares fit GDALGCPsToGeoTransform applies;
- file/image metadata (NITF_FHDR etc.) and the BLOCKA TRE fields.

Scale shape: header parse is driver-side (KB); pixel blocks are
fetched in executor tasks (mapInPandas over the band list), same as
the engine's GeoTIFF/HFA paths.
"""

from __future__ import annotations

import struct

import numpy as np


def _f(data, off, n):
    """Fixed-width ASCII field."""
    return data[off:off + n].decode("latin-1")


def _fi(data, off, n):
    s = _f(data, off, n).strip()
    return int(s) if s else 0


class NITFImage:
    """One IM segment: subheader fields + block map."""

    def __init__(self, nitf, seg_index, header_start, header_size,
                 data_start, data_size):
        self.nitf = nitf
        d = nitf.data
        self.seg_start = data_start
        self.seg_size = data_size
        h0 = header_start
        version = nitf.version

        self.metadata = {}
        md_fields_21 = [(2, 10, "IID1"), (12, 14, "IDATIM"),
                        (26, 17, "TGTID"), (43, 80, "IID2"),
                        (291, 42, "ISORCE")]
        if version.startswith("NITF02.10") or version.startswith("NSIF"):
            for off, n, name in md_fields_21:
                self.metadata["NITF_" + name] = _f(d, h0 + off, n).strip()

        # FSDEVT shift: NITF 1.x always, NITF 2.0 if ISDWNG == 999998
        off = 333
        if version.startswith("NITF01.") or \
                d[h0 + 284:h0 + 290] == b"999998":
            off += 40

        if not version.startswith("NITF01."):
            self.rows = _fi(d, h0 + off, 8)
            self.cols = _fi(d, h0 + off + 8, 8)
            self.pvtype = _f(d, h0 + off + 16, 3).strip()
            self.irep = _f(d, h0 + off + 19, 8).strip()
            self.icat = _f(d, h0 + off + 27, 8).strip()
            self.abpp = _fi(d, h0 + off + 35, 2)
        else:
            self.rows = self.cols = 0
            self.pvtype, self.irep, self.icat, self.abpp = "INT", "", "", 0
        off += 38

        # ICORDS / IGEOLO.  2.0/1.x use 'N' for "none"
        self.icords = _f(d, h0 + off, 1)
        off += 1
        if not (version.startswith("NITF02.10")
                or version.startswith("NSIF")) and self.icords == "N":
            self.icords = " "
        self.corners = None                 # [(x, y)] UL UR LR LL
        self.zone = 0
        if self.icords != " ":
            self.corners = [
                self._parse_igeolo(_f(d, h0 + off + i * 15, 15))
                for i in range(4)]
            off += 60

        nicom = _fi(d, h0 + off, 1)
        off += 1 + 80 * nicom

        self.ic = _f(d, h0 + off, 2)
        off += 2
        self.comrat = ""
        if self.ic[0] != "N":
            self.comrat = _f(d, h0 + off, 4)
            off += 4

        nbands = _fi(d, h0 + off, 1)
        off += 1
        if nbands == 0:
            nbands = _fi(d, h0 + off, 5)
            off += 5
        self.n_bands = nbands

        self.luts = []                      # per band: None or (768,) u8
        for _ in range(nbands):
            off += 2 + 6 + 4                # IREPBAND ISUBCAT IFC IMFLT
            nluts = _fi(d, h0 + off, 1)
            off += 1
            if nluts == 0:
                self.luts.append(None)
                self.lut_entries = 0
                continue
            nelut = _fi(d, h0 + off, 5)
            self.lut_entries = nelut        # NELUT of the last LUT band
            off += 5
            lut = np.zeros(768, np.uint8)
            take = min(nluts, 3)
            for k in range(take):
                lut[k * 256:k * 256 + nelut] = np.frombuffer(
                    d, np.uint8, nelut, h0 + off + k * nelut)
            if nluts == 1:                  # grey -> RGB
                lut[256:512] = lut[:256]
                lut[512:768] = lut[:256]
            off += nluts * nelut
            self.luts.append(lut)

        if off + 40 > header_size:
            # truncated subheader (observed on NSIF JPEG files)
            self.imode = "B"
            self.nbpr = self.nbpc = 1
            self.block_w, self.block_h = self.cols, self.rows
            self.nbpp = self.abpp
        else:
            self.imode = _f(d, h0 + off + 1, 1)
            self.nbpr = _fi(d, h0 + off + 2, 4)
            self.nbpc = _fi(d, h0 + off + 6, 4)
            self.block_w = _fi(d, h0 + off + 10, 4)
            self.block_h = _fi(d, h0 + off + 14, 4)
            if self.ic == "NC":             # MIL-STD-2500C 5.4.2.2-d
                if self.nbpr == 1 and self.block_w == 0:
                    self.block_w = self.cols
                if self.nbpc == 1 and self.block_h == 0:
                    self.block_h = self.rows
            self.nbpp = _fi(d, h0 + off + 18, 2)
            if self.abpp == 0:
                self.abpp = self.nbpp
            off += 20
            off += 3 + 3 + 10 + 4           # IDLVL IALVL ILOC IMAG

        if version.startswith("NITF01."):
            self.cols = self.nbpr * self.block_w
            self.rows = self.nbpc * self.block_h

        # TREs (UDID + IXSHD), 3-byte overflow headers skipped
        self.tre = b""
        if not version.startswith("NITF01.") and off + 10 <= header_size:
            for _ in range(2):
                n = _fi(d, h0 + off, 5)
                off += 5
                if n > 3:
                    self.tre += d[h0 + off + 3:h0 + off + n]
                off += max(n, 0)
        self._parse_blocka()

        self._setup_offsets()
        self._setup_block_map()

    # ---------------- IGEOLO ----------------

    def _parse_igeolo(self, pair):
        ic = self.icords
        if ic in ("N", "S"):
            self.zone = int(pair[0:2])
            return (float(pair[2:8]), float(pair[8:15]))
        if ic in ("G", "C"):
            lat = int(pair[0:2]) + int(pair[2:4]) / 60.0 \
                + int(pair[4:6]) / 3600.0
            if pair[6] in "sS":
                lat = -lat
            lon = int(pair[7:10]) + int(pair[10:12]) / 60.0 \
                + int(pair[12:14]) / 3600.0
            if pair[14] in "wW":
                lon = -lon
            return (lon, lat)
        if ic == "D":
            return (float(pair[7:15]), float(pair[0:7]))
        raise NotImplementedError(f"ICORDS {ic!r} (MGRS) not supported")

    def geotransform(self):
        """Affine fit of the 4 IGEOLO corners at center-of-pixel
        positions — the exact system GDALGCPsToGeoTransform solves for
        NITF's 4-corner GCP set (nitfdataset.cpp)."""
        if self.corners is None:
            return None
        px = [0.5, self.cols - 0.5, self.cols - 0.5, 0.5]
        ln = [0.5, 0.5, self.rows - 0.5, self.rows - 0.5]
        a = np.column_stack([np.ones(4), px, ln])
        cx, _, _, _ = np.linalg.lstsq(
            a, np.array([c[0] for c in self.corners]), rcond=None)
        cy, _, _, _ = np.linalg.lstsq(
            a, np.array([c[1] for c in self.corners]), rcond=None)
        return (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])

    # ---------------- TREs ----------------

    def _parse_blocka(self):
        """BLOCKA TREs -> NITF_BLOCKA_* metadata (nitfimage.c:2437)."""
        layout = [(0, 2, "BLOCK_INSTANCE"), (2, 5, "N_GRAY"),
                  (7, 5, "L_LINES"), (12, 3, "LAYOVER_ANGLE"),
                  (15, 3, "SHADOW_ANGLE"), (34, 21, "FRLC_LOC"),
                  (55, 21, "LRLC_LOC"), (76, 21, "LRFC_LOC"),
                  (97, 21, "FRFC_LOC")]
        count = 0
        pos = 0
        tre = self.tre
        while pos + 11 <= len(tre):
            name = tre[pos:pos + 6].decode("latin-1")
            n = int(tre[pos + 6:pos + 11])
            body = tre[pos + 11:pos + 11 + n]
            pos += 11 + n
            if name.strip() != "BLOCKA" or n != 123:
                continue
            count += 1
            for off, ln, key in layout:
                self.metadata[f"NITF_BLOCKA_{key}_{count:02d}"] = \
                    body[off:off + ln].decode("latin-1")
        if count:
            self.metadata["NITF_BLOCKA_BLOCK_COUNT"] = "%02d" % count

    # ---------------- block layout ----------------

    def _setup_offsets(self):
        word = self.nbpp // 8
        bw, bh, nb = self.block_w, self.block_h, self.n_bands
        bits = self.nbpp
        if self.imode == "S":
            self.pixel_off = word
            self.line_off = bw * bits // 8
            self.block_off = self.line_off * bh
            self.band_off = self.block_off * self.nbpr * self.nbpc
        elif self.imode == "P":
            self.pixel_off = word * nb
            self.line_off = bw * bits * nb // 8
            self.band_off = word
            self.block_off = self.line_off * bh
        elif self.imode == "R":
            self.pixel_off = word
            self.band_off = bw * bits // 8
            self.line_off = self.band_off * nb
            self.block_off = self.line_off * bh
        else:                               # B and default
            self.pixel_off = word
            self.line_off = bw * bits // 8
            self.band_off = bh * self.line_off
            self.block_off = self.band_off * nb

    def _setup_block_map(self):
        n_blocks = self.nbpr * self.nbpc * self.n_bands
        self.block_start = np.zeros(n_blocks, np.int64)
        self.nodata = None
        ic = self.ic
        if ic[0] != "M" and ic[1] != "M":
            for by in range(self.nbpc):
                for bx in range(self.nbpr):
                    for ib in range(self.n_bands):
                        i = bx + by * self.nbpr + ib * self.nbpr * self.nbpc
                        self.block_start[i] = (
                            self.seg_start
                            + (bx + by * self.nbpr) * self.block_off
                            + ib * self.band_off)
            return
        # masked: IMDATOFF table at the head of the data segment
        d = self.nitf.data
        s = self.seg_start
        imdatoff, bmrlnth, _tmrlnth, tpxcdlnth = struct.unpack_from(
            ">IHHH", d, s)
        pos = s + 10
        if tpxcdlnth == 8:
            self.nodata = d[pos]
        pos += (tpxcdlnth + 7) // 8
        if bmrlnth == 4 and self.imode == "P":
            stored = self.nbpr * self.nbpc
            offs = np.frombuffer(d, ">u4", stored, pos).astype(np.int64)
            for i in range(stored):
                if offs[i] == 0xFFFFFFFF:
                    self.block_start[i::stored] = -1
                else:
                    base = offs[i] + s + imdatoff
                    for ib in range(self.n_bands):
                        self.block_start[i + ib * stored] = \
                            base + ib * self.band_off
        elif bmrlnth == 4:
            offs = np.frombuffer(d, ">u4", n_blocks, pos).astype(np.int64)
            self.block_start = np.where(
                offs == 0xFFFFFFFF, -1, offs + s + imdatoff)
        else:
            # no block mask records: tight packing after the mask table
            for by in range(self.nbpc):
                for bx in range(self.nbpr):
                    for ib in range(self.n_bands):
                        i = bx + by * self.nbpr + ib * self.nbpr * self.nbpc
                        self.block_start[i] = (
                            s + imdatoff
                            + (bx + by * self.nbpr) * self.block_off
                            + ib * self.band_off)

    # ---------------- pixel access ----------------

    def dtype(self):
        bits = self.nbpp
        pv = self.pvtype
        if bits == 1:
            return np.dtype(np.uint8)
        if pv == "SI":
            return np.dtype({8: ">i1", 16: ">i2", 32: ">i4"}[bits])
        if pv == "R":
            return np.dtype({32: ">f4", 64: ">f8"}[bits])
        if pv == "C":
            return np.dtype(">c8")
        return np.dtype({8: ">u1", 12: ">u2", 16: ">u2",
                         32: ">u4", 64: ">u8"}[bits])

    def read_band(self, band: int = 0) -> np.ndarray:
        d = self.nitf.data
        bw, bh = self.block_w, self.block_h
        dt = self.dtype()
        full = np.zeros((self.nbpc * bh, self.nbpr * bw),
                        dt.newbyteorder("="))
        if self.nodata is not None:
            full[:] = self.nodata

        if self.ic in ("NC", "NM") and self.nbpp == 1:
            # whole-image single block of MSB-first bits per band
            start = self.block_start[0] + (bw * bh + 7) // 8 * band
            nbytes = (bw * bh + 7) // 8
            bits = np.unpackbits(np.frombuffer(d, np.uint8, nbytes, start))
            full[:bh, :bw] = bits[:bw * bh].reshape(bh, bw)
            return full[:self.rows, :self.cols]

        if self.ic in ("C3", "M3"):
            return self._read_band_jpeg(band, full)
        if self.ic in ("C1", "M1"):
            return self._read_band_fax(band, full)
        if self.ic not in ("NC", "NM"):
            raise NotImplementedError(f"NITF IC={self.ic!r} (VQ/JPEG2000 "
                                      "compression) not supported")

        word = dt.itemsize
        for by in range(self.nbpc):
            for bx in range(self.nbpr):
                i = bx + by * self.nbpr + band * self.nbpr * self.nbpc
                start = int(self.block_start[i])
                if start < 0:
                    continue
                if self.pixel_off == word and \
                        self.line_off == bw * self.nbpp // 8:
                    blk = np.frombuffer(d, dt, bw * bh, start) \
                        .reshape(bh, bw)
                else:
                    raw = np.frombuffer(
                        d, np.uint8,
                        self.line_off * (bh - 1)
                        + self.pixel_off * (bw - 1) + word, start)
                    blk = np.lib.stride_tricks.as_strided(
                        raw.view(np.uint8), shape=(bh, bw, word),
                        strides=(self.line_off, self.pixel_off, 1)) \
                        .reshape(bh, bw * word).copy() \
                        .view(dt)[:, :bw]
                full[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = blk
        return full[:self.rows, :self.cols]

    def _read_band_fax(self, band, full):
        """IC=C1: CCITT G3 bi-level blocks (COMRAT 1D/2DS/2DH), the
        reference's nitfbilevel.cpp fax path."""
        from gdal_spark.raster.fax import decode_g3
        d = self.nitf.data
        bw, bh = self.block_w, self.block_h
        two_d = self.comrat.strip().startswith("2")
        n_spatial = self.nbpr * self.nbpc
        seg_end = self.seg_start + self.seg_size
        starts = sorted(int(s) for s in self.block_start if s >= 0)
        ends = dict(zip(starts, starts[1:] + [seg_end]))
        for by in range(self.nbpc):
            for bx in range(self.nbpr):
                i = bx + by * self.nbpr + band * n_spatial
                start = int(self.block_start[i])
                if start < 0:
                    continue
                blk = decode_g3(bytes(d[start:ends[start]]), bw, bh, two_d)
                full[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = blk
        return full[:self.rows, :self.cols]

    def _read_band_jpeg(self, band, full):
        """IC=C3/M3: each block is a standalone JPEG stream."""
        from gdal_spark.raster.jpegcodec import jpeg_decode
        d = self.nitf.data
        bw, bh = self.block_w, self.block_h
        n_spatial = self.nbpr * self.nbpc
        starts = self.block_start[:n_spatial]
        seg_end = self.seg_start + self.seg_size
        order = np.argsort(starts)
        ends = {}
        valid = [int(s) for s in starts[order] if s >= 0]
        for a, b in zip(valid, valid[1:] + [seg_end]):
            ends[a] = b
        for by in range(self.nbpc):
            for bx in range(self.nbpr):
                i = bx + by * self.nbpr
                start = int(starts[i])
                if start < 0:
                    continue
                arr = jpeg_decode(bytes(d[start:ends[start]]))
                if arr.ndim == 3:
                    arr = arr[:, :, band]
                h = min(bh, arr.shape[0])
                w = min(bw, arr.shape[1])
                full[by * bh:by * bh + h, bx * bw:bx * bw + w] = \
                    arr[:h, :w]
        return full[:self.rows, :self.cols]

    def color_table(self, band: int = 0):
        lut = self.luts[band]
        if lut is None:
            return None
        out = np.empty((256, 4), np.uint8)
        out[:, 0] = lut[0:256]
        out[:, 1] = lut[256:512]
        out[:, 2] = lut[512:768]
        out[:, 3] = 255
        return out


class NITFFile:
    def __init__(self, data: bytes):
        self.data = data
        self.version = _f(data, 0, 9)
        if self.version[:4] not in ("NITF", "NSIF"):
            raise ValueError("not a NITF file")
        if self.version.startswith("NITF01.") or \
                data[280:286] == b"999998":
            hl_off = 394
        else:
            hl_off = 354
        header_len = _fi(data, hl_off, 6)

        self.metadata = {"NITF_FHDR": self.version,
                         "NITF_OSTAID": _f(data, 15, 10).strip(),
                         "NITF_FTITLE": _f(data, 39, 80).strip()}

        # segment lists: (type, header-len digits, data-len digits)
        self.images = []
        next_data = header_len
        off = hl_off + 6
        for kind, hsz, dsz in (("IM", 6, 10), ("GR", 4, 6), ("LA", 4, 3),
                               ("TX", 4, 5), ("DE", 4, 9), ("RE", 4, 7)):
            count = _fi(data, off, 3)
            off += 3
            for i in range(count):
                h = _fi(data, off, hsz)
                sz = _fi(data, off + hsz, dsz)
                off += hsz + dsz
                if kind == "IM":
                    self.images.append((next_data, h, next_data + h, sz))
                next_data += h + sz
            if kind == "LA" and self.version.startswith("NITF02.1"):
                off += 3 + _fi(data, off, 3) * 0  # NUMX reserved = 000
        if not self.images:
            raise ValueError("NITF file has no image segments")

    def image(self, index: int = 0) -> NITFImage:
        hs, hsz, ds, dsz = self.images[index]
        return NITFImage(self, index, hs, hsz, ds, dsz)


def open_nitf(path: str) -> NITFFile:
    with open(path, "rb") as fh:
        return NITFFile(fh.read())


def read_nitf(spark, path: str, image: int = 0,
              raster_id: str | None = None, block: int = 256):
    """Distributed read: subheader walk on the driver, one executor
    task per band via mapInPandas (NITF_IM:<n>: subdataset analog
    through the ``image`` argument)."""
    import os

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

    nf = open_nitf(path)
    img = nf.image(image)
    gt = img.geotransform() or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    rid = raster_id or (os.path.splitext(os.path.basename(path))[0]
                        + f":{image}")
    dt = img.dtype().newbyteorder("=")
    meta = RasterMeta(rid, img.cols, img.rows, gt=gt, dtype=dt.name,
                      block=block, nodata=img.nodata)
    height, width = img.rows, img.cols

    spec = spark.createDataFrame(
        [(b,) for b in range(img.n_bands)],
        StructType([StructField("band", IntegerType())]))

    def run(batches):
        f = open_nitf(path)
        im = f.image(image)
        for pdf in batches:
            rows = []
            for b in pdf["band"]:
                arr = np.ascontiguousarray(
                    im.read_band(int(b)).astype(dt, copy=False))
                for by in range((height + block - 1) // block):
                    for bx in range((width + block - 1) // block):
                        sub = np.ascontiguousarray(
                            arr[by * block:(by + 1) * block,
                                bx * block:(bx + 1) * block])
                        rows.append((rid, int(b), bx, by, sub.shape[1],
                                     sub.shape[0], sub.tobytes()))
            yield pd.DataFrame(rows, columns=[f_.name for f_ in TILE_SCHEMA])

    return spec.mapInPandas(run, schema=TILE_SCHEMA), meta
