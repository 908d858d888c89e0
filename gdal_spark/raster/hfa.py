"""Erdas Imagine HFA (.img) reader — pure numpy, from the public HFA
structure (MIF data dictionary) as documented in the reference driver's
behavior (gdal/frmts/hfa/: hfaopen.cpp header/dictionary layout,
hfaentry.cpp node records, hfafield.cpp MIF field encoding,
hfaband.cpp block layout + ESRI GRID run-length compression,
hfadataset.cpp Map_Info -> geotransform).

File layout (all little-endian):

- ``EHFA_HEADER_TAG`` (16 bytes) + headerPtr(L) at offset 16;
- Ehfa_File at headerPtr: version(l) freeList(L) rootEntryPtr(L)
  entryHeaderLength(s) dictionaryPtr(L);
- entry nodes (Ehfa_Entry): next, prev, parent, child, data, dataSize
  (6xL) + name[64] + type[32];
- a MIF data dictionary (ASCII) at dictionaryPtr defines every node
  type as ``{count:itemtype fieldname,...}TypeName,`` repeated, ending
  with ``.``;
- raster bands are ``Eimg_Layer`` nodes whose ``RasterDMS``
  (Edms_State) child carries per-block (offset, size, logvalid,
  compressionType) records; blocks tile the band row-major at
  blockWidth x blockHeight; compressed blocks use the ESRI GRID
  scheme (min-offset + per-run bit-packed values, or a reduced
  precision stream when numRuns == -1);
- spill files (.ige, ``ExternalRasterDMS``): uncompressed fixed-size
  blocks at layerStackDataOffset with a validity bitmap, interleaved
  by layerStackCount.

Scale shape: the header/dictionary walk is driver-side metadata
(KB-scale); pixel blocks are read in executor tasks via mapInPandas,
one task per band, exactly like the engine's GeoTIFF path.
"""

from __future__ import annotations

import struct

import numpy as np

EPT_NAMES = ["u1", "u2", "u4", "u8", "s8", "u16", "s16", "u32", "s32",
             "f32", "f64", "c64", "c128"]
EPT_BITS = {"u1": 1, "u2": 2, "u4": 4, "u8": 8, "s8": 8, "u16": 16,
            "s16": 16, "u32": 32, "s32": 32, "f32": 32, "f64": 64,
            "c64": 64, "c128": 128}
EPT_DTYPE = {"u8": np.uint8, "s8": np.int8, "u16": np.uint16,
             "s16": np.int16, "u32": np.uint32, "s32": np.int32,
             "f32": np.float32, "f64": np.float64,
             "c64": np.complex64, "c128": np.complex128}
_ITEM_SIZE = {"1": 1, "2": 1, "4": 1, "c": 1, "C": 1, "e": 2, "s": 2,
              "S": 2, "t": 4, "l": 4, "L": 4, "f": 4, "d": 8, "m": 8,
              "M": 16, "b": -1, "o": 0, "x": 0}
# basedata (b) item dtypes by EPT code index
_BASEDATA_DT = {3: np.uint8, 4: np.int8, 5: np.uint16, 6: np.int16,
                7: np.uint32, 8: np.int32, 9: np.float32, 10: np.float64}


class MIFField:
    __slots__ = ("count", "pointer", "item", "enum_names", "obj_type",
                 "name", "nbytes", "obj")

    def __init__(self):
        self.count = 1
        self.pointer = ""
        self.item = ""
        self.enum_names = []
        self.obj_type = None
        self.obj = None
        self.name = ""
        self.nbytes = -1


class MIFType:
    def __init__(self, name, fields):
        self.name = name
        self.fields = fields
        self.nbytes = None          # None = not computed yet

    def complete(self, dic):
        if self.nbytes is not None:
            return self.nbytes
        self.nbytes = -2            # cycle guard
        total = 0
        for f in self.fields:
            if f.obj_type is not None:
                f.obj = dic.types.get(f.obj_type)
            if f.pointer == "p":
                f.nbytes = -1
            elif f.obj is not None:
                ob = f.obj.complete(dic)
                f.nbytes = -1 if ob < 0 else ob * f.count
                if f.pointer == "*" and f.nbytes != -1:
                    f.nbytes += 8
            else:
                f.nbytes = _ITEM_SIZE.get(f.item, -1) * f.count
            if f.nbytes < 0:
                total = -1
            if total >= 0:
                total += f.nbytes
        self.nbytes = total
        return total


def _parse_field(s, i):
    """Parse one MIF field definition starting at s[i]; returns
    (MIFField, next_index) mirroring HFAField::Initialize."""
    f = MIFField()
    j = s.index(":", i)
    f.count = int(s[i:j] or 0)
    i = j + 1
    if s[i] in "p*":
        f.pointer = s[i]
        i += 1
    f.item = s[i]
    i += 1
    if f.item == "o":
        j = s.index(",", i)
        f.obj_type = s[i:j]
        i = j + 1
    elif f.item == "x" and s[i] == "{":
        depth, i0 = 1, i + 1
        i = i0
        while depth:
            if s[i] == "{":
                depth += 1
            elif s[i] == "}":
                depth -= 1
            i += 1
        f.item = "o"
        j = s.index(",", i)
        f.obj_type = s[i:j]
        i = j + 1
    elif f.item == "e":
        j = s.index(":", i)
        n_enum = int(s[i:j])
        i = j + 1
        for _ in range(n_enum):
            j = s.index(",", i)
            f.enum_names.append(s[i:j])
            i = j + 1
    j = s.index(",", i)
    f.name = s[i:j]
    return f, j + 1


class MIFDictionary:
    def __init__(self, text: str):
        self.types = {}
        i = 0
        while i < len(text) and text[i] == "{":
            fields = []
            i += 1
            while text[i] != "}":
                f, i = _parse_field(text, i)
                fields.append(f)
            i += 1                              # past '}'
            j = text.index(",", i)
            name = text[i:j]
            i = j + 1
            self.types[name] = MIFType(name, fields)
        for t in self.types.values():
            t.complete(self)


def _field_inst_bytes(f: MIFField, data: bytes, off: int) -> int:
    """Bytes occupied by one instance of field f at data[off:]
    (HFAField::GetInstBytes)."""
    if f.nbytes > -1:
        return f.nbytes
    n = 0
    count = f.count
    if f.pointer:
        count = struct.unpack_from("<i", data, off)[0]
        n += 8
    if f.item == "b" and count != 0:
        rows, cols = struct.unpack_from("<ii", data, off + n)
        base = struct.unpack_from("<h", data, off + n + 8)[0]
        n += 12
        bits = EPT_BITS[EPT_NAMES[base]] if 0 <= base < 13 else 8
        n += ((bits + 7) // 8) * rows * cols
    elif f.obj is None:
        n += count * _ITEM_SIZE.get(f.item, 0)
    else:
        for _ in range(count):
            n += _type_inst_bytes(f.obj, data, off + n)
    return n


def _type_inst_bytes(t: MIFType, data: bytes, off: int) -> int:
    if t.nbytes is not None and t.nbytes >= 0:
        return t.nbytes
    n = 0
    for f in t.fields:
        n += _field_inst_bytes(f, data, off + n)
    return n


def _split_path(path: str):
    """'blockinfo[3].offset' -> [('blockinfo', 3), ('offset', 0)]."""
    parts = []
    for seg in path.split("."):
        if "[" in seg:
            name, idx = seg[:-1].split("[")
            parts.append((name, int(idx)))
        else:
            parts.append((seg, 0))
    return parts


def _extract(t: MIFType, data: bytes, off: int, parts, want: str):
    """Extract a value from an instance of type t at data[off:]
    (HFAType/HFAField::ExtractInstValue).  want: 'i' | 'd' | 's'."""
    name, idx = parts[0]
    for f in t.fields:
        if f.name != name:
            off += _field_inst_bytes(f, data, off)
            continue
        if f.pointer:
            off += 8
        it = f.item
        if it in "cC" and want == "p":
            return off
        if it in "cC" and want == "s":
            end = data.index(b"\0", off)
            return data[off:end].decode("latin-1")
        if it in "cC":
            return data[off + idx]
        if it in "es":
            v = struct.unpack_from("<H", data, off + idx * 2)[0]
            if it == "e" and want == "s" and v < len(f.enum_names):
                return f.enum_names[v]
            return v
        if it == "S":
            return struct.unpack_from("<h", data, off + idx * 2)[0]
        if it in "tl":
            return struct.unpack_from("<I", data, off + idx * 4)[0]
        if it == "L":
            return struct.unpack_from("<i", data, off + idx * 4)[0] \
                & 0xFFFFFFFF
        if it == "f":
            return struct.unpack_from("<f", data, off + idx * 4)[0]
        if it == "d":
            return struct.unpack_from("<d", data, off + idx * 8)[0]
        if it == "b":
            rows, cols = struct.unpack_from("<ii", data, off)
            base = struct.unpack_from("<h", data, off + 8)[0]
            dt = _BASEDATA_DT.get(base)
            if dt is None:
                raise ValueError(f"basedata type {base}")
            if idx == -1:
                return rows
            if idx == -2:
                return cols
            return np.frombuffer(data, dt, rows * cols, off + 12)[idx]
        if it == "o":
            sub = f.obj
            extra = 0
            if sub.nbytes is not None and sub.nbytes >= 0:
                extra = sub.nbytes * idx
            else:
                for _ in range(idx):
                    extra += _type_inst_bytes(sub, data, off + extra)
            if len(parts) > 1:
                return _extract(sub, data, off + extra, parts[1:], want)
            return off + extra              # raw offset of sub-object
        raise ValueError(f"item type {it!r}")
    raise KeyError(name)


class HFAEntry:
    def __init__(self, hfa, pos):
        self.hfa = hfa
        d = hfa.data
        (self.next_pos, _prev, _parent, self.child_pos,
         self.data_pos, self.data_size) = struct.unpack_from("<6i", d, pos)
        self.name = d[pos + 24:pos + 88].split(b"\0")[0].decode("latin-1")
        self.type = d[pos + 88:pos + 120].split(b"\0")[0].decode("latin-1")

    @property
    def children(self):
        out, pos = [], self.child_pos
        while pos:
            e = HFAEntry(self.hfa, pos)
            out.append(e)
            pos = e.next_pos
        return out

    def child(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None

    def find(self, type_name):
        """Depth-first search of the subtree for entries of a type."""
        out = []
        for c in self.children:
            if c.type == type_name:
                out.append(c)
            out.extend(c.find(type_name))
        return out

    def _value(self, path, want):
        t = self.hfa.dict.types[self.type]
        return _extract(t, self.hfa.data, self.data_pos,
                        _split_path(path), want)

    def get_int(self, path):
        return int(self._value(path, "i"))

    def get_float(self, path):
        return float(self._value(path, "d"))

    def get_str(self, path):
        v = self._value(path, "s")
        return v if isinstance(v, str) else str(v)

    def get_raw(self, path):
        """Absolute offset of a char-array field's data in the file."""
        return int(self._value(path, "p"))


class HFAFile:
    def __init__(self, data: bytes, spill: bytes | None = None):
        if data[:15] != b"EHFA_HEADER_TAG":
            raise ValueError("not an HFA file")
        self.data = data
        self.spill = spill
        hdr = struct.unpack_from("<I", data, 16)[0]
        (_version, _freelist, root_ptr, _ehl,
         dict_ptr) = struct.unpack_from("<iIIhI", data, hdr)
        # dictionary: NUL- or EOF-terminated ASCII at dict_ptr
        end = data.find(b"\0", dict_ptr)
        if end < 0:
            end = len(data)
        self.dict = MIFDictionary(data[dict_ptr:end].decode("latin-1"))
        self.root = HFAEntry(self, root_ptr)

    # ---------------- band access ----------------

    def layers(self):
        return self.root.find("Eimg_Layer")

    def band_count(self):
        return len(self.layers())

    def read_band(self, band: int = 0) -> np.ndarray:
        layer = self.layers()[band]
        width = layer.get_int("width")
        height = layer.get_int("height")
        bw = layer.get_int("blockWidth")
        bh = layer.get_int("blockHeight")
        ept = EPT_NAMES[layer.get_int("pixelType")]
        bpr = (width + bw - 1) // bw
        bpc = (height + bh - 1) // bh
        nodata = self._nodata(layer)
        fill = nodata if nodata is not None else 0

        if ept in ("u1", "u2", "u4"):
            full = np.zeros((bpc * bh, bpr * bw), np.uint8)
        else:
            full = np.zeros((bpc * bh, bpr * bw), EPT_DTYPE[ept])
        full[:] = fill

        dms = layer.child("RasterDMS")
        if dms is not None:
            blocks = self._internal_blocks(dms, bpr * bpc)
            src = self.data
            for i, (boff, bsize, valid, comp) in enumerate(blocks):
                by, bx = divmod(i, bpr)
                if not valid:
                    continue
                raw = src[boff:boff + bsize]
                blk = (_uncompress_block(raw, bw * bh, ept) if comp
                       else _unpack_raw(raw, bw * bh, ept))
                full[by * bh:(by + 1) * bh,
                     bx * bw:(bx + 1) * bw] = blk.reshape(bh, bw)
        else:
            edms = layer.child("ExternalRasterDMS")
            if edms is None:
                raise ValueError("layer has no RasterDMS")
            if self.spill is None:
                raise ValueError("spill (.ige) bytes required for "
                                 "ExternalRasterDMS layers")
            self._read_external(edms, full, bw, bh, bpr, bpc, ept)
        return full[:height, :width]

    def _read_external(self, edms, full, bw, bh, bpr, bpc, ept):
        count = edms.get_int("layerStackCount")
        index = edms.get_int("layerStackIndex")
        valid_off = (edms.get_int("layerStackValidFlagsOffset[0]")
                     | edms.get_int("layerStackValidFlagsOffset[1]") << 32)
        data_off = (edms.get_int("layerStackDataOffset[0]")
                    | edms.get_int("layerStackDataOffset[1]") << 32)
        sp = self.spill
        if sp[:25] != b"ERDAS_IMG_EXTERNAL_RASTER":
            raise ValueError(".ige header mismatch")
        bsize = (bw * bh * EPT_BITS[ept] + 7) // 8
        bytes_per_row = (bpr + 7) // 8
        bitmap = sp[valid_off:valid_off + bytes_per_row * bpc + 20]
        for i in range(bpr * bpc):
            row, col = divmod(i, bpr)
            bit = row * bytes_per_row * 8 + col + 20 * 8
            if not (bitmap[bit >> 3] >> (bit & 7)) & 1:
                continue
            boff = data_off + bsize * i * count + index * bsize
            blk = _unpack_raw(sp[boff:boff + bsize], bw * bh, ept)
            by, bx = divmod(i, bpr)
            full[by * bh:(by + 1) * bh,
                 bx * bw:(bx + 1) * bw] = blk.reshape(bh, bw)

    def _internal_blocks(self, dms, n_blocks):
        """(offset, size, logvalid, compressed) per block from the
        Edms_State blockinfo array (fixed 14-byte records)."""
        out = []
        for i in range(n_blocks):
            base = f"blockinfo[{i}]"
            out.append((dms.get_int(base + ".offset"),
                        dms.get_int(base + ".size"),
                        dms.get_int(base + ".logvalid"),
                        dms.get_int(base + ".compressionType")))
        return out

    def _nodata(self, layer):
        e = layer.child("Eimg_NonInitializedValue")
        if e is None:
            return None
        try:
            return e.get_float("valueBD[0]")
        except Exception:
            return None

    # ---------------- georeferencing / metadata ----------------

    def map_info(self, band: int = 0):
        layer = self.layers()[band]
        mi = layer.child("Map_Info") or (self.root.find("Eprj_MapInfo") or
                                         [None])[0]
        if mi is None:
            return None
        return {
            "proName": mi.get_str("proName"),
            "ulx": mi.get_float("upperLeftCenter.x"),
            "uly": mi.get_float("upperLeftCenter.y"),
            "lrx": mi.get_float("lowerRightCenter.x"),
            "lry": mi.get_float("lowerRightCenter.y"),
            "pw": mi.get_float("pixelSize.width"),
            "ph": mi.get_float("pixelSize.height"),
            "units": mi.get_str("units"),
        }

    def geotransform(self, band: int = 0):
        """gdal/frmts/hfa/hfadataset.cpp: upperLeftCenter is the center
        of the UL pixel; sign of the steps follows the UL->LR
        direction."""
        mi = self.map_info(band)
        if mi is None:
            return None
        gx = mi["pw"] if mi["lrx"] >= mi["ulx"] else -mi["pw"]
        gy = mi["ph"] if mi["lry"] >= mi["uly"] else -mi["ph"]
        return (mi["ulx"] - gx * 0.5, gx, 0.0,
                mi["uly"] - gy * 0.5, 0.0, gy)

    def statistics(self, band: int = 0) -> dict:
        """STATISTICS_* metadata (Esta_Statistics + the histogram
        column of the descriptor table), as the reference surfaces in
        band metadata (autotest gdrivers/hfa.py hfa_histread)."""
        layer = self.layers()[band]
        md = {}
        st = layer.child("Statistics")
        if st is not None and st.type == "Esta_Statistics":
            for key, fld in (("MINIMUM", "minimum"), ("MAXIMUM", "maximum"),
                             ("MEAN", "mean"), ("MEDIAN", "median"),
                             ("MODE", "mode"), ("STDDEV", "stddev")):
                try:
                    v = st.get_float(fld)
                except Exception:
                    continue
                md["STATISTICS_" + key] = _fmt(v)
        pa = layer.child("StatisticsParameters")
        if pa is not None:
            for key, fld in (("SKIPFACTORX", "SkipFactorX"),
                             ("SKIPFACTORY", "SkipFactorY")):
                try:
                    md["STATISTICS_" + key] = _fmt(pa.get_float(fld))
                except Exception:
                    pass
            try:
                n = pa.get_int("ExcludedValues[-1]") * \
                    pa.get_int("ExcludedValues[-2]")
                vals = [_fmt(pa.get_float(f"ExcludedValues[{i}]"))
                        for i in range(n)]
                md["STATISTICS_EXCLUDEDVALUES"] = ",".join(vals)
            except Exception:
                pass
        hp = layer.child("HistogramParameters")
        col = self._histogram_column(layer)
        if col is not None:
            md["STATISTICS_HISTOBINVALUES"] = \
                "|".join(_fmt(v) for v in col) + "|"
            if hp is not None:
                try:
                    md["STATISTICS_HISTOMIN"] = \
                        _fmt(hp.get_float("BinFunction.minLimit"))
                    md["STATISTICS_HISTOMAX"] = \
                        _fmt(hp.get_float("BinFunction.maxLimit"))
                    md["STATISTICS_HISTONUMBINS"] = \
                        str(hp.get_int("BinFunction.numBins"))
                except Exception:
                    pass
        return md

    def _descriptor_columns(self, layer):
        dt = layer.child("Descriptor_Table")
        if dt is None:
            return {}
        cols = {}
        for c in dt.children:
            if c.type == "Edsc_Column":
                cols[c.name] = c
        return cols

    def _read_column(self, col):
        rows = col.get_int("numRows")
        ptr = col.get_int("columnDataPtr")
        kind = col.get_int("dataType")
        if kind == 0:
            return np.frombuffer(self.data, "<i4", rows, ptr)
        if kind == 1:
            return np.frombuffer(self.data, "<f8", rows, ptr)
        raise ValueError(f"column dataType {kind}")

    def _histogram_column(self, layer):
        cols = self._descriptor_columns(layer)
        if "Histogram" not in cols:
            return None
        return self._read_column(cols["Histogram"])

    def _bfunique_bins(self, layer, n_colors):
        """Pixel values the PCT rows map to, from a BFUnique
        #Bin_Function840# node (hfaband.cpp HFAReadBFUniqueBins)."""
        dt = layer.child("Descriptor_Table")
        bf = dt.child("#Bin_Function840#") if dt else None
        if bf is None:
            return None
        try:
            if bf.get_str("binFunction.type.string") != "BFUnique":
                return None
            raw = bf.get_raw("binFunction.MIFObject")
        except Exception:
            return None
        if self.data[raw + 20] != 0x0A or self.data[raw + 21] != 0:
            return None                     # not an EGDA_TYPE_F64 basedata
        return np.frombuffer(self.data, "<f8", n_colors, raw + 24)

    def color_table(self, band: int = 0):
        """(N, 4) uint8 RGBA from the descriptor table's
        Red/Green/Blue/Opacity real columns, scaled min(255, v*256)
        (hfadataset.cpp, bug #1732), rows placed at BFUnique bin values
        when present; or None."""
        layer = self.layers()[band]
        cols = self._descriptor_columns(layer)
        if not {"Red", "Green", "Blue"} <= set(cols):
            return None
        r = self._read_column(cols["Red"])
        g = self._read_column(cols["Green"])
        b = self._read_column(cols["Blue"])
        n = len(r)
        a = (self._read_column(cols["Opacity"]) if "Opacity" in cols
             else np.ones(n))
        rows = np.empty((n, 4), np.uint8)
        for i, ch in enumerate((r, g, b, a)):
            rows[:, i] = np.minimum(
                255, (np.asarray(ch, np.float64) * 256).astype(np.int64))
        bins = self._bfunique_bins(layer, n)
        if bins is None:
            return rows
        size = int(bins.max()) + 1
        out = np.zeros((size, 4), np.uint8)
        out[bins.astype(np.int64)] = rows
        return out

    def layer_type(self, band: int = 0) -> str:
        """'thematic' | 'athematic' | 'fft of real-valued data'."""
        return self.layers()[band].get_str("layerType")

    def projection_name(self, band: int = 0):
        layer = self.layers()[band]
        pro = layer.child("Projection")
        if pro is None:
            return None
        try:
            return pro.get_str("proName")
        except Exception:
            return None


def _fmt(v: float) -> str:
    """%.14g with integer collapse, matching CPLsprintf output."""
    s = "%.14g" % v
    return s


def _unpack_raw(raw: bytes, n_pixels: int, ept: str) -> np.ndarray:
    """Decode one uncompressed block (LSB-first sub-byte packing)."""
    bits = EPT_BITS[ept]
    if bits >= 8:
        return np.frombuffer(raw, EPT_DTYPE[ept], n_pixels)
    b = np.frombuffer(raw, np.uint8, (n_pixels * bits + 7) // 8)
    if bits == 1:
        out = np.unpackbits(b, bitorder="little")[:n_pixels]
    elif bits == 2:
        out = np.empty(len(b) * 4, np.uint8)
        for k in range(4):
            out[k::4] = (b >> (2 * k)) & 0x3
        out = out[:n_pixels]
    else:                                            # u4
        out = np.empty(len(b) * 2, np.uint8)
        out[0::2] = b & 0xF
        out[1::2] = b >> 4
        out = out[:n_pixels]
    return out


def _bit_values(vals: bytes, n: int, nbits: int) -> np.ndarray:
    """n values of nbits each: sub-byte LSB-first, multi-byte
    big-endian (the ESRI GRID scheme's asymmetry)."""
    if nbits == 0:
        return np.zeros(n, np.int64)
    b = np.frombuffer(vals, np.uint8, (n * nbits + 7) // 8) \
        if nbits < 8 else np.frombuffer(vals, np.uint8, n * (nbits // 8))
    if nbits == 1:
        return np.unpackbits(b, bitorder="little")[:n].astype(np.int64)
    if nbits == 2:
        out = np.empty(len(b) * 4, np.uint8)
        for k in range(4):
            out[k::4] = (b >> (2 * k)) & 0x3
        return out[:n].astype(np.int64)
    if nbits == 4:
        out = np.empty(len(b) * 2, np.uint8)
        out[0::2] = b & 0xF
        out[1::2] = b >> 4
        return out[:n].astype(np.int64)
    if nbits == 8:
        return b.astype(np.int64)
    if nbits == 16:
        return (b[0::2].astype(np.int64) << 8) | b[1::2]
    if nbits == 32:
        return ((b[0::4].astype(np.int64) << 24)
                | (b[1::4].astype(np.int64) << 16)
                | (b[2::4].astype(np.int64) << 8) | b[3::4])
    raise ValueError(f"nNumBits {nbits}")


def _uncompress_block(raw: bytes, n_pixels: int, ept: str) -> np.ndarray:
    """ESRI GRID compression (hfaband.cpp UncompressBlock)."""
    data_min = struct.unpack_from("<I", raw, 0)[0]
    n_runs, data_off = struct.unpack_from("<ii", raw, 4)
    nbits = raw[12]

    if n_runs == -1:
        # reduced precision: one packed value per pixel
        vals = _bit_values(raw[13:], n_pixels, nbits) + data_min
    else:
        # run-length: counts (variable-width big-endian, 2 tag bits)
        # then packed run values at data_off
        counts = np.empty(n_runs, np.int64)
        pos = 13
        for i in range(n_runs):
            tag = raw[pos] >> 6
            c = raw[pos] & 0x3F
            for k in range(1, tag + 1):
                c = c * 256 + raw[pos + k]
            counts[i] = c
            pos += tag + 1
        run_vals = _bit_values(raw[data_off:], n_runs, nbits) + data_min
        vals = np.repeat(run_vals, counts)[:n_pixels]

    # C truncation semantics: the int run value is cast to the block's
    # storage width (floats take the raw bit pattern, bug #1000)
    vals = vals[:n_pixels] & 0xFFFFFFFF
    if ept == "f32":
        return vals.astype(np.uint32).view(np.float32).copy()
    if ept in ("u1", "u2", "u4", "u8"):
        return (vals & 0xFF).astype(np.uint8)
    if ept == "s8":
        return (vals & 0xFF).astype(np.uint8).view(np.int8)
    if ept == "u16":
        return (vals & 0xFFFF).astype(np.uint16)
    if ept == "s16":
        return (vals & 0xFFFF).astype(np.uint16).view(np.int16)
    if ept == "u32":
        return vals.astype(np.uint32)
    if ept == "s32":
        return vals.astype(np.uint32).view(np.int32)
    raise ValueError(f"compressed {ept} block")


def open_hfa(path: str) -> HFAFile:
    import os
    with open(path, "rb") as fh:
        data = fh.read()
    spill = None
    ige = os.path.splitext(path)[0] + ".ige"
    if os.path.exists(ige):
        with open(ige, "rb") as fh:
            spill = fh.read()
    return HFAFile(data, spill)


def read_hfa(spark, path: str, raster_id: str | None = None,
             block: int = 256):
    """Distributed read: metadata walk on the driver, one executor task
    per band (mapInPandas), tiles re-blocked to the engine's TILE_SCHEMA."""
    import os

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

    hfa = open_hfa(path)
    n_bands = hfa.band_count()
    layer = hfa.layers()[0]
    width, height = layer.get_int("width"), layer.get_int("height")
    ept = EPT_NAMES[layer.get_int("pixelType")]
    dt = np.uint8 if ept in ("u1", "u2", "u4") else EPT_DTYPE[ept]
    gt = hfa.geotransform() or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    rid = raster_id or os.path.splitext(os.path.basename(path))[0]
    meta = RasterMeta(rid, width, height, gt=gt,
                      dtype=np.dtype(dt).name, block=block)

    spec = spark.createDataFrame(
        [(b,) for b in range(n_bands)],
        StructType([StructField("band", IntegerType())]))

    def run(batches):
        h = open_hfa(path)
        for pdf in batches:
            rows = []
            for b in pdf["band"]:
                arr = h.read_band(int(b))
                for by in range((height + block - 1) // block):
                    for bx in range((width + block - 1) // block):
                        sub = np.ascontiguousarray(
                            arr[by * block:(by + 1) * block,
                                bx * block:(bx + 1) * block])
                        rows.append((rid, int(b), bx, by, sub.shape[1],
                                     sub.shape[0], sub.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA])

    return spec.mapInPandas(run, schema=TILE_SCHEMA), meta
