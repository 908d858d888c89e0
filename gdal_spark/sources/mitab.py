"""MapInfo TAB binary reader (.tab + .dat + .map + .id, and seamless
tables).

Reference semantics: gdal/ogr/ogrsf_frmts/mitab/ — the .tab Definition
Table names the native .dat fields (mitab_datfile.cpp: dBASE-style
descriptors but Integer/Smallint/Float stored as little-endian
binary); the .map is 512-byte blocks: header block (field sequence
mitab_mapheaderblock.cpp:InitBlockFromData, Int2Coordsys quadrant
rules :441-474), object blocks (type 2; records addressed by the .id
int32 per-FID offsets, compressed coords relative to the block center,
mitab_mapobjectblock.cpp), and linked coordinate blocks (type 3;
section headers + vertices, mitab_mapcoordblock.cpp:ReadCoordSecHdrs).
Seamless tables (\\IsSeamless metadata) union their part tables with
FIDs offset by (partId+1)<<32 (mitab_imapinfofile.cpp seamless
handling, verified by ogr_mitab_37's expected FIDs).

Spark shape: header/.id/.dat parse on the driver (index scale); this
reader materializes features driver-side like the reference's
sequential TABFile (TAB files are single-machine sidecar artifacts);
the returned DataFrame distributes downstream work."""
from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions.geometry import wkb_from_wkt


def _fmt(v: float) -> str:
    return f"{v:.15g}"


class _MapFile:
    def __init__(self, path: str):
        self.data = open(path, "rb").read()
        d = self.data
        if struct.unpack_from("<i", d, 0x100)[0] != 42424242:
            raise ValueError("not a MapInfo .map file")
        self.version, self.blocksize = struct.unpack_from("<2h", d, 0x104)
        (self.xmin, self.ymin, self.xmax, self.ymax) = \
            struct.unpack_from("<4i", d, 0x110)
        self.coord_precision = d[0x160]
        self.quadrant = d[0x161]
        (self.xscale, self.yscale, self.xdispl, self.ydispl) = \
            struct.unpack_from("<4d", d, 0x170)
        if self.version <= 100:
            self.xscale = self.yscale = 10.0 ** self.coord_precision
            self.xdispl = self.ydispl = 0.0
        self.proj_id = d[0x16D]
        self.ellipsoid_id = d[0x16E]
        self.units_id = d[0x16F]
        self.proj_params = struct.unpack_from("<6d", d, 0x190)

    def int2xy(self, nx: int, ny: int) -> tuple[float, float]:
        """Int2Coordsys (mitab_mapheaderblock.cpp:441): quadrant
        2/3/0 negate X, 3/4/0 negate Y."""
        if self.quadrant in (2, 3, 0):
            x = -1.0 * (nx + self.xdispl) / self.xscale
        else:
            x = (nx - self.xdispl) / self.xscale
        if self.quadrant in (3, 4, 0):
            y = -1.0 * (ny + self.ydispl) / self.yscale
        else:
            y = (ny - self.ydispl) / self.yscale
        p = 10.0 ** self.coord_precision
        return round(x * p) / p, round(y * p) / p

    def _block_center(self, offset: int) -> tuple[int, int]:
        base = (offset // self.blocksize) * self.blocksize
        return struct.unpack_from("<2i", self.data, base + 4)

    def _coord_stream(self, ptr: int) -> "_CoordStream":
        return _CoordStream(self.data, ptr, self.blocksize)

    def read_object(self, offset: int):
        """One object record at an .id offset -> (geom_type, WKT or
        None). Compressed variants resolve against the object block
        center (records) or the object's compression origin (coord
        blocks)."""
        d = self.data
        t = d[offset]
        pos = offset + 5  # type byte + int32 id
        compressed = t in (0x01, 0x04, 0x07, 0x0A, 0x0D, 0x10, 0x13,
                           0x16, 0x19, 0x25, 0x28, 0x2B, 0x2E, 0x31,
                           0x34, 0x37)

        def icoord(p):
            if compressed:
                cx, cy = self._block_center(offset)
                dx, dy = struct.unpack_from("<2h", d, p)
                return (cx + dx, cy + dy), p + 4
            v = struct.unpack_from("<2i", d, p)
            return v, p + 8

        if t == 0:
            return "NONE", None
        if t in (0x01, 0x02):  # SYMBOL -> POINT
            (nx, ny), pos = icoord(pos)
            x, y = self.int2xy(nx, ny)
            return "POINT", f"POINT ({_fmt(x)} {_fmt(y)})"
        if t in (0x04, 0x05):  # LINE (2 points)
            (x1, y1), pos = icoord(pos)
            (x2, y2), pos = icoord(pos)
            a, b = self.int2xy(x1, y1)
            c, e = self.int2xy(x2, y2)
            return "LINE", (f"LINESTRING ({_fmt(a)} {_fmt(b)},"
                            f"{_fmt(c)} {_fmt(e)})")
        if t in (0x13, 0x14):  # RECT -> POLYGON
            (x1, y1), pos = icoord(pos)
            (x2, y2), pos = icoord(pos)
            a, b = self.int2xy(x1, y1)
            c, e = self.int2xy(x2, y2)
            return "RECT", ("POLYGON ((" + ",".join(
                f"{_fmt(px)} {_fmt(py)}" for px, py in
                ((a, b), (c, b), (c, e), (a, e), (a, b))) + "))")
        if t in (0x07, 0x08, 0x25, 0x26, 0x2E, 0x2F, 0x31, 0x32,
                 0x0D, 0x0E):
            return self._read_pline(t, offset, pos, compressed)
        if t in (0x34, 0x35):  # MULTIPOINT
            ptr, npts = struct.unpack_from("<2i", d, pos)
            stream = self._coord_stream(ptr)
            # multipoint compressed coords are relative to the coord
            # block's compr origin == the object block center
            cx, cy = self._block_center(offset)
            pts = []
            for _ in range(npts):
                if compressed:
                    dx, dy = stream.i16(2)
                    nx, ny = cx + dx, cy + dy
                else:
                    nx, ny = stream.i32(2)
                pts.append(self.int2xy(nx, ny))
            return "MULTIPOINT", "MULTIPOINT (" + ",".join(
                f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"
        raise NotImplementedError(f"TAB object type {t:#x}")

    def _read_pline(self, t, offset, pos, compressed):
        d = self.data
        ptr, size = struct.unpack_from("<2i", d, pos)
        size &= 0x7FFFFFFF
        pos += 8
        is_region = t in (0x0D, 0x0E, 0x2E, 0x2F)
        version = (450 if t in (0x2E, 0x2F, 0x31, 0x32) else 300)
        if t in (0x07, 0x08):
            nsections = 1
        else:
            (nsections,) = struct.unpack_from("<h", d, pos)
            pos += 2
        if compressed:
            pos += 4  # label dx/dy
            corg = struct.unpack_from("<2i", d, pos)
            pos += 8
        else:
            pos += 8  # label
            corg = None
        stream = self._coord_stream(ptr)
        if t in (0x07, 0x08):
            npts = size // (4 if compressed else 8)
            counts = [npts]
        else:
            counts = []
            hdr_i16 = 24 if version < 450 else 28
            for _ in range(nsections):
                if version >= 450:
                    (nv,) = stream.i32(1)
                else:
                    (nv,) = stream.i16(1)
                stream.i16(1) if version < 800 else stream.i32(1)
                # section MBR min/max
                if compressed:
                    stream.i16(4)
                else:
                    stream.i32(4)
                stream.i32(1)  # data offset
                counts.append(nv)
            _ = hdr_i16
        rings = []
        for nv in counts:
            pts = []
            for _ in range(nv):
                if compressed:
                    dx, dy = stream.i16(2)
                    nx, ny = corg[0] + dx, corg[1] + dy
                else:
                    nx, ny = stream.i32(2)
                pts.append(self.int2xy(nx, ny))
            rings.append(pts)
        if not is_region:
            if len(rings) == 1:
                return "PLINE", "LINESTRING (" + ",".join(
                    f"{_fmt(x)} {_fmt(y)}" for x, y in rings[0]) + ")"
            return "MULTIPLINE", "MULTILINESTRING (" + ",".join(
                "(" + ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) +
                ")" for r in rings) + ")"
        ring_txt = []
        for r in rings:
            if r and r[0] != r[-1]:
                r = r + [r[0]]
            ring_txt.append("(" + ",".join(
                f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")")
        return "REGION", "POLYGON (" + ",".join(ring_txt) + ")"


class _CoordStream:
    """Logical byte stream across linked coordinate blocks
    (type 3; 8-byte header: type, _, numDataBytes i2, next i4)."""

    def __init__(self, data: bytes, ptr: int, blocksize: int):
        self.data = data
        self.blocksize = blocksize
        base = (ptr // blocksize) * blocksize
        self.block = base
        (self.avail,) = struct.unpack_from("<h", data, base + 2)
        (self.next,) = struct.unpack_from("<i", data, base + 4)
        self.pos = ptr - base - 8  # position within data part

    def _get(self, n: int) -> bytes:
        out = b""
        while n > 0:
            if self.pos >= self.avail:
                base = (self.next // self.blocksize) * self.blocksize
                self.block = base
                (self.avail,) = struct.unpack_from(
                    "<h", self.data, base + 2)
                (self.next,) = struct.unpack_from(
                    "<i", self.data, base + 4)
                self.pos = 0
            take = min(n, self.avail - self.pos)
            s = self.block + 8 + self.pos
            out += self.data[s:s + take]
            self.pos += take
            n -= take
        return out

    def i16(self, k: int):
        return struct.unpack(f"<{k}h", self._get(2 * k))

    def i32(self, k: int):
        return struct.unpack(f"<{k}i", self._get(4 * k))


def parse_tab(path: str) -> dict:
    fields = []
    seamless = False
    in_fields = False
    for ln in open(path, encoding="latin-1"):
        s = ln.strip()
        if s.lower().startswith("fields"):
            in_fields = True
            continue
        if "\\IsSeamless" in s and "TRUE" in s.upper():
            seamless = True
        if in_fields:
            if not s or s.startswith(("!", '"')) or "=" in s:
                in_fields = False
                continue
            toks = s.rstrip(";").split()
            if not toks:
                continue
            name = toks[0]
            typ = toks[1].lower() if len(toks) > 1 else "char"
            width = 0
            m = "".join(toks[1:])
            if "(" in m:
                width = int(m[m.index("(") + 1:].split(",")[0]
                            .rstrip(")"))
            fields.append((name, typ, width))
    return {"fields": fields, "seamless": seamless}


_DAT_WIDTHS = {"integer": 4, "smallint": 2, "float": 8, "date": 4,
               "logical": 1}


def _read_dat(path: str, fields):
    data = open(path, "rb").read()
    nrec, hsize, rsize = struct.unpack_from("<iHH", data, 4)
    rows = []
    for r in range(nrec):
        base = hsize + r * rsize + 1  # skip delete flag
        off = 0
        row = []
        for name, typ, width in fields:
            if typ == "char":
                w = width
                v = data[base + off:base + off + w] \
                    .split(b"\x00")[0].decode("latin-1").rstrip()
            elif typ == "integer":
                w = 4
                (v,) = struct.unpack_from("<i", data, base + off)
            elif typ == "smallint":
                w = 2
                (v,) = struct.unpack_from("<h", data, base + off)
            elif typ == "float":
                w = 8
                (v,) = struct.unpack_from("<d", data, base + off)
            elif typ == "decimal":
                w = width
                txt = data[base + off:base + off + w].decode(
                    "latin-1").strip()
                v = float(txt) if txt else None
            elif typ == "logical":
                w = 1
                v = data[base + off:base + off + 1] in (b"T", b"t",
                                                        b"Y", b"1")
            elif typ == "date":
                w = 4
                yy, mm, dd = struct.unpack_from("<HBB", data, base + off)
                v = f"{yy:04d}-{mm:02d}-{dd:02d}" if yy else None
            else:
                w = width or 1
                v = data[base + off:base + off + w].decode(
                    "latin-1").rstrip()
            row.append(v)
            off += w
        rows.append(row)
    return rows


_SQL_T = {"char": "string", "integer": "int", "smallint": "smallint",
          "float": "double", "decimal": "double", "logical": "boolean",
          "date": "string"}


def read_tab_features(path: str, fid_offset: int = 0) -> list[tuple]:
    """All features of one TAB file as (fid, *attrs, wkb) tuples."""
    info = parse_tab(path)
    stem = os.path.splitext(path)[0]

    def side(ext):
        for e in (ext, ext.upper()):
            p = stem + "." + e
            if os.path.exists(p):
                return p
        return None

    rows = _read_dat(side("dat"), info["fields"])
    mapf = _MapFile(side("map")) if side("map") else None
    ids = (np.fromfile(side("id"), "<i4") if side("id") else
           np.zeros(0, "<i4"))
    out = []
    for i, attrs in enumerate(rows):
        wkb = None
        if mapf is not None and i < len(ids) and ids[i] > 0:
            _t, wkt = mapf.read_object(int(ids[i]))
            if wkt is not None:
                wkb = bytearray(wkb_from_wkt(wkt))
        out.append((fid_offset + i + 1, *attrs, wkb))
    return out


def read_tab(spark: SparkSession, path: str) -> DataFrame:
    """TAB dataset -> DataFrame [fid, fields..., geometry]. Seamless
    tables union their parts with (partId+1)<<32 FID offsets and the
    parts' own schema."""
    info = parse_tab(path)
    if info["seamless"]:
        base = os.path.dirname(path) or "."
        parts = read_tab_features(path)  # rows name the part tables
        all_rows = []
        part_fields = None
        for k, row in enumerate(parts):
            part_path = os.path.join(base, row[1])
            if not os.path.exists(part_path):
                cand = [f for f in os.listdir(base)
                        if f.lower() == row[1].lower()]
                part_path = os.path.join(base, cand[0])
            pf = parse_tab(part_path)["fields"]
            if part_fields is None:
                part_fields = pf
            all_rows.extend(read_tab_features(
                part_path, fid_offset=(k + 1) << 32))
        schema = "fid bigint, " + ", ".join(
            f"`{n}` {_SQL_T.get(t, 'string')}"
            for n, t, _w in part_fields) + ", geometry binary"
        return spark.createDataFrame(all_rows, schema)
    rows = read_tab_features(path)
    schema = "fid bigint, " + ", ".join(
        f"`{n}` {_SQL_T.get(t, 'string')}"
        for n, t, _w in info["fields"]) + ", geometry binary"
    return spark.createDataFrame(rows, schema)
