"""SXF (Storage and eXchange Format — Russian topographic maps)
reader.

Reference semantics: gdal/ogr/ogrsf_frmts/sxf/ — file header
(org_sxf_defs.h SXFHeader: 'SXF\\0', header length 256=v3 / 400=v4),
passport (scale + corner coordinates, ogrsxfdatasource.cpp
ReadSXFDescription/ReadSXFMapDescription), information flags
(real-coordinate and projection-compliance bits :370-420), record
count at byte 288 (v3) / 440 (v4) and records from 300 / 452
(:820-845).  Each record: 32-byte header (record id 0x7FFF7FFF,
lengths, classification code, reference bits choosing geometry type
and value type, ogrsxflayer.cpp:607-760), then the coordinate
certificate — main point list plus (subobject id, count) prefixed
sub-lists (:447-520), values as i16/i32/f32/f64 pairs stored (y, x),
scaled by scale/resolution with the map origin unless the
real-coordinates flag is set (TranslateXYH :428-604).

Scale note: an SXF sheet is a single sidecar artifact; the reference
reader is likewise a sequential record walk. Rows distribute after
load."""
from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions.geometry import wkb_from_wkt

_GEOM_NAMES = {0: "LINE", 1: "POLYGON", 2: "POINT", 3: "TEXT",
               4: "VECTOR", 5: "TEXT_TEMPLATE",
               0x21: "VECTOR_ANGLE", 0x22: "VECTOR_SCALED"}


class SXFFile:
    def __init__(self, path: str):
        d = open(path, "rb").read()
        if d[:3] != b"SXF":
            raise ValueError("not an SXF file")
        self.data = d
        (hlen,) = struct.unpack_from("<I", d, 4)
        self.version = d[10] if hlen > 256 else d[9]
        if self.version not in (3, 4):
            raise ValueError(f"unsupported SXF version {self.version}")
        if self.version == 4:
            # 16-byte SXFHeader, then the 80-byte description
            (self.scale,) = struct.unpack_from("<I", d, 16 + 44)
            flags = d[16 + 80]
            self.real_coords = bool(flags & 0x10)
            base = 16 + 80 + 4 + 4  # flags u4 + epsg u4
            self.proj_corners = struct.unpack_from("<8d", d, base)
            self.resolution = None
            (self.nrecords,) = struct.unpack_from("<I", d, 440)
            self.data_start = 452
        else:
            (self.scale,) = struct.unpack_from("<I", d, 16 + 32)
            flags = d[16 + 62]
            self.real_coords = bool(flags & 0x10)
            base = 16 + 62 + 4 + 12
            self.proj_corners = tuple(
                v / 10.0 for v in struct.unpack_from("<8i", d, base))
            (self.nrecords,) = struct.unpack_from("<I", d, 288)
            self.data_start = 300

    def records(self):
        """Walk the record section: (classify_code, geom_kind, parts)
        where parts is a list of (x, y) coordinate lists."""
        d = self.data
        pos = self.data_start
        out = []
        for _ in range(self.nrecords):
            if pos + 32 > len(d):
                break
            (rid, full_len, geom_len, cls) = \
                struct.unpack_from("<4I", d, pos)
            if rid != 0x7FFF7FFF:
                break
            ref = d[pos + 20:pos + 23]
            (npt_big,) = struct.unpack_from("<I", d, pos + 24)
            (nsub, npt_small) = struct.unpack_from("<2H", d, pos + 28)
            if self.version == 4:
                if ref[2] & 0x20:
                    nsub = 0
                code = ref[0] & 15
                if code == 0x04:
                    code = 0x21
                    nsub = 0
            else:
                if ref[2] & 0x08:
                    code = 0x22 if (ref[2] & 0x10) else 0x21
                    nsub = 0
                else:
                    code = ref[0] & 3
            npoints = npt_big if npt_small == 65535 else npt_small
            b3d = bool(ref[2] & 0x02)
            bfloat = bool(ref[2] & 0x04)
            bbig = bool(ref[1] & 0x04)
            cert = d[pos + 32:pos + 32 + geom_len]
            parts = []
            off = 0

            def read_pt(off):
                if bfloat and bbig:
                    y, x = struct.unpack_from("<2d", cert, off)
                    off += 16
                elif bfloat:
                    y, x = struct.unpack_from("<2f", cert, off)
                    off += 8
                elif bbig:
                    y, x = struct.unpack_from("<2i", cert, off)
                    off += 8
                else:
                    y, x = struct.unpack_from("<2h", cert, off)
                    off += 4
                if b3d:
                    off += 4  # H always float32
                return float(x), float(y), off

            try:
                main = []
                for _i in range(npoints):
                    x, y, off = read_pt(off)
                    main.append((x, y))
                parts.append(main)
                for _s in range(nsub):
                    (_sid, ncoords) = struct.unpack_from("<2H", cert, off)
                    off += 4
                    sub = []
                    for _i in range(ncoords):
                        x, y, off = read_pt(off)
                        sub.append((x, y))
                    parts.append(sub)
            except struct.error:
                pass
            out.append((cls, _GEOM_NAMES.get(code, "UNKNOWN"), parts))
            pos += full_len
        return out


def open_sxf(path: str) -> SXFFile:
    return SXFFile(path)


def read_sxf(spark: SparkSession, path: str) -> DataFrame:
    """All SXF records as a DataFrame [fid, classify_code, kind,
    geometry]."""
    f = SXFFile(path)

    def fmt(pts):
        return ",".join(f"{x:.10g} {y:.10g}" for x, y in pts)

    rows = []
    for i, (cls, kind, parts) in enumerate(f.records()):
        wkt = None
        nonempty = [p for p in parts if p]
        if nonempty:
            if kind == "POINT" and len(nonempty[0]) >= 1:
                if len(nonempty) == 1 and len(nonempty[0]) == 1:
                    x, y = nonempty[0][0]
                    wkt = f"POINT ({x:.10g} {y:.10g})"
                else:
                    wkt = "MULTIPOINT (" + ",".join(
                        f"{x:.10g} {y:.10g}" for p in nonempty
                        for x, y in p) + ")"
            elif kind == "POLYGON":
                rings = []
                for p in nonempty:
                    if len(p) >= 3:
                        if p[0] != p[-1]:
                            p = p + [p[0]]
                        rings.append(f"({fmt(p)})")
                if rings:
                    wkt = "POLYGON (" + ",".join(rings) + ")"
            elif kind in ("LINE", "VECTOR_SCALED", "TEXT",
                          "VECTOR_ANGLE"):
                lines = [p for p in nonempty if len(p) >= 2]
                if len(lines) == 1:
                    wkt = f"LINESTRING ({fmt(lines[0])})"
                elif len(lines) > 1:
                    wkt = "MULTILINESTRING (" + ",".join(
                        f"({fmt(p)})" for p in lines) + ")"
        rows.append((i + 1, int(cls), kind,
                     bytearray(wkb_from_wkt(wkt)) if wkt else None))
    return spark.createDataFrame(
        rows, "fid bigint, classify_code bigint, kind string, "
              "geometry binary")
