"""SQLite / SpatiaLite vector driver.

Reference semantics: gdal/ogr/ogrsf_frmts/sqlite/ogrsqlitedatasource.cpp
(layer discovery through the ``geometry_columns`` metadata table — legacy
SpatiaLite string-typed rows, SpatiaLite 4 integer ``geometry_type``
codes, and the FDO ``geometry_format`` flavor — plus plain aspatial
tables) and ogrsqlitelayer.cpp:2401 ``ImportSpatiaLiteGeometry`` /
``createFromSpatialiteInternal`` (:834) for the SpatiaLite geometry BLOB:

  byte 0        0x00
  byte 1        byte order of the body (1 = little endian)
  bytes 2..5    SRID (int32)
  bytes 6..37   MBR (4 doubles)
  byte 38       0x7C
  bytes 39..    geometry: int32 class code, then coordinates; collection
                members are each preceded by an 0x69 marker byte
  last byte     0xFE

Class codes (ogr_sqlite.h:90-140): 1..7 = Point/LineString/Polygon/
MultiPoint/MultiLineString/MultiPolygon/GeometryCollection in XY,
+1000 = XYZ, +2000 = XYM, +3000 = XYZM, +1000000 = "compressed"
(intermediate vertices stored as float32 deltas from the previous
vertex; first and last vertices full doubles —
ogrsqlitelayer.cpp:1159).  XYM drops M on read (the reference builds a
2-D OGRPoint from XYM, :936); XYZM keeps Z only.

Scale shape: the driver opens the file only for metadata (layer list +
rowid bounds); feature decode runs in executor tasks over rowid ranges,
one read-only sqlite connection per task — the same split-planning
pattern as the GeoPackage reader (sources/formats.py read_gpkg).
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.sources.formats import FEATURE_SCHEMA

WKB_25D = 0x80000000

# internal SpatiaLite bookkeeping tables never exposed as layers
# (ogrsqlitedatasource.cpp OpenTable exclusion list)
_INTERNAL = {
    "spatial_ref_sys", "spatialite_history", "sqlite_sequence",
    "geometry_columns", "geometry_columns_auth", "geometry_columns_time",
    "geometry_columns_statistics", "geometry_columns_field_infos",
    "views_geometry_columns", "views_geometry_columns_auth",
    "views_geometry_columns_statistics", "views_geometry_columns_field_infos",
    "virts_geometry_columns", "virts_geometry_columns_auth",
    "virts_geometry_columns_statistics", "virts_geometry_columns_field_infos",
    "sql_statements_log", "spatialindex", "sqlite_stat1", "sqlite_stat2",
    "sqlite_stat3", "sqlite_stat4", "elementarygeometries",
}


# ---------------------------------------------------------------------------
# SpatiaLite BLOB -> WKB
# ---------------------------------------------------------------------------

def _parse_body(buf: memoryview, off: int, endian: str,
                depth: int = 0) -> tuple[bytes, int]:
    """One geometry entity starting at the int32 class code; returns
    (little-endian WKB, bytes consumed)."""
    if depth > 32:
        raise ValueError("spatialite recursion too deep")
    (code,) = struct.unpack_from(endian + "i", buf, off)
    compressed = code >= 1000000
    base = code % 1000000
    dim_kind = base // 1000          # 0=XY 1=XYZ 2=XYM 3=XYZM
    kind = base % 1000               # 1..7
    if kind < 1 or kind > 7 or dim_kind > 3:
        raise ValueError(f"unsupported spatialite class {code}")
    has_z = dim_kind in (1, 3)
    has_m = dim_kind in (2, 3)
    ncoord = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    out_dims = 3 if has_z else 2     # M dropped, as the reference does
    wkb_type = kind | (WKB_25D if has_z else 0)
    head = struct.pack("<BI", 1, wkb_type)

    def read_points(off: int, n: int) -> tuple[list[tuple], int]:
        pts = []
        if compressed and kind != 1:
            px = py = pz = 0.0
            for i in range(n):
                if i == 0 or i == n - 1:
                    vals = struct.unpack_from(endian + "d" * ncoord, buf, off)
                    off += 8 * ncoord
                else:
                    # intermediate: float32 deltas for x,y (and z); m stays
                    # a full double even in compressed form
                    # (ogrsqlitelayer.cpp ComprLineStringXYM path)
                    dx, dy = struct.unpack_from(endian + "ff", buf, off)
                    off += 8
                    z = m = 0.0
                    if has_z:
                        (dz,) = struct.unpack_from(endian + "f", buf, off)
                        off += 4
                        z = pz + dz
                    if has_m:
                        (m,) = struct.unpack_from(endian + "d", buf, off)
                        off += 8
                    vals = ((px + dx, py + dy)
                            + ((z,) if has_z else ())
                            + ((m,) if has_m else ()))
                px, py = vals[0], vals[1]
                if has_z:
                    pz = vals[2]
                pts.append(vals[:2] + ((vals[2],) if has_z else ()))
            return pts, off
        for _ in range(n):
            vals = struct.unpack_from(endian + "d" * ncoord, buf, off)
            off += 8 * ncoord
            pts.append(vals[:2] + ((vals[2],) if has_z else ()))
        return pts, off

    def pack_pts(pts: list[tuple]) -> bytes:
        return b"".join(struct.pack("<" + "d" * out_dims, *p) for p in pts)

    start = off
    off += 4
    if kind == 1:                                     # Point
        pts, off = read_points(off, 1)
        return head + pack_pts(pts), off - start
    if kind == 2:                                     # LineString
        (n,) = struct.unpack_from(endian + "i", buf, off)
        off += 4
        pts, off = read_points(off, n)
        return head + struct.pack("<I", n) + pack_pts(pts), off - start
    if kind == 3:                                     # Polygon
        (nrings,) = struct.unpack_from(endian + "i", buf, off)
        off += 4
        body = [struct.pack("<I", nrings)]
        for _ in range(nrings):
            (n,) = struct.unpack_from(endian + "i", buf, off)
            off += 4
            pts, off = read_points(off, n)
            body.append(struct.pack("<I", n) + pack_pts(pts))
        return head + b"".join(body), off - start
    # collections (4..7): n entities, each 0x69-marked
    (n,) = struct.unpack_from(endian + "i", buf, off)
    off += 4
    parts = []
    for _ in range(n):
        if buf[off] != 0x69:
            raise ValueError("bad spatialite collection marker")
        off += 1
        wkb, used = _parse_body(buf, off, endian, depth + 1)
        parts.append(wkb)
        off += used
    return head + struct.pack("<I", n) + b"".join(parts), off - start


def spatialite_to_wkb(blob: bytes | None) -> tuple[int, bytes] | None:
    """SpatiaLite geometry BLOB -> (srid, WKB); None for NULL/corrupt
    (ogrsqlitelayer.cpp:2401 header validation)."""
    if blob is None or len(blob) < 44 or blob[0] != 0 or blob[38] != 0x7C \
            or blob[-1] != 0xFE:
        return None
    endian = "<" if blob[1] == 1 else ">"
    (srid,) = struct.unpack_from(endian + "i", blob, 2)
    wkb, _ = _parse_body(memoryview(blob), 39, endian)
    return srid, wkb


def _geom_to_wkb(value, fmt: str) -> bytes | None:
    """One stored geometry value -> WKB for the given metadata flavor
    (ogrsqlitelayer.cpp OGRSQLITE_FORMAT_* handling)."""
    if value is None:
        return None
    if fmt == "WKT":
        from gdal_spark.functions.geometry import wkb_from_wkt
        return wkb_from_wkt(value)
    data = bytes(value)
    if fmt == "WKB":
        return data
    # SpatiaLite (default), with WKB fallback sniffing for FDO-less
    # tables whose blobs are plain WKB
    parsed = spatialite_to_wkb(data)
    if parsed is not None:
        return parsed[1]
    if data[:1] in (b"\x00", b"\x01"):
        return data
    return None


# ---------------------------------------------------------------------------
# layer discovery + distributed scan
# ---------------------------------------------------------------------------

def sqlite_layers(path: str) -> list[dict]:
    """Layer metadata: every row of ``geometry_columns`` plus aspatial
    user tables (ogrsqlitedatasource.cpp Open)."""
    import sqlite3

    out = []
    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as cx:
        spatial = set()
        try:
            cols = [r[1] for r in cx.execute("PRAGMA table_info(geometry_columns)")]
            if "geometry_format" in cols:       # FDO flavor
                q = ("SELECT f_table_name, f_geometry_column, geometry_format,"
                     " srid FROM geometry_columns")
                for t, g, fmt, srid in cx.execute(q):
                    spatial.add(t.lower())
                    out.append({"name": t, "geom_col": g,
                                "format": (fmt or "WKB").upper(),
                                "srid": srid or 0})
            elif cols:                          # SpatiaLite legacy or v4
                q = ("SELECT f_table_name, f_geometry_column, srid "
                     "FROM geometry_columns")
                for t, g, srid in cx.execute(q):
                    spatial.add(t.lower())
                    out.append({"name": t, "geom_col": g,
                                "format": "SPATIALITE", "srid": srid or 0})
        except sqlite3.OperationalError:
            pass
        for (t,) in cx.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"):
            low = t.lower()
            if low in _INTERNAL or low in spatial or low.startswith("idx_") \
                    or low.startswith("sqlite_"):
                continue
            out.append({"name": t, "geom_col": None, "format": None,
                        "srid": 0})
    return out


def read_sqlite(spark: SparkSession, path: str, layer: str | None = None,
                num_splits: int = 8) -> DataFrame:
    """Distributed SQLite/SpatiaLite table scan -> FEATURE_SCHEMA rows."""
    import sqlite3

    layers = sqlite_layers(path)
    if not layers:
        raise ValueError(f"no tables in {path}")
    if layer is None:
        meta = layers[0]
    else:
        match = [l for l in layers if l["name"].lower() == layer.lower()]
        if not match:
            raise ValueError(f"layer {layer!r} not in {path} "
                             f"(have {[l['name'] for l in layers]})")
        meta = match[0]
    name, geom_col, fmt = meta["name"], meta["geom_col"], meta["format"]

    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as cx:
        lo, hi = cx.execute(
            f'SELECT min(rowid), max(rowid) FROM "{name}"').fetchone()
        info = list(cx.execute(f'PRAGMA table_info("{name}")'))
    if lo is None:
        return spark.createDataFrame([], FEATURE_SCHEMA)
    # an INTEGER PRIMARY KEY is the FID column (alias of rowid) and is not
    # a feature field (ogrsqlitetablelayer.cpp pszFIDColumn handling)
    pk = [r[1] for r in info if r[5] and r[2].upper() == "INTEGER"]
    fid_col = pk[0] if len(pk) == 1 else None
    attr_cols = [r[1] for r in info
                 if (geom_col is None or r[1].lower() != geom_col.lower())
                 and r[1] != fid_col]
    step = max(1, (hi - lo + num_splits) // num_splits)
    ranges = [(lo + i * step, min(lo + (i + 1) * step - 1, hi))
              for i in range(num_splits) if lo + i * step <= hi]
    rdf = spark.createDataFrame(ranges, "r0 long, r1 long").repartition(
        len(ranges), "r0")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as cx:
            for pdf in batches:
                rows = []
                for r0, r1 in zip(pdf["r0"], pdf["r1"]):
                    sel = ", ".join(f'"{c}"' for c in attr_cols)
                    if geom_col is not None:
                        sel += f', "{geom_col}"'
                    for rec in cx.execute(
                            f'SELECT rowid, {sel} FROM "{name}" '
                            f"WHERE rowid BETWEEN ? AND ?",
                            (int(r0), int(r1))):
                        fid = rec[0]
                        end = -1 if geom_col is not None else len(rec)
                        props = {k: (v.hex() if isinstance(v, bytes) else v)
                                 for k, v in zip(attr_cols, rec[1:end or None])}
                        wkb = (_geom_to_wkb(rec[-1], fmt)
                               if geom_col is not None else None)
                        rows.append((path, fid,
                                     json.dumps(props, sort_keys=True),
                                     bytearray(wkb) if wkb else None))
                yield pd.DataFrame(rows,
                                   columns=[f.name for f in FEATURE_SCHEMA])

    return rdf.mapInPandas(run, schema=FEATURE_SCHEMA)
