"""PGDump writer: PostGIS SQL dump of a feature DataFrame.

Reference semantics: gdal/ogr/ogrsf_frmts/pgdump/ogrpgdumpdatasource.cpp
+ ogrpgdumplayer.cpp — emits DROP TABLE/DELETE FROM geometry_columns/
BEGIN/CREATE TABLE (OGC_FID SERIAL pk)/AddGeometryColumn/GIST index/
ALTER TABLE ADD COLUMN per field, then either INSERT statements (hex
EWKB literals, only the set fields listed) or PG_USE_COPY tab-separated
COPY blocks with \\N nulls, and COMMIT.  Field names launder to lower
case; DIM=3 pads Z=0 and sets the WKB 25D flag; a non-negative SRID
writes the EWKB SRID flag (0x20000000)."""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame


def _launder(name: str) -> str:
    return name.lower().replace("-", "_").replace("#", "_")


def _wkb_dim3(wkb: bytes) -> bytes:
    """2-D linear WKB -> 25D with z=0 (what SetFrom + DIM=3 stores)."""
    out = bytearray()
    buf = memoryview(wkb)
    off = 0

    def geom(off: int) -> int:
        nonlocal out
        order = buf[off]
        end = "<" if order == 1 else ">"
        (typ,) = struct.unpack_from(end + "I", buf, off + 1)
        base = typ & 0xFF
        out.append(1)
        out += struct.pack("<I", (base | 0x80000000))
        off += 5
        if base == 1:
            x, y = struct.unpack_from(end + "2d", buf, off)
            out += struct.pack("<3d", x, y, 0.0)
            return off + 16
        if base == 2:
            (n,) = struct.unpack_from(end + "I", buf, off)
            out += struct.pack("<I", n)
            off += 4
            for _ in range(n):
                x, y = struct.unpack_from(end + "2d", buf, off)
                out += struct.pack("<3d", x, y, 0.0)
                off += 16
            return off
        if base == 3:
            (nr,) = struct.unpack_from(end + "I", buf, off)
            out += struct.pack("<I", nr)
            off += 4
            for _ in range(nr):
                (n,) = struct.unpack_from(end + "I", buf, off)
                out += struct.pack("<I", n)
                off += 4
                for _ in range(n):
                    x, y = struct.unpack_from(end + "2d", buf, off)
                    out += struct.pack("<3d", x, y, 0.0)
                    off += 16
            return off
        # collections: recurse
        (n,) = struct.unpack_from(end + "I", buf, off)
        out += struct.pack("<I", n)
        off += 4
        for _ in range(n):
            off = geom(off)
        return off

    geom(0)
    return bytes(out)


def _ewkb(wkb: bytes, srid: int, dim: int) -> str:
    if dim == 3:
        wkb = _wkb_dim3(wkb)
    if srid >= 0:
        order = wkb[0]
        end = "<" if order == 1 else ">"
        (typ,) = struct.unpack_from(end + "I", wkb, 1)
        wkb = (wkb[:1] + struct.pack(end + "I", typ | 0x20000000)
               + struct.pack(end + "I", srid) + wkb[5:])
    return wkb.hex().upper()


def _sql_value(v) -> str:
    if isinstance(v, float):
        return f"{v:.15g}"
    if isinstance(v, bool):
        return "'t'" if v else "'f'"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def write_pgdump(df: DataFrame, path: str, layer: str,
                 fields: list[tuple] | None = None,
                 schema: str = "public", srid: int = -1,
                 geom_name: str = "wkb_geometry",
                 geom_type: str = "GEOMETRY", dim: int = 2,
                 use_copy: bool = False, crlf: bool = False,
                 geometry_col: str = "geometry",
                 properties_col: str = "properties") -> int:
    """Dump a FEATURE_SCHEMA DataFrame (properties JSON + WKB geometry)
    as a PGDump SQL file.  ``fields`` is [(name, sqltype)] in emission
    order; defaults to the union of property keys as VARCHAR."""
    eol = "\r\n" if crlf else "\n"
    if fields is None:
        # discover the field union distributedly, then stream rows
        from pyspark.sql import functions as F
        keys = [r[0] for r in
                (df.select(F.explode(F.map_keys(
                    F.from_json(properties_col, "map<string,string>")))
                    .alias("k")).distinct().orderBy("k").collect())]
        fields = [(k, "VARCHAR") for k in keys]
    lfields = [(_launder(n), t) for n, t in fields]

    n_rows = 0
    out = []
    out.append(f'DROP TABLE IF EXISTS "{schema}"."{layer}" CASCADE;')
    out.append(f"DELETE FROM geometry_columns WHERE f_table_name = "
               f"'{layer}' AND f_table_schema = '{schema}';")
    out.append("BEGIN;")
    out.append(f'CREATE TABLE "{schema}"."{layer}" ( OGC_FID SERIAL, '
               f'CONSTRAINT "{layer}_pk" PRIMARY KEY (OGC_FID) );')
    out.append(f"SELECT AddGeometryColumn('{schema}','{layer}',"
               f"'{geom_name}',{srid},'{geom_type}',{dim});")
    out.append(f'CREATE INDEX "{layer}_{geom_name}_geom_idx" ON '
               f'"{schema}"."{layer}" USING GIST ("{geom_name}");')
    for name, typ in lfields:
        out.append(f'ALTER TABLE "{schema}"."{layer}" ADD COLUMN '
                   f'"{name}" {typ};')

    if use_copy:
        cols = ", ".join([f'"{geom_name}"']
                         + [f'"{n}"' for n, _t in lfields])
        out.append(f'COPY "{schema}"."{layer}" ({cols}) FROM STDIN;')
        for r in df.toLocalIterator():
            n_rows += 1
            props = json.loads(r[properties_col] or "{}")
            vals = []
            g = r[geometry_col]
            vals.append(_ewkb(bytes(g), srid, dim) if g is not None
                        else "\\N")
            for name, _t in fields:
                v = props.get(name)
                if v is None:
                    vals.append("\\N")
                elif isinstance(v, float):
                    vals.append(f"{v:.15g}")
                else:
                    vals.append(str(v))
            out.append("\t".join(vals))
        out.append("\\.")
    else:
        for r in df.toLocalIterator():
            n_rows += 1
            props = json.loads(r[properties_col] or "{}")
            names, vals = [], []
            g = r[geometry_col]
            if g is not None:
                names.append(f'"{geom_name}" ')
                vals.append(f"'{_ewkb(bytes(g), srid, dim)}'")
            for (name, _t), (lname, _lt) in zip(fields, lfields):
                v = props.get(name)
                if v is None:
                    continue
                names.append(f'"{lname}"')
                vals.append(_sql_value(v))
            out.append(f'INSERT INTO "{schema}"."{layer}" '
                       f'({", ".join(names)}) VALUES '
                       f'({", ".join(vals)});')
    out.append("COMMIT;")
    with open(path, "w", newline="") as f:
        f.write(eol.join(out) + eol)
    return n_rows
