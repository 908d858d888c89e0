"""XLS (Excel 97-2003 binary, BIFF8) table reader.

Reference semantics: gdal/ogr/ogrsf_frmts/xls/ (the reference links
freexl and exposes one OGR layer per worksheet with typed fields and
no geometry; ogrxlsdatasource.cpp). This is a from-spec
re-implementation of the two containers freexl decodes:

- the OLE2/CFBF compound document ([MS-CFB]): 512-byte sectors, DIFAT
  -> FAT chains, directory entries, the mini-FAT for streams under
  4096 bytes, locating the 'Workbook'/'Book' stream;
- the BIFF8 record stream ([MS-XLS]): BOUNDSHEET sheet directory, SST
  shared strings (UTF-16/compressed, CONTINUE spanning), XF/FORMAT
  date-format classification, and the cell records NUMBER/RK/MULRK/
  LABELSST/LABEL/BOOLERR/FORMULA.

Integer-vs-real follows storage encoding like freexl: RK-int cells are
integers, 64-bit float cells are reals; XF number formats 14-22/45-47
(or custom formats with date/time letters) classify date/time/datetime.
"""

from __future__ import annotations

import datetime as _dt
import struct

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.sources.spreadsheet import (_Cell, _serial_to_dt,
                                            _table_to_df)

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREE, ENDCHAIN = 0xFFFFFFFF, 0xFFFFFFFE


# ---------------------------------------------------------------------------
# OLE2 compound document
# ---------------------------------------------------------------------------

def _ole2_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    if data[:8] != MAGIC:
        raise ValueError("not an OLE2 compound document")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    mini_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off:off + ssz]

    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s in (FREE, ENDCHAIN):
            break
        blk = sector(s)
        vals = struct.unpack(f"<{ssz // 4}I", blk)
        difat.extend(vals[:-1])
        s = vals[-1]
    fat = []
    for fs in difat[:n_fat]:
        if fs in (FREE, ENDCHAIN):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def chain(start: int) -> bytes:
        out, s = [], start
        seen = 0
        while s not in (FREE, ENDCHAIN) and seen < len(fat) + 2:
            out.append(sector(s))
            s = fat[s]
            seen += 1
        return b"".join(out)

    directory = chain(dir_start)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        nlen = struct.unpack_from("<H", directory, off + 64)[0]
        name = directory[off:off + max(0, nlen - 2)].decode(
            "utf-16-le", "replace")
        etype = directory[off + 66]
        start = struct.unpack_from("<I", directory, off + 116)[0]
        size = struct.unpack_from("<I", directory, off + 120)[0]
        entries.append((name, etype, start, size))
    root = next(e for e in entries if e[1] == 5)
    target = next((e for e in entries
                   if e[1] == 2 and e[0].lower() in
                   tuple(n.lower() for n in names)), None)
    if target is None:
        raise ValueError(f"OLE2 document has no {names} stream "
                         f"(have {[e[0] for e in entries if e[1] == 2]})")
    name, _t, start, size = target
    if size >= mini_cutoff:
        return chain(start)[:size]
    # mini-stream: sectors of mssz bytes inside the root entry's chain
    ministream = chain(root[2])
    minifat_sectors = []
    s = mini_start
    while s not in (FREE, ENDCHAIN):
        minifat_sectors.append(sector(s))
        s = fat[s]
    minifat = struct.unpack(f"<{len(minifat_sectors) * ssz // 4}I",
                            b"".join(minifat_sectors)) \
        if minifat_sectors else ()
    out, s = [], start
    while s not in (FREE, ENDCHAIN):
        out.append(ministream[s * mssz:(s + 1) * mssz])
        s = minifat[s]
    return b"".join(out)[:size]


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        yield rid, pos + 4, ln
        pos += 4 + ln


def _rk_value(rk: int) -> tuple[str, object]:
    mul = rk & 1
    if rk & 2:                      # signed 30-bit integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        return ("float", v / 100.0) if mul else ("int", v)
    bits = (rk & 0xFFFFFFFC) << 32
    (f,) = struct.unpack("<d", struct.pack("<Q", bits))
    return "float", (f / 100.0 if mul else f)


class _StrReader:
    """Byte reader across an SST record and its CONTINUEs; a string
    interrupted by a record boundary restarts with a fresh grbit."""

    def __init__(self, stream: bytes, frags: list[tuple[int, int]]):
        self.stream = stream
        self.frags = frags
        self.fi = 0
        self.off = 0

    def _remain(self) -> int:
        s, ln = self.frags[self.fi]
        return ln - self.off

    def take(self, n: int) -> bytes:
        out = b""
        while n > 0:
            while self._remain() == 0:
                self.fi += 1
                self.off = 0
            s, ln = self.frags[self.fi]
            k = min(n, ln - self.off)
            out += self.stream[s + self.off:s + self.off + k]
            self.off += k
            n -= k
        return out

    def at_boundary(self) -> bool:
        return self._remain() == 0 and self.fi + 1 < len(self.frags)

    def read_chars(self, cch: int, high: bool) -> str:
        """cch characters honoring CONTINUE re-grbit on boundaries."""
        out = []
        left = cch
        while left > 0:
            if self._remain() == 0:
                self.fi += 1
                self.off = 0
                high = bool(self.take(1)[0] & 1)
            s, ln = self.frags[self.fi]
            avail = ln - self.off
            width = 2 if high else 1
            k = min(left, avail // width)
            if k == 0 and avail > 0:
                k = 1  # degenerate: char split across boundary
            raw = self.take(k * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1",
                                  "replace"))
            left -= k
        return "".join(out)


def _parse_sst(stream: bytes, start: int, ln: int) -> list[str]:
    frags = [(start, ln)]
    pos = start + ln
    while pos + 4 <= len(stream):
        rid, ln2 = struct.unpack_from("<HH", stream, pos)
        if rid != 0x3C:
            break
        frags.append((pos + 4, ln2))
        pos += 4 + ln2
    rd = _StrReader(stream, frags)
    total, unique = struct.unpack("<II", rd.take(8))
    out = []
    for _ in range(unique):
        (cch,) = struct.unpack("<H", rd.take(2))
        grbit = rd.take(1)[0]
        high = bool(grbit & 1)
        runs = struct.unpack("<H", rd.take(2))[0] if grbit & 8 else 0
        ext = struct.unpack("<I", rd.take(4))[0] if grbit & 4 else 0
        out.append(rd.read_chars(cch, high))
        rd.take(runs * 4 + ext)
    return out


_DATE_FMT = {14, 15, 16, 17, 22, 45, 46, 47}


def _fmt_kind(code_id: int, custom: dict[int, str]) -> str | None:
    if code_id in (14, 15, 16):
        return "date"
    if code_id in (18, 19, 20, 21, 45, 46, 47):
        return "time"
    if code_id == 22:
        return "datetime"
    code = custom.get(code_id, "")
    low = code.lower()
    has_d = any(c in low for c in "yd") or "mm" in low
    has_t = "h" in low or "ss" in low
    if has_d and has_t:
        return "datetime"
    if has_d:
        return "date"
    if has_t:
        return "time"
    return None


def xls_sheets(path: str) -> list[str]:
    stream = _ole2_stream(open(path, "rb").read(), ("Workbook", "Book"))
    return [name for name, _pos in _xls_boundsheets(stream)]


def _xls_boundsheets(stream: bytes) -> list[tuple[str, int]]:
    out = []
    for rid, off, ln in _records(stream):
        if rid == 0x85:                       # BOUNDSHEET
            (pos,) = struct.unpack_from("<I", stream, off)
            cch = stream[off + 6]
            high = stream[off + 7] & 1
            raw = stream[off + 8:off + 8 + cch * (2 if high else 1)]
            name = raw.decode("utf-16-le" if high else "latin-1")
            out.append((name, pos))
        elif rid == 0x0A and out:             # EOF of globals
            break
    return out


def _xls_rows(path: str, sheet: str | None = None):
    stream = _ole2_stream(open(path, "rb").read(), ("Workbook", "Book"))
    sheets = _xls_boundsheets(stream)
    if not sheets:
        raise ValueError("XLS workbook has no sheets")
    # globals: SST, FORMAT, XF
    sst: list[str] = []
    custom_fmt: dict[int, str] = {}
    xf_fmt: list[int] = []
    for rid, off, ln in _records(stream):
        if rid == 0x0A:
            break
        if rid == 0xFC:
            sst = _parse_sst(stream, off, ln)
        elif rid == 0x41E:                    # FORMAT (BIFF8)
            (ifmt,) = struct.unpack_from("<H", stream, off)
            cch, grbit = struct.unpack_from("<HB", stream, off + 2)
            raw = stream[off + 5:off + 5 + cch * (2 if grbit & 1 else 1)]
            custom_fmt[ifmt] = raw.decode(
                "utf-16-le" if grbit & 1 else "latin-1")
        elif rid == 0xE0:                     # XF
            (ifmt,) = struct.unpack_from("<H", stream, off + 2)
            xf_fmt.append(ifmt)

    if sheet is None:
        target = sheets[0][1]
    else:
        match = [p for n, p in sheets if n == sheet]
        if not match:
            raise ValueError(f"sheet {sheet!r} not in {path}")
        target = match[0]

    def kind_of(ixfe: int, base: str, value):
        ifmt = xf_fmt[ixfe] if ixfe < len(xf_fmt) else 0
        k = _fmt_kind(ifmt, custom_fmt)
        if k is None:
            return _Cell(base, value)
        dt = _serial_to_dt(float(value))
        if k == "date":
            return _Cell("date", dt)
        if k == "time":
            return _Cell("time", dt)
        return _Cell("datetime", dt)

    cells: dict[tuple[int, int], _Cell] = {}
    max_r = max_c = -1
    for rid, off, ln in _records(stream, target):
        if rid == 0x0A:
            break
        if rid == 0xFD:                       # LABELSST
            r, c, ixfe, isst = struct.unpack_from("<HHHI", stream, off)
            cells[(r, c)] = _Cell("str", sst[isst] if isst < len(sst)
                                  else "")
        elif rid == 0x203:                    # NUMBER
            r, c, ixfe = struct.unpack_from("<HHH", stream, off)
            (v,) = struct.unpack_from("<d", stream, off + 6)
            cells[(r, c)] = kind_of(ixfe, "float", v)
        elif rid == 0x27E:                    # RK
            r, c, ixfe, rk = struct.unpack_from("<HHHI", stream, off)
            base, v = _rk_value(rk)
            cells[(r, c)] = kind_of(ixfe, base, v)
        elif rid == 0xBD:                     # MULRK
            r, c0 = struct.unpack_from("<HH", stream, off)
            n = (ln - 6) // 6
            for k in range(n):
                ixfe, rk = struct.unpack_from("<HI", stream,
                                              off + 4 + 6 * k)
                base, v = _rk_value(rk)
                cells[(r, c0 + k)] = kind_of(ixfe, base, v)
                max_r = max(max_r, r)
                max_c = max(max_c, c0 + k)
            continue                          # extent updated per cell
        elif rid == 0x204:                    # LABEL (inline)
            r, c, ixfe, cch = struct.unpack_from("<HHHH", stream, off)
            grbit = stream[off + 8]
            raw = stream[off + 9:off + 9 + cch * (2 if grbit & 1 else 1)]
            cells[(r, c)] = _Cell("str", raw.decode(
                "utf-16-le" if grbit & 1 else "latin-1"))
        elif rid == 0x205:                    # BOOLERR
            r, c, ixfe = struct.unpack_from("<HHH", stream, off)
            if stream[off + 7] == 0:          # boolean, not error
                cells[(r, c)] = _Cell("int", int(stream[off + 6]))
        elif rid == 0x06:                     # FORMULA: cached result
            r, c, ixfe = struct.unpack_from("<HHH", stream, off)
            raw = stream[off + 6:off + 14]
            if raw[6:8] != b"\xff\xff":
                (v,) = struct.unpack("<d", raw)
                cells[(r, c)] = kind_of(ixfe, "float", v)
        else:
            continue
        if (r, c) in cells:
            max_r = max(max_r, r)
            max_c = max(max_c, c)
    rows = []
    for r in range(max_r + 1):
        rows.append([cells.get((r, c)) for c in range(max_c + 1)])
    return rows


def read_xls(spark: SparkSession, path: str, sheet: str | None = None,
             headers: str = "auto") -> DataFrame:
    return _table_to_df(spark, _xls_rows(path, sheet), headers)


def xls_field_types(path: str, sheet: str | None = None) -> list[str]:
    """OGR field-type names per column (parity with
    spreadsheet_field_types)."""
    from gdal_spark.sources.spreadsheet import _merge_type
    rows = [r for r in _xls_rows(path, sheet)
            if any(c is not None for c in r)]
    ncols = max(len(r) for r in rows)
    types: list[str | None] = [None] * ncols
    for r in rows[1:]:
        for i in range(ncols):
            c = r[i] if i < len(r) else None
            if c is not None:
                types[i] = _merge_type(types[i], c.kind)
    m = {"str": "String", "int": "Integer", "float": "Real",
         "date": "Date", "time": "Time", "datetime": "DateTime"}
    return [m[t or "str"] for t in types]
