"""XLSX / ODS spreadsheet table readers.

Reference semantics: gdal/ogr/ogrsf_frmts/xlsx/ogrxlsxdatasource.cpp —
sheets from xl/workbook.xml in file order, shared strings, cell typing
from the t attribute plus the style's numFmtId (builtin 14-17 Date,
18-21 Time, 22 DateTime; custom formats with date/time letters), Excel
serial dates (epoch 1899-12-30); first row becomes the field names
when it is all-string and a later row isn't (OGR_XLSX_HEADERS AUTO),
columns type-merge to Integer/Real/Date/Time/DateTime/String.
gdal/ogr/ogrsf_frmts/ods/ogrodsdatasource.cpp reads the same model
from content.xml office:value-type attributes.

Scale note: spreadsheets are sidecar artifacts (the XML is one zip
member); parse on the driver, rows distribute."""
from __future__ import annotations

import datetime as _dt
import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_EPOCH = _dt.datetime(1899, 12, 30)


def _serial_to_dt(v: float) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(days=v)


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


class _Cell:
    __slots__ = ("kind", "value")

    def __init__(self, kind, value):
        self.kind = kind      # str/int/float/date/time/datetime
        self.value = value


def _xlsx_styles(z: zipfile.ZipFile) -> list[str]:
    """cellXfs index -> 'date'/'time'/'datetime'/'' via numFmtId."""
    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return []
    custom = {}
    for nf in root.iter(_NS + "numFmt"):
        fid = int(nf.get("numFmtId"))
        code = nf.get("formatCode", "")
        bare = re.sub(r"\[[^]]*\]|\"[^\"]*\"", "", code).lower()
        has_d = any(c in bare for c in "dy")
        has_t = any(c in bare for c in "hs")
        if not has_d and not has_t and "m" in bare:
            has_d = True        # bare month format
        if has_d and has_t:
            custom[fid] = "datetime"
        elif has_t:
            custom[fid] = "time"
        elif has_d:
            custom[fid] = "date"
        else:
            custom[fid] = ""
    out = []
    xfs = root.find(_NS + "cellXfs")
    if xfs is None:
        return []
    for xf in xfs.findall(_NS + "xf"):
        fid = int(xf.get("numFmtId", "0"))
        if 14 <= fid <= 17:
            out.append("date")
        elif 18 <= fid <= 21 or 45 <= fid <= 47:
            out.append("time")
        elif fid == 22:
            out.append("datetime")
        else:
            out.append(custom.get(fid, ""))
    return out


def xlsx_sheets(path: str) -> list[str]:
    z = zipfile.ZipFile(path)
    root = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name")
            for s in root.iter(_NS + "sheet")]


def _xlsx_rows(path: str, sheet: str) -> list[list[_Cell | None]]:
    z = zipfile.ZipFile(path)
    names = xlsx_sheets(path)
    idx = names.index(sheet) + 1
    try:
        shared = [("".join(t.text or "" for t in si.iter(_NS + "t")))
                  for si in ET.fromstring(z.read("xl/sharedStrings.xml"))
                  .iter(_NS + "si")]
    except KeyError:
        shared = []
    styles = _xlsx_styles(z)
    root = ET.fromstring(z.read(f"xl/worksheets/sheet{idx}.xml"))
    rows = []
    for row in root.iter(_NS + "row"):
        # missing row numbers are empty features (OGR materializes
        # the gap, ogrxlsxdatasource.cpp startElementTable)
        rno = int(row.get("r", len(rows) + 1))
        while len(rows) < rno - 1:
            rows.append([])
        cells: list[_Cell | None] = []
        for c in row.findall(_NS + "c"):
            ci = _col_index(c.get("r", ""))
            while len(cells) < ci:
                cells.append(None)
            t = c.get("t", "n")
            s = c.get("s")
            vel = c.find(_NS + "v")
            if t == "inlineStr":
                txt = "".join(x.text or ""
                              for x in c.iter(_NS + "t"))
                cells.append(_Cell("str", txt))
                continue
            if vel is None or vel.text is None:
                cells.append(None)
                continue
            raw = vel.text
            if t == "s":
                cells.append(_Cell("str", shared[int(raw)]))
            elif t == "str":
                cells.append(_Cell("str", raw))
            elif t == "b":
                cells.append(_Cell("int", int(raw)))
            else:
                style = (styles[int(s)] if s is not None and
                         int(s) < len(styles) else "")
                v = float(raw)
                if style == "date":
                    cells.append(_Cell("date", _serial_to_dt(v)))
                elif style == "time":
                    cells.append(_Cell("time", _serial_to_dt(v)))
                elif style == "datetime":
                    cells.append(_Cell("datetime", _serial_to_dt(v)))
                elif v == int(v) and "." not in raw and \
                        "e" not in raw.lower():
                    cells.append(_Cell("int", int(v)))
                else:
                    cells.append(_Cell("float", v))
        rows.append(cells)
    return rows


_ODS_T = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_ODS_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_ODS_TXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def ods_sheets(path: str) -> list[str]:
    z = zipfile.ZipFile(path)
    root = ET.fromstring(z.read("content.xml"))
    return [t.get(_ODS_T + "name")
            for t in root.iter(_ODS_T + "table")]


def _ods_rows(path: str, sheet: str) -> list[list[_Cell | None]]:
    z = zipfile.ZipFile(path)
    root = ET.fromstring(z.read("content.xml"))
    table = next(t for t in root.iter(_ODS_T + "table")
                 if t.get(_ODS_T + "name") == sheet)
    rows = []
    for row in table.iter(_ODS_T + "table-row"):
        rrep = int(row.get(_ODS_T + "number-rows-repeated", "1"))
        cells: list[_Cell | None] = []
        for c in row.iter(_ODS_T + "table-cell"):
            rep = int(c.get(_ODS_T + "number-columns-repeated", "1"))
            vt = c.get(_ODS_O + "value-type")
            cell = None
            if vt == "float" or vt == "percentage" or vt == "currency":
                v = float(c.get(_ODS_O + "value"))
                cell = _Cell("int", int(v)) if v == int(v) and \
                    "." not in c.get(_ODS_O + "value") else \
                    _Cell("float", v)
            elif vt == "boolean":
                cell = _Cell("int",
                             1 if c.get(_ODS_O + "boolean-value")
                             == "true" else 0)
            elif vt == "date":
                dv = c.get(_ODS_O + "date-value")
                if "T" in dv:
                    cell = _Cell("datetime",
                                 _dt.datetime.fromisoformat(dv))
                else:
                    cell = _Cell("date",
                                 _dt.datetime.fromisoformat(dv))
            elif vt == "time":
                tv = c.get(_ODS_O + "time-value")  # PTxxHxxMxxS
                m = re.match(r"PT(\d+)H(\d+)M([\d.]+)S", tv or "")
                if m:
                    cell = _Cell("time", _EPOCH + _dt.timedelta(
                        hours=int(m.group(1)),
                        minutes=int(m.group(2)),
                        seconds=float(m.group(3))))
            elif vt == "string" or vt is None:
                txt = "\n".join("".join(p.itertext())
                                for p in c.findall(_ODS_TXT + "p"))
                if txt or vt == "string":
                    cell = _Cell("str", txt) if (txt or vt == "string") \
                        else None
            for _ in range(rep if rep < 1000 else 1):
                cells.append(cell)
        while cells and cells[-1] is None:
            cells.pop()
        # intermediate repeated empty rows are real (empty) features;
        # the huge trailing filler repeat is not
        for _ in range(rrep if rrep < 1000 else 1):
            rows.append(cells)
    while rows and not rows[-1]:
        rows.pop()
    return rows


# ---------------------------------------------------------------------------
# Shared table -> DataFrame conversion (the OGR XLSX/ODS layer model)
# ---------------------------------------------------------------------------

def _merge_type(a: str | None, b: str) -> str:
    if a is None or a == b:
        return b
    if {a, b} == {"int", "float"}:
        return "float"
    if {a, b} <= {"date", "time", "datetime"}:
        return "datetime"
    return "str"


def _fmt(cell: _Cell, t: str):
    if cell is None:
        return None
    v = cell.value
    if t == "str":
        if cell.kind == "date":
            return v.strftime("%Y/%m/%d")
        if cell.kind == "time":
            return v.strftime("%H:%M:%S")
        if cell.kind == "datetime":
            return v.strftime("%Y/%m/%d %H:%M:%S")
        return str(v)
    if t == "int":
        return int(v)
    if t == "float":
        return float(v)
    if t == "date":
        return v.strftime("%Y/%m/%d")
    if t == "time":
        return v.strftime("%H:%M:%S")
    if t == "datetime":
        return v.strftime("%Y/%m/%d %H:%M:%S")
    return str(v)


_SQL = {"str": "string", "int": "bigint", "float": "double",
        "date": "string", "time": "string", "datetime": "string"}


def _table_to_df(spark: SparkSession, rows, headers: str = "auto"
                 ) -> DataFrame:
    # gap rows stay as empty features; trailing empties are trimmed
    while rows and not any(c is not None for c in rows[-1]):
        rows.pop()
    if not rows:
        return spark.createDataFrame([], "fid bigint")
    ncols = max(len(r) for r in rows)
    first_all_str = all(c is None or c.kind == "str" for c in rows[0]) \
        and any(c is not None for c in rows[0])
    later_nonstr = any(c is not None and c.kind != "str"
                       for r in rows[1:] for c in r)
    use_headers = (headers == "force") or \
        (headers == "auto" and first_all_str and later_nonstr and
         len(rows) > 1)
    if use_headers:
        names = [(rows[0][i].value if i < len(rows[0]) and rows[0][i]
                  else f"Field{i + 1}") for i in range(ncols)]
        data = rows[1:]
    else:
        names = [f"Field{i + 1}" for i in range(ncols)]
        data = rows
    types: list[str | None] = [None] * ncols
    for r in data:
        for i in range(ncols):
            c = r[i] if i < len(r) else None
            if c is not None:
                types[i] = _merge_type(types[i], c.kind)
    types = [t or "str" for t in types]
    out = []
    for j, r in enumerate(data):
        vals = [_fmt(r[i] if i < len(r) else None, types[i])
                for i in range(ncols)]
        out.append((j + 1, *vals))
    schema = "fid bigint, " + ", ".join(
        f"`{n}` {_SQL[t]}" for n, t in zip(names, types))
    df = spark.createDataFrame(out, schema)
    return df


def read_xlsx(spark: SparkSession, path: str, sheet: str | None = None,
              headers: str = "auto") -> DataFrame:
    sheets = xlsx_sheets(path)
    return _table_to_df(spark, _xlsx_rows(path, sheet or sheets[0]),
                        headers)


def read_ods(spark: SparkSession, path: str, sheet: str | None = None,
             headers: str = "auto") -> DataFrame:
    sheets = ods_sheets(path)
    return _table_to_df(spark, _ods_rows(path, sheet or sheets[0]),
                        headers)


def spreadsheet_field_types(spark, path: str, sheet: str,
                            kind: str = "xlsx") -> list[str]:
    """OGR field-type names per column (for parity tests)."""
    rows = (_xlsx_rows if kind == "xlsx" else _ods_rows)(path, sheet)
    rows = [r for r in rows if any(c is not None for c in r)]
    ncols = max(len(r) for r in rows)
    data = rows[1:]
    types: list[str | None] = [None] * ncols
    for r in data:
        for i in range(ncols):
            c = r[i] if i < len(r) else None
            if c is not None:
                types[i] = _merge_type(types[i], c.kind)
    m = {"str": "String", "int": "Integer", "float": "Real",
         "date": "Date", "time": "Time", "datetime": "DateTime"}
    return [m[t or "str"] for t in types]
