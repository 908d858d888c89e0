"""US Census TIGER/Line reader (the reference's most-used remaining
vector format).

Reference semantics: gdal/ogr/ogrsf_frmts/tiger/ —
- ogrtigerdatasource.cpp:400-540: module discovery (``*.RT1`` files in a
  directory, or a single ``.RT1`` path), version code at record columns
  2-5 of the first RT1 record, ``TigerClassifyVersion`` (:41) mapping
  the MMYY code to a version era, GDT copyright-header tolerance.
- tigerfilebase.cpp GetField (:241): 1-based inclusive column slices,
  right-trimmed; empty -> unset (null). SetFields applies the
  per-version TigerFieldInfo tables (record layouts are the Census
  Bureau's published TIGER/Line spec; tabulated in
  ``gdal_spark/data/tiger_schema.py``).
- tigercompletechain.cpp: RT1 carries start/end points (cols 191-228,
  integer microdegrees); intermediate vertices come from RT2 records
  (TLID cols 6-15, RTSQ 16-18, ten 19-char lon/lat slots from col 19,
  0/0 terminates); RT3 supplies additional attributes. Geometry is the
  ordered concatenation start + RT2 vertices + end (:574-607).
- tigeraltname.cpp: the five 8-char FEAT slots (cols 19..58) collapse
  into one IntegerList field (:GetFeature).
- tigerpolygon.cpp:395-411: RTA attributes merged with the parallel RTS
  record (same CENID/POLYID); version-selected tables.
- tigerpoint.cpp GetFeature: point layers (Landmarks 55-64/65-73, PIP
  26-35/36-44, OverUnder 62-71/72-80) build POINT geometry from integer
  microdegree columns; 0/0 -> no geometry.

Spark-first design: every record file is line-oriented fixed-width
text, so modules load through ``spark.read.text`` (splittable,
distributed) and ALL field extraction is pure JVM column math
(``substr``/``rtrim``/``cast``) — no Python in the attribute path. The
CompleteChain geometry assembly is a distributed groupBy(TLID) over the
exploded RT2 vertex slots joined back to RT1; only the final WKB pack
runs in an Arrow-batched pandas UDF. At 100 TB (national TIGER is ~3000
county modules), modules parallelize by file split and the one shuffle
is the RT2 vertex group — keyed by TLID, naturally uniform.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.data import tiger_schema as TS

# version era ordering (ogr_tiger.h TigerVersion enum)
(V1990_PRE, V1990, V1992, V1994, V1995, V1997, V1998, V1999,
 V2000_REDIST, V2000_CENSUS, VUA2000, V2002, V2003, V2004) = range(14)

_VERSION_NAMES = {
    V1990_PRE: "TIGER_1990_Precensus", V1990: "TIGER_1990",
    V1992: "TIGER_1992", V1994: "TIGER_1994", V1995: "TIGER_1995",
    V1997: "TIGER_1997", V1998: "TIGER_1998", V1999: "TIGER_1999",
    V2000_REDIST: "TIGER_2000_Redistricting",
    V2000_CENSUS: "TIGER_2000_Census", VUA2000: "TIGER_UA2000",
    V2002: "TIGER_2002", V2003: "TIGER_2003", V2004: "TIGER_2004",
}


def classify_version(code: int) -> int:
    """ogrtigerdatasource.cpp:41 TigerClassifyVersion."""
    fixed = {0: V1990_PRE, 2: V1990, 3: V1992, 5: V1994, 21: V1994,
             24: V1995, 9999: VUA2000}
    if code in fixed:
        return fixed[code]
    yy, mm = code % 100, code // 100
    c = yy * 100 + mm
    if 9706 <= c <= 9810:
        return V1997
    if 9812 <= c <= 9904:
        return V1998
    if 6 <= c <= 8:
        return V1999
    if 10 <= c <= 11:
        return V2000_REDIST
    if 103 <= c <= 108:
        return V2000_CENSUS
    if 203 <= c <= 205:
        return VUA2000
    if 210 <= c <= 306:
        return V2002
    if 312 <= c <= 403:
        return V2003
    if c >= 404:
        return V2004
    return -1


# layer -> (file code, [(record-info key, min version or None)...],
#           optional (x0, x1, y0, y1) point columns, min layer version,
#           max-exclusive layer version)
_LAYERS = {
    "AltName": ("4", [("rt4", None)], None, None, None),
    "FeatureIds": ("5", [("rt5_2002", V2002), ("rt5", None)],
                   None, None, None),
    "ZipCodes": ("6", [("rt6", None)], None, None, None),
    "Landmarks": ("7", [("rt7_2002", V2002), ("rt7", None)],
                  (55, 64, 65, 73), None, None),
    "AreaLandmarks": ("8", [("rt8", None)], None, None, None),
    "KeyFeatures": ("9", [("rt9", None)], None, None, V2002),
    "PolygonCorrections": ("B", [("rtB", None)], None, V2002, None),
    "EntityNames": ("C", [("rtC_2002", V2002),
                          ("rtC_2000_Redistricting", V2000_REDIST),
                          ("rtC", None)], None, None, None),
    "PolygonEconomic": ("E", [("rtE", None)], None, V2002, None),
    "IDHistory": ("H", [("rtH", None)], None, None, None),
    "PolyChainLink": ("I", [("rtI_2002", V2002), ("rtI", None)],
                      None, None, None),
    "SpatialMetadata": ("M", [("rtM", None)], None, None, None),
    "PIP": ("P", [("rtP_2002", V2002), ("rtP", None)],
            (26, 35, 36, 44), None, None),
    "TLIDRange": ("R", [("rtR_2002", V2002), ("rtR", None)],
                  None, None, None),
    "ZeroCellID": ("T", [("rtT", None)], None, V2002, None),
    "OverUnder": ("U", [("rtU", None)], (62, 71, 72, 80), V2002, None),
    "ZipPlus4": ("Z", [("rtZ", None)], None, None, None),
}

_LAYER_ORDER = ["CompleteChain", "AltName", "FeatureIds", "ZipCodes",
                "Landmarks", "AreaLandmarks", "KeyFeatures", "Polygon",
                "PolygonCorrections", "EntityNames", "PolygonEconomic",
                "IDHistory", "PolyChainLink", "SpatialMetadata", "PIP",
                "TLIDRange", "ZeroCellID", "OverUnder", "ZipPlus4"]


class TigerDataSource:
    """Module list + version for a TIGER directory or .RT1 path."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            self.dir = path
            names = sorted(os.listdir(path))
        else:
            self.dir = os.path.dirname(path) or "."
            names = [os.path.basename(path)]
        self.modules = []          # basenames without extension
        self.ext_case = {}         # module -> actual ".RT1" extension case
        for n in names:
            base, ext = os.path.splitext(n)
            if ext.lower() == ".rt1":
                self.modules.append(base)
                self.ext_case[base] = ext[:-1]  # ".RT" / ".rt"
        if not self.modules:
            raise ValueError(f"{path}: no TIGER/Line *.RT1 modules found")
        first = os.path.join(self.dir,
                             self.modules[0] + self.ext_case[self.modules[0]] + "1")
        with open(first, "rb") as f:
            head = f.read(4096)
        # GDT-reprocessed files carry a copyright line first
        # (ogrtigerdatasource.cpp:426-438)
        if head.startswith(b"Copyright (C)") and b"Geographic Data Tech" in head:
            head = head.split(b"\n", 1)[1].lstrip(b"\r\n")
        if not head[:1] == b"1" or not head[1:5].strip().isdigit():
            raise ValueError(f"{first}: not a TIGER/Line RT1 file")
        self.version_code = int(head[1:5])
        self.version = classify_version(self.version_code)
        if self.version < 0:
            raise ValueError(
                f"{first}: unrecognized TIGER version code "
                f"{self.version_code:04d}")

    def files(self, code: str) -> list[tuple[str, str]]:
        """(module, path) pairs for one record-type file code, keeping
        only the files that exist."""
        out = []
        for m in self.modules:
            p = os.path.join(self.dir, m + self.ext_case[m] + code)
            if os.path.exists(p):
                out.append((m, p))
            else:
                # extension case can differ per file on unix
                alt = os.path.join(self.dir, m + ".rt" + code.lower())
                if os.path.exists(alt):
                    out.append((m, alt))
        return out

    def layers(self) -> list[str]:
        out = []
        for name in _LAYER_ORDER:
            if name == "CompleteChain" or name == "Polygon":
                out.append(name)
                continue
            _, _, _, vmin, vmax = _LAYERS[name]
            if vmin is not None and self.version < vmin:
                continue
            if vmax is not None and self.version >= vmax:
                continue
            out.append(name)
        return out

    def pick(self, choices) -> str:
        for key, vmin in choices:
            if vmin is None or self.version >= vmin:
                return key
        return choices[-1][0]


def _module_col() -> Column:
    """Module name from the input file path (basename minus .RTx)."""
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return F.regexp_replace(base, r"\.[Rr][Tt].?$", "")


def _lines(spark: SparkSession, files: list[tuple[str, str]],
           rectype: str) -> DataFrame:
    df = spark.read.text([p for _, p in files])
    # keep only records of the expected type: drops GDT copyright
    # headers and stray blank lines (first char of every TIGER record
    # is its record type code)
    return (df.filter(F.substring("value", 1, 1) == rectype)
            .select(F.col("value").alias("_rec"),
                    _module_col().alias("MODULE")))


def _apply_fields(df: DataFrame, info_key: str,
                  skip: set[str] = frozenset(),
                  keep_module: bool = True,
                  extra: list = ()) -> tuple[DataFrame, list[str]]:
    """Project the fixed-width columns of one record table.

    Follows the reference flag semantics: a column is emitted when its
    bSet flag is on (tigerfilebase.cpp SetFields); MODULE (define-only)
    is the module name the layer injects. Fields with set=0 (e.g. the
    RTS duplicates of RTA-owned columns in 2002+, or write-only TLID in
    RT3) are not read."""
    arr, _reclen = TS.RECORD_INFOS[info_key]
    cols, names = [], []
    for (name, fmt, ftype, ogr, beg, end, ln, define, bset, _w) in arr:
        if name in skip:
            continue
        if name == "MODULE" and define:
            if keep_module:
                names.append("MODULE")
            continue
        if ogr == "IntegerList":     # RT4 FEAT — handled by the caller
            continue
        if not bset:
            continue
        raw = F.rtrim(F.substring(F.col("_rec"), beg, end - beg + 1))
        val = F.when(raw == "", None).otherwise(raw)
        if ogr in ("Integer", "Integer64"):
            val = F.trim(val).try_cast("long" if ogr == "Integer64" else "int")
        elif ogr == "Real":
            val = F.trim(val).try_cast("double")
        cols.append(val.alias(name))
        names.append(name)
    keep = (["MODULE"] if keep_module and "MODULE" in names else [])
    ex = [c.alias(n) for n, c in extra if n not in names]
    out = df.select(*[F.col(c) for c in keep], *ex, *cols)
    return out, names + [n for n, _ in extra if n not in names]


def _micro_point(rec: Column, x0: int, x1: int, y0: int, y1: int):
    lon = F.trim(F.substring(rec, x0, x1 - x0 + 1)).try_cast("long")
    lat = F.trim(F.substring(rec, y0, y1 - y0 + 1)).try_cast("long")
    return (F.coalesce(lon, F.lit(0)) / 1e6).alias("_x"), \
           (F.coalesce(lat, F.lit(0)) / 1e6).alias("_y")


_POINT_WKB_UDF = None


def _point_wkb(xcol, ycol) -> Column:
    global _POINT_WKB_UDF
    if _POINT_WKB_UDF is None:
        @F.pandas_udf("binary")
        def pack(x: pd.Series, y: pd.Series) -> pd.Series:
            out = []
            for xv, yv in zip(x, y):
                if xv == 0.0 and yv == 0.0:   # tigerpoint.cpp: no geometry
                    out.append(None)
                else:
                    out.append(b"\x01\x01\x00\x00\x00"
                               + struct.pack("<2d", xv, yv))
            return pd.Series(out)
        _POINT_WKB_UDF = pack
    return _POINT_WKB_UDF(xcol, ycol)


_LINE_WKB_UDF = None


def _line_wkb(points: Column) -> Column:
    """array<struct<x,y>> -> WKB LINESTRING (Arrow-batched)."""
    global _LINE_WKB_UDF
    if _LINE_WKB_UDF is None:
        from gdal_spark.functions.geometry import encode_linestring

        @F.pandas_udf("binary")
        def pack(pts: pd.Series) -> pd.Series:
            out = []
            for arr in pts:
                coords = np.array([(p["x"], p["y"]) for p in arr],
                                  dtype="f8")
                out.append(encode_linestring(coords))
            return pd.Series(out)
        _LINE_WKB_UDF = pack
    return _LINE_WKB_UDF(points)


def _complete_chain(spark: SparkSession, ds: TigerDataSource) -> DataFrame:
    rt1_key = "rt1_2002" if ds.version >= V2002 else "rt1"
    rt3_key = ("rt3_2000_Redistricting"
               if ds.version >= V2000_REDIST else "rt3")
    rt1 = _lines(spark, ds.files("1"), "1")
    rt1 = rt1.withColumn("_sx", F.trim(F.substring("_rec", 191, 10)).try_cast("long")) \
             .withColumn("_sy", F.trim(F.substring("_rec", 201, 9)).try_cast("long")) \
             .withColumn("_ex", F.trim(F.substring("_rec", 210, 10)).try_cast("long")) \
             .withColumn("_ey", F.trim(F.substring("_rec", 220, 9)).try_cast("long"))
    # single projection carrying both attributes and geometry inputs
    arr, _ = TS.RECORD_INFOS[rt1_key]
    cols = [F.trim(F.substring("_rec", 6, 10)).try_cast("int").alias("_tlid"),
            "_sx", "_sy", "_ex", "_ey", F.col("MODULE")]
    names = ["MODULE"]
    for (name, fmt, ftype, ogr, beg, end, ln, define, bset, _w) in arr:
        if not define or name == "MODULE":
            continue
        raw = F.rtrim(F.substring(F.col("_rec"), beg, end - beg + 1))
        val = F.when(raw == "", None).otherwise(raw)
        if ogr in ("Integer", "Integer64"):
            val = F.trim(val).try_cast("long" if ogr == "Integer64" else "int")
        cols.append(val.alias(name))
        names.append(name)
    df1 = rt1.select(*cols)

    # RT3 attributes join on TLID (reference reads record-aligned; the
    # files are TLID-keyed and sorted identically, so the key join is
    # the distributed equivalent)
    f3 = ds.files("3")
    if f3:
        rt3 = _lines(spark, f3, "3")
        a3, _ = TS.RECORD_INFOS[rt3_key]
        c3 = [F.trim(F.substring("_rec", 6, 10)).try_cast("int").alias("_tlid")]
        for (name, fmt, ftype, ogr, beg, end, ln, define, bset, _w) in a3:
            if not define or name in ("MODULE", "TLID"):
                continue
            raw = F.rtrim(F.substring(F.col("_rec"), beg, end - beg + 1))
            val = F.when(raw == "", None).otherwise(raw)
            if ogr in ("Integer", "Integer64"):
                val = F.trim(val).try_cast("long" if ogr == "Integer64"
                                       else "int")
            c3.append(val.alias(name))
            names.append(name)
        df1 = df1.join(rt3.select(*c3), "_tlid", "left")

    # RT2 shape points: explode the ten 19-char vertex slots
    f2 = ds.files("2")
    if f2:
        rt2 = _lines(spark, f2, "2")
        slots = F.array(*[
            F.struct(
                F.trim(F.substring("_rec", 16, 3)).try_cast("int").alias("rtsq"),
                F.lit(i).alias("slot"),
                F.trim(F.substring("_rec", 19 + 19 * i, 10)).try_cast("long")
                .alias("xi"),
                F.trim(F.substring("_rec", 29 + 19 * i, 9)).try_cast("long")
                .alias("yi"))
            for i in range(10)])
        pts = (rt2.select(
                   F.trim(F.substring("_rec", 6, 10)).cast("int")
                   .alias("_tlid"),
                   F.explode(slots).alias("p"))
               .filter((F.col("p.xi") != 0) | (F.col("p.yi") != 0)))
        mids = (pts.groupBy("_tlid")
                .agg(F.sort_array(F.collect_list("p")).alias("ps"))
                .select("_tlid",
                        F.transform(
                            "ps", lambda p: F.struct(
                                (p["xi"] / 1e6).alias("x"),
                                (p["yi"] / 1e6).alias("y"))).alias("mids")))
        df1 = df1.join(mids, "_tlid", "left")
    else:
        df1 = df1.withColumn(
            "mids", F.lit(None).cast("array<struct<x:double,y:double>>"))

    pts_all = F.concat(
        F.array(F.struct((F.col("_sx") / 1e6).alias("x"),
                         (F.col("_sy") / 1e6).alias("y"))),
        F.coalesce(F.col("mids"),
                   F.expr("CAST(array() AS array<struct<x:double,y:double>>)")),
        F.array(F.struct((F.col("_ex") / 1e6).alias("x"),
                         (F.col("_ey") / 1e6).alias("y"))))
    return df1.select(*names, _line_wkb(pts_all).alias("geometry"))


def _polygon(spark: SparkSession, ds: TigerDataSource) -> DataFrame:
    if ds.version >= V2004:
        a_key = "rtA_2004"
    elif ds.version >= V2003:
        a_key = "rtA_2003"
    elif ds.version >= V2002:
        a_key = "rtA_2002"
    else:
        a_key = "rtA"
    if ds.version >= V2002:
        s_key = "rtS_2002"
    elif ds.version >= V2000_REDIST:
        s_key = "rtS_2000_Redistricting"
    else:
        s_key = "rtS"
    def _posof(key, name):
        for f in TS.RECORD_INFOS[key][0]:
            if f[0] == name:
                return f[4], f[5]
        return None

    def _key_cols(key):
        k, p = _posof(key, "CENID"), _posof(key, "POLYID")
        if k is None or p is None:
            return []
        return [("CENID",
                 F.rtrim(F.substring(F.col("_rec"), k[0], k[1] - k[0] + 1))),
                ("POLYID",
                 F.trim(F.substring(F.col("_rec"), p[0], p[1] - p[0] + 1))
                 .try_cast("int"))]

    # reference merges the record-aligned RTS row (tigerpolygon.cpp
    # GetFeature): SetFields(RTA) then SetFields(RTS) — the RTS tables'
    # set flags already restrict to the columns RTA does not own in that
    # version, and a non-empty RTS value overwrites a same-named field.
    # CENID+POLYID (present in both record layouts) is the join key;
    # extracted positionally since their set flag can be off.
    rta = _lines(spark, ds.files("A"), "A")
    dfa, names_a = _apply_fields(rta, a_key, extra=_key_cols(a_key))
    fs = ds.files("S")
    if not fs:
        return dfa
    rts = _lines(spark, fs, "S")
    dfs, names_s = _apply_fields(rts, s_key, keep_module=False,
                                 extra=_key_cols(s_key))
    if "CENID" not in dfs.columns or "POLYID" not in dfs.columns \
            or "CENID" not in dfa.columns:
        return dfa
    dup = [c for c in names_s if c in set(names_a)
           and c not in ("CENID", "POLYID")]
    ren = dfs
    for c in dup:
        ren = ren.withColumnRenamed(c, f"_s_{c}")
    merged = dfa.join(ren, ["CENID", "POLYID"], "left")
    out_cols = []
    for c in merged.columns:
        if c.startswith("_s_"):
            continue
        if c in dup:
            out_cols.append(F.coalesce(F.col(f"_s_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return merged.select(*out_cols)


def _alt_name(spark: SparkSession, ds: TigerDataSource) -> DataFrame:
    rt4 = _lines(spark, ds.files("4"), "4")
    feats = F.filter(
        F.array(*[F.trim(F.substring(rt4["_rec"], 19 + i * 8, 8))
                  for i in range(5)]),
        lambda s: s != "")
    df4 = rt4.select(
        "MODULE",
        F.trim(F.substring("_rec", 6, 10)).try_cast("int").alias("TLID"),
        F.trim(F.substring("_rec", 16, 3)).try_cast("int").alias("RTSQ"),
        F.transform(feats, lambda s: s.try_cast("int")).alias("FEAT"))
    return df4


def read_tiger(spark: SparkSession, path: str,
               layer: str = "CompleteChain") -> DataFrame:
    """Read one TIGER/Line layer as a DataFrame. Attribute columns
    follow the reference's per-version field tables; geometry (where
    the layer has one) is a WKB binary column named ``geometry``."""
    ds = TigerDataSource(path)
    if layer == "CompleteChain":
        return _complete_chain(spark, ds)
    if layer == "Polygon":
        return _polygon(spark, ds)
    if layer == "AltName":
        return _alt_name(spark, ds)
    if layer not in _LAYERS:
        raise ValueError(f"unknown TIGER layer {layer!r}; "
                         f"expected one of {_LAYER_ORDER}")
    code, choices, point, vmin, vmax = _LAYERS[layer]
    if vmin is not None and ds.version < vmin:
        raise ValueError(f"layer {layer} requires version >= "
                         f"{_VERSION_NAMES[vmin]}")
    if vmax is not None and ds.version >= vmax:
        raise ValueError(f"layer {layer} absent from version "
                         f"{_VERSION_NAMES[ds.version]}")
    key = ds.pick(choices)
    recs = _lines(spark, ds.files(code), code)
    df, names = _apply_fields(recs, key)
    if point is not None:
        x0, x1, y0, y1 = point
        xy = recs.select(
            "_rec", "MODULE",
            *_micro_point(F.col("_rec"), x0, x1, y0, y1))
        arr, _ = TS.RECORD_INFOS[key]
        cols = [F.col("MODULE"), F.col("_x"), F.col("_y")]
        for (name, fmt, ftype, ogr, beg, end, ln, define, bset, _w) in arr:
            if not define or name == "MODULE":
                continue
            raw = F.rtrim(F.substring(F.col("_rec"), beg, end - beg + 1))
            val = F.when(raw == "", None).otherwise(raw)
            if ogr in ("Integer", "Integer64"):
                val = F.trim(val).try_cast("long" if ogr == "Integer64"
                                       else "int")
            cols.append(val.alias(name))
        df = xy.select(*cols)
        df = df.withColumn("geometry", _point_wkb(F.col("_x"), F.col("_y"))) \
               .drop("_x", "_y")
    return df


def tiger_layers(path: str) -> list[str]:
    return TigerDataSource(path).layers()


def tiger_version(path: str) -> str:
    ds = TigerDataSource(path)
    return _VERSION_NAMES[ds.version]
