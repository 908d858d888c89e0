"""OGR SQL dialect semantic shims over Spark SQL.

The engine's query surface is Spark SQL (a superset of the reference's
swq dialect, SURVEY.md §3.1); these helpers reproduce the reference
semantics the autotest fixtures actually assert:

- **case-insensitive string comparison** for ``=``, ``<>``, ``IN``,
  ``LIKE`` (gdal/ogr/swq_op_general.cpp:42-100 — tolower both sides;
  ``<, >, <=, >=`` stay case-sensitive, gdal/ogr/ogr_sql.dox:263,320).
- **SUBSTR** 1-based with negative offset-from-end (ogr_sql.dox:141-155).
- **special fields** (gdal/ogr/ogr_p.h:110-115, semantics
  ogr_sql.dox:485-550): ``FID``, ``OGR_GEOMETRY`` (type name),
  ``OGR_GEOM_WKT``, ``OGR_GEOM_AREA`` — computed from the WKB column via
  Arrow-batched pandas UDFs.
- **first-match LEFT JOIN** (ogr_gensql.cpp:1283-1314): each left row
  keeps only the first matching right row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G


def ci_eq(a: Column, b: Column) -> Column:
    """Case-insensitive string equality (swq '=' on strings)."""
    return F.lower(a) == F.lower(b)


def ci_ne(a: Column, b: Column) -> Column:
    return F.lower(a) != F.lower(b)


def ci_in(col: Column, values: list[str]) -> Column:
    return F.lower(col).isin([v.lower() for v in values])


def ci_like(col: Column, pattern: str, escape: str | None = None) -> Column:
    """Case-insensitive LIKE with optional ESCAPE (swq_op_general.cpp:42).

    The pattern is lowercased character-wise EXCEPT occurrences of the
    escape character itself — blanket ``pattern.lower()`` would turn an
    uppercase escape char (e.g. 'X' in ``'100X%' ESCAPE 'X'``) into a
    different character, silently re-activating the escaped wildcard."""
    if escape:
        # swq's Like treats escape-char + ANY char as that literal char
        # (swq_op_general.cpp:42). Spark only allows escaping %/_/the
        # escape char itself, so escapes of ordinary chars are folded to
        # the bare literal here.
        out = []
        i = 0
        while i < len(pattern):
            ch = pattern[i]
            if ch == escape and i + 1 < len(pattern):
                nxt = pattern[i + 1]
                if nxt in ("%", "_", escape):
                    out.append(escape)
                    out.append(nxt.lower())
                else:
                    out.append(nxt.lower())
                i += 2
            else:
                out.append(ch.lower())
                i += 1
        return F.like(F.lower(col), F.lit("".join(out)), F.lit(escape))
    return F.lower(col).like(pattern.lower())


def ogr_substr(col: Column, start: int, length: int | None = None) -> Column:
    """SUBSTR(s, start[, len]): 1-based; negative start counts from the end
    (ogr_sql.dox:141-155) — Spark's substring has identical semantics."""
    if length is None:
        return F.substring(col, start, 2147483647)
    return F.substring(col, start, length)


def _hs_check_end(s: str, i: int, is_key: bool) -> int | None:
    """OGRHStoreCheckEnd (gdal/ogr/swq_op_general.cpp:110): after a
    quoted token only spaces may precede the separator."""
    i += 1
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == " ":
            i += 1
            continue
        if is_key:
            return i + 2 if ch == "=" and s[i:i + 2] == "=>" else None
        return i + 1 if ch == "," else None
    return i


def _hs_next_string(s: str, i: int, is_key: bool):
    """OGRHStoreGetNextString (swq_op_general.cpp:137): one key or value
    token — unquoted (terminated by space/separator) or double-quoted
    with backslash escapes. Returns (token, next_index) or None."""
    in_string = False
    started = False
    buf: list[str] = []
    start = i
    n = len(s)
    while i < n:
        ch = s[i]
        if in_string:
            if ch == '"':
                nxt = _hs_check_end(s, i, is_key)
                return None if nxt is None else ("".join(buf), nxt)
            if ch == "\\":
                i += 1
                if i >= n:
                    return None
                ch = s[i]
            buf.append(ch)
        else:
            if ch == " ":
                if started:
                    nxt = _hs_check_end(s, i, is_key)
                    return None if nxt is None else (s[start:i], nxt)
            elif is_key and ch == "=" and s[i:i + 2] == "=>":
                if started:
                    return s[start:i], i + 2
            elif not is_key and ch == ",":
                if started:
                    return s[start:i], i + 1
            elif ch == '"':
                started = in_string = True
                buf = []
            elif not started:
                started = True
                start = i
        i += 1
    if not in_string and started:
        return s[start:i], i
    return None


def py_hstore_get_value(hstore, key):
    """OGRHStoreGetValue (swq_op_general.cpp:240): scan key=>value pairs
    left to right, None for any syntax violation or a missing key."""
    if hstore is None or key is None:
        return None
    s, i = str(hstore), 0
    while True:
        r = _hs_next_string(s, i, True)
        if r is None:
            return None
        k, i = r
        if i >= len(s):  # key with no value
            return None
        r = _hs_next_string(s, i, False)
        if r is None:
            return None
        v, i = r
        if k == key:
            return v
        if i >= len(s):
            return None


def hstore_get_value(col: Column, key) -> Column:
    """HSTORE_GET_VALUE(hstore, key)
    (gdal/ogr/swq_op_registrar.cpp:52-59, OGRHStoreGetValue
    swq_op_general.cpp:240): full reference tokenizer — quoted keys and
    values, backslash escapes, strict separator checking — as an
    Arrow-batched pandas UDF (the state machine is not expressible as
    column math; this is a scalar helper, not a hot-path operator)."""
    key_col = key if isinstance(key, Column) else F.lit(key)

    @F.pandas_udf("string")
    def fn(s: pd.Series, k: pd.Series) -> pd.Series:
        return pd.Series([py_hstore_get_value(a, b)
                          for a, b in zip(s, k)], dtype=object)

    return fn(col, key_col)


# ---------------------------------------------------------------------------
# special fields (WKB-derived, Arrow-batched)
# ---------------------------------------------------------------------------

_TYPE_NAMES = {G.WKB_POINT: "POINT", G.WKB_LINESTRING: "LINESTRING",
               G.WKB_POLYGON: "POLYGON", G.WKB_MULTIPOINT: "MULTIPOINT",
               G.WKB_MULTILINESTRING: "MULTILINESTRING",
               G.WKB_MULTIPOLYGON: "MULTIPOLYGON"}


def _geom_area_fn(wkb: pd.Series) -> pd.Series:
    out = np.zeros(len(wkb))
    for i, b in enumerate(wkb):
        if b is None:
            continue
        bb = bytes(b)
        gtype = bb[1] if bb[0] == 1 else bb[4]
        if gtype in (G.WKB_POLYGON, G.WKB_MULTIPOLYGON):
            out[i] = G.polygon_area(bb)
    return pd.Series(out)


def _geometry_fn(wkb: pd.Series) -> pd.Series:
    out = []
    for b in wkb:
        if b is None:
            out.append(None)
            continue
        bb = bytes(b)
        gtype = bb[1] if bb[0] == 1 else bb[4]
        out.append(_TYPE_NAMES.get(gtype, f"UNKNOWN_{gtype}"))
    return pd.Series(out)


def _geom_wkt_fn(wkb: pd.Series) -> pd.Series:
    out = []
    for b in wkb:
        if b is None:
            out.append(None)
            continue
        try:
            out.append(G.wkt_from_wkb(bytes(b)))
        except ValueError:
            out.append(None)
    return pd.Series(out)


def ogr_geom_area(col: Column) -> Column:
    """OGR_GEOM_AREA special field (ogr_sql.dox:540: polygon/multipolygon
    area, else 0). UDF is built at call time — pandas_udf return-type
    parsing needs an active SparkSession."""
    return F.pandas_udf(_geom_area_fn, "double")(col)


def ogr_geometry(col: Column) -> Column:
    """OGR_GEOMETRY special field: geometry type name (ogr_sql.dox:497)."""
    return F.pandas_udf(_geometry_fn, "string")(col)


def ogr_geom_wkt(col: Column) -> Column:
    """OGR_GEOM_WKT for the Point/Polygon subset (fixture needs)."""
    return F.pandas_udf(_geom_wkt_fn, "string")(col)


def ogr_style(style_col: Column | None = None) -> Column:
    """OGR_STYLE special field (ogr_sql.dox:497): the feature's style
    string (OGRFeature::GetStyleString). Layers that carry no style info —
    every layer this engine synthesizes — yield NULL, exactly what the
    reference returns for plain features; pass a style column to surface
    stored styles."""
    return style_col if style_col is not None else F.lit(None).cast("string")


def _geom_length_fn(wkb: pd.Series) -> pd.Series:
    out = np.zeros(len(wkb))
    for i, b in enumerate(wkb):
        if b is None:
            continue
        out[i] = G.geometry_length(bytes(b))
    return pd.Series(out)


def ogr_geom_length(col: Column) -> Column:
    """get_Length measure for curve geometries (OGRCurve::get_Length,
    gdal/ogr/ogrlinestring.cpp) — 0 for points/polygons, matching the
    reference's curve-only definition."""
    return F.pandas_udf(_geom_length_fn, "double")(col)


# ---------------------------------------------------------------------------
# join shim
# ---------------------------------------------------------------------------

def left_join_first(left: DataFrame, right: DataFrame, on,
                    order_by: list[str]) -> DataFrame:
    """OGR SQL LEFT JOIN: first matching right row only
    (ogr_gensql.cpp:1283-1314), determinized by ``order_by`` on the right."""
    from pyspark.sql import Window
    key_cols = on if isinstance(on, list) else [on]
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    first = (right.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1).drop("_rn"))
    return left.join(first, on=on, how="left")
