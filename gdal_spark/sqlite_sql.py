"""SQLite-dialect SQL-string surface (ExecuteSQL(..., dialect='SQLite')).

Reference semantics: gdal/ogr/ogrsqliteexecutesql.cpp runs the
statement in a real SQLite instance with the layers attached as virtual
tables and the SpatiaLite-style functions registered
(gdal/ogr/ogrsqlitesqlfunctions.cpp); autotest/ogr/ogr_sql_sqlite.py is
the behavior contract. The Spark-first equivalent keeps the layers as
DataFrames in a mutable store, routes INSERT/UPDATE/DELETE through
DataFrame transformations, and hands SELECT text to ``spark.sql`` over
temp views after dialect rewrites:

- ``ROWID`` is the feature id pseudo-column (a real ``rowid`` view
  column here); ``OGR_STYLE`` is the style-string column; the geometry
  column is addressable as ``GEOMETRY`` (ogrsqliteexecutesql.cpp layer
  binding).
- blob literals ``x'00FF'`` map to Spark's ``X'00FF'``.
- OGR list-field literals ``'(2:2,3)'`` decode to arrays on INSERT
  (the dialect's OGRField list encoding).
- the ST_* scalar surface registers as session functions (Arrow
  batched), so any text query can call them — ST_Area, ST_Buffer,
  ST_Centroid, ST_X/ST_Y, ST_AsText/ST_GeomFromText, ST_SRID, the
  8 relate predicates.

Scale note: SELECT text plans through Catalyst unchanged — views are
the live DataFrames, so filters/joins in dialect queries get the same
pushdown as native queries. Only the geometry scalars cross the Arrow
boundary. INSERT appends a 1-row frame via union (metadata-scale — the
dialect's write path is for corrections, not bulk loads; bulk writes go
through the engine sinks).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G

_ST_REGISTERED = set()


def register_st_functions(spark: SparkSession) -> list[str]:
    """SpatiaLite-style scalar functions for spark.sql text
    (ogrsqlitesqlfunctions.cpp surface, Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    from gdal_spark.functions import clipping as CL
    from gdal_spark.functions import st as ST

    def _u(name, fn, rtype):
        spark.udf.register(name, pandas_udf(fn, rtype))

    def series(fn, dtype=object):
        def wrap(s: pd.Series) -> pd.Series:
            return pd.Series([None if b is None else fn(bytes(b))
                              for b in s], dtype=dtype)
        return wrap

    _u("ST_AsText", series(G.wkt_from_wkb), "string")
    _u("ST_Area", series(G.polygon_area, "float64"), "double")
    _u("ST_Length", series(G.geometry_length, "float64"), "double")
    _u("ST_X", series(lambda b: G.decode_point(b)[0], "float64"), "double")
    _u("ST_Y", series(lambda b: G.decode_point(b)[1], "float64"), "double")

    def geom_from_text(s: pd.Series) -> pd.Series:
        return pd.Series([None if t is None else G.wkb_from_wkt(t)
                          for t in s], dtype=object)
    _u("ST_GeomFromText", geom_from_text, "binary")

    def centroid(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            if b is None:
                out.append(None)
            else:
                cx, cy = G.polygon_centroid(bytes(b))
                out.append(G.encode_point(cx, cy))
        return pd.Series(out, dtype=object)
    _u("ST_Centroid", centroid, "binary")

    def buffer(s: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None else CL.wkb_buffer(bytes(b), float(dd))
             for b, dd in zip(s, d)], dtype=object)
    _u("ST_Buffer", buffer, "binary")

    names = ["ST_AsText", "ST_Area", "ST_Length", "ST_X", "ST_Y",
             "ST_GeomFromText", "ST_Centroid", "ST_Buffer"]
    for pred in ("Intersects", "Disjoint", "Touches", "Within",
                 "Contains", "Overlaps", "Equals", "Crosses"):
        fn = getattr(ST, f"st_{pred.lower()}")

        def mk(f):
            def wrap(a: pd.Series, b: pd.Series) -> pd.Series:
                return pd.Series(
                    [None if (x is None or y is None)
                     else bool(f(bytes(x), bytes(y)))
                     for x, y in zip(a, b)], dtype=object)
            return wrap
        _u(f"ST_{pred}", mk(fn), "boolean")
        names.append(f"ST_{pred}")
    return names


_LIST_RE = re.compile(r"^\((\d+):(.*)\)$", re.S)


def _decode_literal(tok: str, dtype: str):
    """One VALUES literal -> python value for the given Spark type."""
    tok = tok.strip()
    if tok.upper() == "NULL":
        return None
    if tok.startswith("x'") or tok.startswith("X'"):
        return bytes.fromhex(tok[2:-1])
    if tok.startswith("'"):
        s = tok[1:-1].replace("''", "'")
        if dtype.startswith("array"):
            m = _LIST_RE.match(s)
            if m:                       # OGR list encoding '(n:a,b,...)'
                items = m.group(2).split(",") if m.group(2) else []
                if "int" in dtype or "bigint" in dtype:
                    return [int(v) for v in items]
                if "double" in dtype or "float" in dtype:
                    return [float(v) for v in items]
                return [v for v in items]
            return [s]
        return s
    if dtype == "boolean":
        return bool(int(float(tok)))
    if dtype in ("int", "bigint", "long"):
        return int(float(tok))
    if dtype in ("double", "float"):
        return float(tok)
    try:
        return int(tok)
    except ValueError:
        return float(tok)


def _split_commas(s: str) -> list[str]:
    out, depth, quote, cur = [], 0, False, []
    for ch in s:
        if ch == "'" :
            quote = not quote
        if not quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


class SQLiteDialectEngine:
    """Mutable layer store + statement router for the SQLite dialect."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.layers: dict[str, DataFrame] = {}
        self.srs: dict[str, str | None] = {}
        register_st_functions(spark)
        from gdal_spark.functions.registry import register_dialect_functions
        register_dialect_functions(spark)

    # ---------------- layer management --------------------------------

    def create_layer(self, name: str, schema: str,
                     srs: str | None = None,
                     kinds: dict[str, str] | None = None) -> None:
        """schema: Spark DDL for the attribute columns; rowid, geometry
        (binary) and ogr_style columns are added automatically.
        ``kinds``: optional per-column OGR field kind ('date', 'time',
        'datetime') for the dialect's literal normalization
        ('2012-08-23 21:24' -> '2012/08/23 21:24:00', ogr_sql_sqlite_1
        expectations)."""
        full = "rowid bigint, " + schema + \
            ", geometry binary, ogr_style string"
        self.layers[name] = self.spark.createDataFrame([], full)
        self.srs[name] = srs
        self.kinds = getattr(self, "kinds", {})
        self.kinds[name] = kinds or {}

    @staticmethod
    def _normalize_kind(kind: str, v):
        if v is None or not isinstance(v, str):
            return v
        if kind == "date":
            return v.replace("-", "/")
        if kind == "time":
            return v + ":00" if v.count(":") == 1 else v
        if kind == "datetime":
            d, _, t = v.partition(" ")
            t = t + ":00" if t.count(":") == 1 else t
            return d.replace("-", "/") + " " + t
        return v

    def insert_rows(self, name: str, rows: list[dict]) -> None:
        df = self.layers[name]
        start = df.agg(F.coalesce(F.max("rowid") + 1, F.lit(0))) \
                  .first()[0]
        data = []
        for i, r in enumerate(rows):
            vals = []
            for f in df.schema.fields:
                if f.name == "rowid" and "rowid" not in r:
                    vals.append(start + i)
                else:
                    vals.append(r.get(f.name))
            data.append(tuple(vals))
        self.layers[name] = df.unionByName(
            self.spark.createDataFrame(data, df.schema))

    def layer_srs(self, name: str) -> str | None:
        return self.srs.get(name)

    # ---------------- statement routing -------------------------------

    def _rewrite(self, sql: str) -> str:
        # apply identifier rewrites only OUTSIDE single-quoted strings
        # (SQLite: '...' = string, "..." = identifier -> backticks)
        parts = re.split(r"('(?:[^']|'')*')", sql)
        for i in range(0, len(parts), 2):
            p = parts[i]
            p = re.sub(r'"([^"]*)"', r"`\1`", p)
            p = re.sub(r"\bROWID\b", "rowid", p)
            p = re.sub(r"\bOGR_STYLE\b", "ogr_style", p)
            p = re.sub(r"\bGEOMETRY\b", "geometry", p)
            p = re.sub(r"\bx(?=')", "X", p)
            parts[i] = p
        return "".join(parts)

    def execute(self, sql: str) -> DataFrame | None:
        s = sql.strip()
        head = s.split(None, 1)[0].upper()
        if head == "INSERT":
            return self._insert(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "DELETE":
            return self._delete(s)
        # SELECT (or anything else Spark SQL can express)
        for name, df in self.layers.items():
            df.createOrReplaceTempView(name)
        return self.spark.sql(self._rewrite(s))

    def _insert(self, s: str) -> None:
        m = re.match(
            r'INSERT\s+INTO\s+"?(\w+)"?\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$',
            s, re.I | re.S)
        if not m:
            raise ValueError(f"unsupported INSERT form: {s!r}")
        name, cols, vals = m.group(1), m.group(2), m.group(3)
        df = self.layers[name]
        cols = [c.strip().strip('"') for c in cols.split(",")]
        cols = ["rowid" if c.upper() == "ROWID" else c for c in cols]
        toks = _split_commas(vals)
        if len(cols) != len(toks):
            raise ValueError("INSERT arity mismatch")
        types = {f.name.lower(): f.dataType.simpleString()
                 for f in df.schema.fields}
        kinds = getattr(self, "kinds", {}).get(name, {})
        row = {}
        for c, t in zip(cols, toks):
            key = next((f.name for f in df.schema.fields
                        if f.name.lower() == c.lower()), c)
            v = _decode_literal(t, types.get(c.lower(), "string"))
            if key in kinds:
                v = self._normalize_kind(kinds[key], v)
            row[key] = v
        self.insert_rows(name, [row])
        return None

    def _where_df(self, name: str, where: str | None) -> DataFrame:
        df = self.layers[name]
        if not where:
            return df
        return df.filter(F.expr(self._rewrite(where)))

    def _update(self, s: str) -> None:
        m = re.match(r'UPDATE\s+"?(\w+)"?\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$',
                     s, re.I | re.S)
        if not m:
            raise ValueError(f"unsupported UPDATE form: {s!r}")
        name, sets, where = m.group(1), m.group(2), m.group(3)
        df = self.layers[name]
        cond = F.expr(self._rewrite(where)) if where else F.lit(True)
        kinds = getattr(self, "kinds", {}).get(name, {})
        for assign in _split_commas(sets):
            col, val = assign.split("=", 1)
            col = col.strip().strip('"')
            key = next((f.name for f in df.schema.fields
                        if f.name.lower() == col.lower()), col)
            val = val.strip()
            dtype = dict((f.name, f.dataType.simpleString())
                         for f in df.schema.fields).get(key, "string")
            if key in kinds and val.startswith("'"):
                val_expr = F.lit(self._normalize_kind(
                    kinds[key], val[1:-1].replace("''", "'")))
            else:
                val_expr = F.expr(self._rewrite(val))
            df = df.withColumn(
                key, F.when(cond, val_expr.cast(dtype))
                .otherwise(F.col(key)))
        self.layers[name] = df
        return None

    def _delete(self, s: str) -> None:
        m = re.match(r'DELETE\s+FROM\s+"?(\w+)"?(?:\s+WHERE\s+(.*))?$',
                     s, re.I | re.S)
        if not m:
            raise ValueError(f"unsupported DELETE form: {s!r}")
        name, where = m.group(1), m.group(2)
        if where:
            self.layers[name] = self.layers[name].filter(
                ~F.coalesce(F.expr(self._rewrite(where)), F.lit(False)))
        else:
            self.layers[name] = self.layers[name].limit(0)
        return None
