"""ExecuteSQL: the reference's OGR SQL dialect, parsed and planned onto
Catalyst.

The reference's primary query entry point is
``GDALDataset::ExecuteSQL(sql)`` (gdal/gcore/gdaldataset.cpp:4884): DDL
statements are string-routed (``:4906-4971``), everything else goes
through the bison swq grammar (gdal/ogr/swq_parser.y) into a
``swq_select`` evaluated one feature at a time by OGRGenSQLResultsLayer
(gdal/ogr/ogrsf_frmts/generic/ogr_gensql.cpp). This module re-implements
that surface Spark-first: a recursive-descent parser over the same
grammar that emits **Catalyst Column trees** instead of an interpreter —
parsing happens once on the driver, execution is whole-stage-codegen'd
JVM work distributed over the cluster, and Catalyst supplies the
optimizations the reference lacks (pushdown, pruning, join strategy).

Reference semantics reproduced exactly (each cited at its shim):

- case-insensitive string ``=``, ``<>``, ``IN``, ``LIKE``/``ILIKE``
  (gdal/ogr/swq_op_general.cpp:42-100); ``<,>,<=,>=`` case-sensitive.
- numeric-field vs string-literal comparison uses atoi/atof leading-number
  promotion (SWQGeneralEvaluator int promotion; ``IN ('a165')`` matches
  nothing, ``IN ('165')`` matches 165).
- LEFT JOIN keeps only the FIRST matching secondary row
  (ogr_gensql.cpp:1283-1314), equi-predicates only
  (gdal/ogr/ogr_sql.dox:441).
- summary mode (no GROUP BY in the dialect): whole-table MIN/MAX/AVG/SUM/
  COUNT[(DISTINCT)] producing one row with fields named ``OP_field``
  (ogr_gensql.cpp:246, ``COUNT_*`` for COUNT(*)).
- special fields FID, OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA,
  OGR_STYLE (gdal/ogr/ogr_p.h:110-115, ogr_sql.dox:485-550).
- output field naming: alias > column name > ``table.field`` for
  qualified/joined refs > source column of CAST/CONCAT/SUBSTR/aggregate
  (swq_select.cpp:455-505); anonymous expressions become ``FIELD_n``
  (the reference leaves them unnamed — Spark requires a name).
- DDL routing: CREATE/DROP INDEX (attribute-index registry — the layout
  analog is bucketing/pruning, so the index is planning metadata),
  DROP TABLE, ALTER TABLE ADD/DROP/RENAME/ALTER COLUMN
  (gdaldataset.cpp:4096-4971).

Known deviations, documented: SELECT DISTINCT does not preserve
first-seen order (distributed distinct is unordered; the reference's
O(n²) list accumulator is ordered), and ``SELECT *`` expands to attribute
columns only — the carrier ``fid``/geometry columns are selected
explicitly (``FID``, ``OGR_GEOM_WKT``) as in the reference's
feature-id/geometry side channels.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gdal_spark.functions import ogr_sql as OS

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<str>'(?:[^'\\]|\\.|'')*')"
    r"|(?P<qid>\"(?:[^\"\\]|\\.|\"\")*\")"
    r"|(?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<op><>|!=|<=|>=|[=<>+\-*/%(),.])"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*)"
    r")")


def _lex(sql: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == pos:
            if sql[pos:].strip():
                raise ValueError(f"SQL lex error at: {sql[pos:pos + 20]!r}")
            break
        pos = m.end()
        if m.group("str") is not None:
            # swq lexer escapes (gdal/ogr/swq.cpp:110-116): \' and ''
            # unescape to '; a backslash before anything else is literal
            toks.append(("str", re.sub(r"\\'|''", "'",
                                       m.group("str")[1:-1])))
        elif m.group("qid") is not None:
            toks.append(("qid", re.sub(r'\\"|""', '"',
                                       m.group("qid")[1:-1])))
        elif m.group("num") is not None:
            toks.append(("num", m.group("num")))
        elif m.group("op") is not None:
            toks.append(("op", m.group("op")))
        else:
            toks.append(("id", m.group("id")))
    return toks


_NUM_RE = re.compile(r"^\s*[+-]?(\d+\.?\d*|\.\d+)")


def _leading_num(s: str) -> float:
    """atoi/atof promotion used by the swq evaluator when a string literal
    meets a numeric field: parse the leading number, else 0."""
    m = _NUM_RE.match(s)
    return float(m.group(0)) if m else 0.0


class _E(NamedTuple):
    """A typed expression: Catalyst column + dialect kind + literal value
    (None unless the node is a literal — drives IN/compare promotion)."""
    col: Column
    kind: str          # 'str' | 'num' | 'other'
    lit: object = None
    int_: bool = False  # integer-typed numeric (drives swq integer division)


_SPECIAL = {"FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA",
            "OGR_STYLE"}
_AGGS = {"MIN", "MAX", "AVG", "SUM", "COUNT"}
_FUNCS = {"CONCAT", "SUBSTR", "HSTORE_GET_VALUE"}


class _Table(NamedTuple):
    alias: str                 # resolution name (lowercase)
    out_prefix: str            # '' for primary, 'name.' for joined
    colmap: dict[str, str]     # lowercase field -> internal column name
    kinds: dict[str, str]      # internal column name -> kind
    geom: str | None           # internal geometry column
    attrs: list[tuple[str, str]]  # (output name, internal) for '*'


def _kind_of(dtype) -> str:
    from pyspark.sql import types as T
    if isinstance(dtype, T.StringType):
        return "str"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return "int"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "num"
    return "other"


class OGRSQLEngine:
    """The GDALDataset analog: named layers + ExecuteSQL + attribute-index
    registry. Layers are DataFrames with the engine's conventions
    (``fid`` long, geometry = WKB binary column)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.layers: dict[str, tuple[DataFrame, str | None]] = {}
        self.indexes: dict[str, set[str]] = {}

    def register(self, name: str, df: DataFrame,
                 geometry_col: str | None = "geometry") -> None:
        if geometry_col is not None and geometry_col not in df.columns:
            geometry_col = None
        self.layers[name.lower()] = (df, geometry_col)

    # -- DDL (gdaldataset.cpp:4906-4971 string routing) --------------------

    @staticmethod
    def _after(toks, word: str, skip: int = 1) -> str | None:
        """Value of the token ``skip`` positions after keyword ``word``."""
        for i, (k, v) in enumerate(toks):
            if k == "id" and v.upper() == word and i + skip < len(toks):
                return toks[i + skip][1]
        return None

    def _ddl(self, toks) -> bool | None:
        words = [v.upper() for k, v in toks if k == "id"]
        if words[:2] == ["CREATE", "INDEX"]:
            # CREATE INDEX ON <table> USING <field>  (:4096)
            tbl = self._after(toks, "ON").lower()
            self._layer(tbl)
            self.indexes.setdefault(tbl, set()).add(
                self._after(toks, "USING").lower())
            return True
        if words[:2] == ["DROP", "INDEX"]:
            # DROP INDEX ON <table> [USING <field>]  (:4204)
            tbl = self._after(toks, "ON").lower()
            fld = self._after(toks, "USING")
            if fld is not None:
                self.indexes.get(tbl, set()).discard(fld.lower())
            else:
                self.indexes.pop(tbl, None)
            return True
        if words[:2] == ["DROP", "TABLE"]:
            self.layers.pop(self._after(toks, "TABLE").lower(), None)  # :4329
            return True
        if words[:2] == ["ALTER", "TABLE"]:
            return self._alter(toks, words)
        return None

    def _alter(self, toks, words) -> bool:
        tbl = self._after(toks, "TABLE").lower()
        df, geom = self._layer(tbl)
        if "RENAME" in words:   # ALTER TABLE t RENAME COLUMN a TO b (:4448)
            a, b = self._after(toks, "COLUMN"), self._after(toks, "TO")
            self.layers[tbl] = (df.withColumnRenamed(a, b), geom)
        elif "DROP" in words:   # ALTER TABLE t DROP COLUMN a
            self.layers[tbl] = (df.drop(self._after(toks, "COLUMN")), geom)
        elif "ADD" in words:    # ALTER TABLE t ADD [COLUMN] a <type>
            col = (self._after(toks, "COLUMN")
                   if "COLUMN" in words else self._after(toks, "ADD"))
            typ = _spark_type(toks[-1][1])
            self.layers[tbl] = (df.withColumn(col, F.lit(None).cast(typ)),
                                geom)
        elif words.count("ALTER") > 1:  # ALTER TABLE t ALTER COLUMN a TYPE ty
            col, typ = self._after(toks, "COLUMN"), _spark_type(
                self._after(toks, "TYPE"))
            self.layers[tbl] = (df.withColumn(col, F.col(col).cast(typ)),
                                geom)
        else:
            raise ValueError("unsupported ALTER TABLE form")
        return True

    def _layer(self, name: str) -> tuple[DataFrame, str | None]:
        if name.lower() not in self.layers:
            raise ValueError(f"no such layer: {name}")
        return self.layers[name.lower()]

    # -- entry point --------------------------------------------------------

    def execute_sql(self, sql: str) -> DataFrame | None:
        toks = _lex(sql)
        if not toks:
            raise ValueError("empty statement")
        head = toks[0][1].upper() if toks[0][0] == "id" else ""
        if head in ("CREATE", "DROP", "ALTER"):
            self._ddl(toks)
            return None
        p = _Parser(self, toks)
        df = p.select_statement()
        # UNION ALL chain (swq poOtherSelect -> OGRUnionLayer,
        # gdaldataset.cpp:4991-5041)
        while p.kw("UNION", "ALL"):
            df = df.unionByName(p.select_statement())
        if p.peek()[0] != "end":
            raise ValueError(f"trailing tokens: {p.peek()}")
        return df


def execute_sql(spark: SparkSession, sql: str,
                layers: dict[str, DataFrame],
                geometry_col: str = "geometry") -> DataFrame | None:
    """One-shot convenience: register ``layers`` and execute one statement."""
    eng = OGRSQLEngine(spark)
    for name, df in layers.items():
        eng.register(name, df, geometry_col)
    return eng.execute_sql(sql)


def _spark_type(name: str, width: int = 0, prec: int = 0) -> str:
    n = name.upper()
    if n in ("CHARACTER", "STRING", "TEXT"):
        return "string"
    if n in ("INTEGER", "SMALLINT"):
        return "long"
    if n == "BOOLEAN":
        return "boolean"
    if n == "NUMERIC" and width > 0 and prec == 0:
        return "long"   # NUMERIC(w,0) is integral (swq_parser.y field_type)
    if n in ("FLOAT", "NUMERIC", "REAL", "DOUBLE"):
        return "double"
    if n == "BIGINT":
        return "long"
    if n in ("DATE", "TIMESTAMP", "TIME"):
        return "timestamp" if n == "TIMESTAMP" else n.lower()
    raise ValueError(f"unsupported CAST type {name}")


def attribute_filter(df: DataFrame, clause: str,
                     geometry_col: str = "geometry") -> Column:
    """``OGRLayer::SetAttributeFilter`` analog (ogrlayer.cpp:340): parse a
    dialect WHERE clause (ci string ops, atoi promotion, special fields)
    against one layer's schema and return the Catalyst predicate —
    compiled once, pushed through Catalyst like any filter."""
    p = _Parser.for_layer(df, geometry_col)
    p.t = _lex(clause)
    e = p.expr()
    if p.peek()[0] != "end":
        raise ValueError(f"trailing tokens in filter: {p.peek()}")
    return e.col


class _Parser:
    def __init__(self, engine: OGRSQLEngine, toks):
        self.eng = engine
        self.t = toks
        self.i = 0
        self.tables: list[_Table] = []
        self.joined: DataFrame | None = None
        self._anon = 0

    @classmethod
    def for_layer(cls, df: DataFrame, geometry_col: str | None) -> "_Parser":
        """Single-layer scope over the DataFrame's own column names (no
        internal renaming) — the SetAttributeFilter entry path."""
        p = cls.__new__(cls)
        p.eng = None
        p.t, p.i, p._anon = [], 0, 0
        colmap = {c.lower(): c for c in df.columns}
        kinds = {f.name: _kind_of(f.dataType) for f in df.schema.fields}
        geom = geometry_col if geometry_col in df.columns else None
        p.tables = [_Table("", "", colmap, kinds, geom, [])]
        p.joined = df
        return p

    # -- token helpers ------------------------------------------------------

    def peek(self, k: int = 0):
        j = self.i + k
        return self.t[j] if j < len(self.t) else ("end", "")

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def kw(self, *words) -> bool:
        save = self.i
        for w in words:
            k, v = self.peek()
            if k == "id" and v.upper() == w:
                self.i += 1
            else:
                self.i = save
                return False
        return True

    def expect_kw(self, *words):
        if not self.kw(*words):
            raise ValueError(f"expected {' '.join(words)}, got {self.peek()}")

    def accept_op(self, *ops) -> str | None:
        k, v = self.peek()
        if k == "op" and v in ops:
            self.i += 1
            return v
        return None

    def expect_op(self, op):
        if self.accept_op(op) is None:
            raise ValueError(f"expected {op!r}, got {self.peek()}")

    # -- FROM / JOIN --------------------------------------------------------

    def _table_name(self) -> str:
        k, v = self.next()
        # strict quoting: "test" is an identifier, 'test' is a string
        # literal and NOT accepted as a table name (ogr_sql_46; the swq
        # grammar's table_def takes SWQT_IDENTIFIER only)
        if k not in ("id", "qid"):
            raise ValueError(f"expected table name, got {(k, v)}")
        return v

    def _maybe_alias(self) -> str | None:
        k, v = self.peek()
        if k == "id" and v.upper() == "AS":   # FROM t AS alias (swq)
            self.i += 1
            return self.next()[1]
        if k in ("id", "qid") and (k == "qid" or v.upper() not in (
                "LEFT", "JOIN", "WHERE", "ORDER", "UNION", "ON")):
            self.i += 1
            return v
        return None

    def _add_table(self, name: str, alias: str | None, idx: int) -> _Table:
        df, geom = self.eng._layer(name)
        res_name = (alias or name).lower()
        prefix = "" if idx == 0 else (alias or name) + "."
        colmap, kinds, attrs = {}, {}, []
        internal_geom = None
        renamed = []
        for f_ in df.schema.fields:
            # internal names must be dot-free (F.col parses '.' as a
            # struct access); source names with dots (ogr_rfc28_41
            # 'a.b') are backtick-quoted for the initial rename
            internal = f"_t{idx}_" + f_.name.replace(".", "_DOT_")
            renamed.append(F.col(f"`{f_.name}`").alias(internal))
            colmap[f_.name.lower()] = internal
            kinds[internal] = _kind_of(f_.dataType)
            if f_.name == geom:
                internal_geom = internal
            elif f_.name.lower() != "fid":
                attrs.append((prefix + f_.name, internal))
        tbl = _Table(res_name, prefix, colmap, kinds, internal_geom, attrs)
        self.tables.append(tbl)
        rdf = df.select(*renamed)
        self.joined = rdf if self.joined is None else self.joined
        return tbl

    def _parse_from(self):
        name = self._table_name()
        alias = self._maybe_alias()
        self._add_table(name, alias, 0)
        while self.kw("LEFT", "JOIN") or self.kw("JOIN"):
            jname = self._table_name()
            jalias = self._maybe_alias()
            self.expect_kw("ON")
            jt = self._add_table(jname, jalias, len(self.tables))
            # equi predicates only (ogr_sql.dox:441), possibly several
            # ANDed together (ogr_join_22): qual.field = qual.field
            pairs = []
            while True:
                lhs = self._qualified_ref()
                self.expect_op("=")
                rhs = self._qualified_ref()
                # orient: the side referencing the joined table is the key
                if rhs[0] == jt.alias:
                    lref, rref = lhs, rhs
                elif lhs[0] == jt.alias:
                    lref, rref = rhs, lhs
                else:
                    raise ValueError(
                        f"Field {lhs[0]}.{lhs[1]} in JOIN clause does not "
                        "correspond to the primary table nor the joint "
                        "(secondary) table")
                pairs.append((lref, rref))
                if not self.kw("AND"):
                    break
            df, _g = self.eng._layer(jname)

            def _key(t: _Table, ref):
                try:
                    return t.colmap[ref[1].lower()]
                except KeyError:
                    raise ValueError(
                        f'"{ref[0] or t.alias}"."{ref[1]}" not recognised '
                        "as an available field") from None

            right_keys = [_key(jt, rref) for _, rref in pairs]
            order = jt.colmap.get("fid") or next(iter(jt.colmap.values()))
            # first-match semantics (ogr_gensql.cpp:1283-1314): one right
            # row per key value, lowest fid first
            ridx = len(self.tables) - 1
            right = df.select(
                *[F.col(f"`{c}`").alias(f"_t{ridx}_" + c.replace(".", "_DOT_"))
                  for c in df.columns])
            w = Window.partitionBy(*right_keys).orderBy(order)
            right_first = (right.withColumn("_rn", F.row_number().over(w))
                           .filter(F.col("_rn") == 1).drop("_rn"))
            cond = None
            for (lref, _), rkey in zip(pairs, right_keys):
                lt = self._table(lref[0])
                lkey = _key(lt, lref)
                lc, rc = F.col(lkey), F.col(rkey)
                # numeric vs string key: swq promotes the string with
                # atoi/atof (ogr_join_10/13/14) — non-numeric strings
                # match nothing, never error (ANSI cast would throw)
                lk, rk = lt.kinds.get(lkey), jt.kinds.get(rkey)
                if lk in ("int", "num") and rk == "str":
                    lc, rc = lc.cast("double"), rc.try_cast("double")
                elif lk == "str" and rk in ("int", "num"):
                    lc, rc = lc.try_cast("double"), rc.cast("double")
                c = lc == rc
                cond = c if cond is None else cond & c
            self.joined = self.joined.join(right_first, cond, "left")

    def _qualified_ref(self) -> tuple[str, str]:
        k, v = self.next()
        if k not in ("id", "qid"):
            raise ValueError(f"expected column ref, got {(k, v)}")
        if self.accept_op("."):
            k2, v2 = self.next()
            return (v.lower(), v2)
        return ("", v)

    def _table(self, alias: str) -> _Table:
        if not alias:
            return self.tables[0]
        for t in self.tables:
            if t.alias == alias.lower():
                return t
        raise ValueError(f"unknown table {alias!r}")

    # -- name resolution ----------------------------------------------------

    def _resolve(self, table: str, name: str) -> _E:
        up = name.upper()
        if up in _SPECIAL:
            t = self._table(table)
            if up == "FID":
                internal = t.colmap.get("fid")
                if internal is None:
                    raise ValueError("layer has no fid column")
                return _E(F.col(internal), "num")
            if up == "OGR_STYLE":
                # layers carrying a stored style column (MIF/MID reader)
                # surface it; everything else reads NULL, as the
                # reference does for unstyled features (ogr_sql_14)
                style = t.colmap.get("ogr_style")
                return _E(OS.ogr_style(F.col(style) if style else None),
                          "str")
            if t.geom is None:
                raise ValueError("layer has no geometry column")
            g = F.col(t.geom)
            if up == "OGR_GEOMETRY":
                return _E(OS.ogr_geometry(g), "str")
            if up == "OGR_GEOM_WKT":
                return _E(OS.ogr_geom_wkt(g), "str")
            return _E(OS.ogr_geom_area(g), "num")
        cands = [self._table(table)] if table else self.tables
        for t in cands:
            internal = t.colmap.get(name.lower())
            if internal is not None:
                k = t.kinds[internal]
                return _E(F.col(internal), "num" if k == "int" else k,
                          int_=k == "int")
        raise ValueError(f"unknown field {name!r}")

    # -- expressions (swq grammar precedence) -------------------------------

    def expr(self) -> _E:
        e = self._and()
        while self.kw("OR"):
            e = _E(e.col | self._and().col, "other")
        return e

    def _and(self) -> _E:
        e = self._not()
        while self.kw("AND"):
            e = _E(e.col & self._not().col, "other")
        return e

    def _not(self) -> _E:
        if self.kw("NOT"):
            return _E(~self._not().col, "other")
        return self._cmp()

    def _cmp(self) -> _E:
        a = self._add()
        if self.kw("IS", "NOT", "NULL"):
            return _E(a.col.isNotNull(), "other")
        if self.kw("IS", "NULL"):
            return _E(a.col.isNull(), "other")
        neg = self.kw("NOT")
        if self.kw("IN"):
            return self._in(a, neg)
        if self.kw("BETWEEN"):
            lo = self._add()
            self.expect_kw("AND")
            hi = self._add()
            c = a.col.between(lo.col, hi.col)
            return _E(~c if neg else c, "other")
        if self.kw("LIKE") or self.kw("ILIKE"):
            return self._like(a, neg)
        if neg:
            raise ValueError("dangling NOT")
        op = self.accept_op("=", "<>", "!=", "<=", ">=", "<", ">")
        if op is None:
            return a
        b = self._add()
        return self._compare(op, a, b)

    @staticmethod
    def _dt_literal(e: _E) -> _E:
        """OGR datetime literals use slashes ('2010/04/01 00:00:00',
        ogr_sql.dox datetime examples); Spark's timestamp cast rejects
        them, so normalize before the implicit cast."""
        import re
        if e.kind == "str" and isinstance(e.lit, str) \
                and re.match(r"^\d{4}/\d{2}/\d{2}([ T]|$)", e.lit):
            v = e.lit.replace("/", "-")
            return _E(F.lit(v), "str", v)
        return e

    def _promote(self, a: _E, b: _E) -> tuple[_E, _E]:
        """Numeric field vs string literal: atoi/atof leading-number
        promotion (SWQGeneralEvaluator); symmetric."""
        if a.kind == "other" and b.kind == "str":
            b = self._dt_literal(b)
        elif b.kind == "other" and a.kind == "str":
            a = self._dt_literal(a)
        if a.kind == "num" and b.kind == "str" and b.lit is not None:
            v = _leading_num(str(b.lit))
            b = _E(F.lit(v), "num", v)
        elif b.kind == "num" and a.kind == "str" and a.lit is not None:
            v = _leading_num(str(a.lit))
            a = _E(F.lit(v), "num", v)
        return a, b

    def _compare(self, op: str, a: _E, b: _E) -> _E:
        a, b = self._promote(a, b)
        ci = a.kind == "str" and b.kind == "str"
        if op == "=":
            return _E(OS.ci_eq(a.col, b.col) if ci else a.col == b.col, "other")
        if op in ("<>", "!="):
            return _E(OS.ci_ne(a.col, b.col) if ci else a.col != b.col, "other")
        # <,>,<=,>= stay case-sensitive (ogr_sql.dox:263,320)
        ops = {"<": Column.__lt__, ">": Column.__gt__,
               "<=": Column.__le__, ">=": Column.__ge__}
        return _E(ops[op](a.col, b.col), "other")

    def _in(self, a: _E, neg: bool) -> _E:
        self.expect_op("(")
        vals = [self._add()]
        while self.accept_op(","):
            vals.append(self._add())
        self.expect_op(")")
        if a.kind == "str":
            c = OS.ci_in(a.col, [str(v.lit) for v in vals])
        elif a.kind == "num":
            nums = [(_leading_num(str(v.lit)) if v.kind == "str"
                     else float(v.lit)) for v in vals]
            c = a.col.isin(nums)
        else:
            c = a.col.isin([v.lit for v in vals])
        return _E(~c if neg else c, "other")

    def _like(self, a: _E, neg: bool) -> _E:
        pat = self._add()
        esc = None
        if self.kw("ESCAPE"):
            esc = str(self._add().lit)
        c = OS.ci_like(a.col, str(pat.lit), esc)
        return _E(~c if neg else c, "other")

    def _add(self) -> _E:
        e = self._mul()
        while True:
            op = self.accept_op("+", "-")
            if op is None:
                return e
            r = self._mul()
            if op == "+" and (e.kind == "str" or r.kind == "str"):
                # '+' on strings concatenates (SWQGeneralEvaluator's
                # SWQ_ADD string branch; ogr_rfc28_3)
                e = _E(F.concat(e.col.cast("string"),
                                r.col.cast("string")), "str")
                continue
            e = _E(e.col + r.col if op == "+" else e.col - r.col, "num",
                   int_=e.int_ and r.int_)

    def _mul(self) -> _E:
        e = self._unary()
        while True:
            op = self.accept_op("*", "/", "%")
            if op is None:
                return e
            r = self._unary()
            both_int = e.int_ and r.int_
            if op == "/" and both_int:
                col = ((e.col - (e.col % r.col)) / r.col).cast("long")
            else:
                col = (e.col * r.col if op == "*" else
                       e.col / r.col if op == "/" else e.col % r.col)
            e = _E(col, "num", int_=both_int)

    def _unary(self) -> _E:
        if self.accept_op("-"):
            e = self._unary()
            return _E(-e.col, "num", -e.lit if isinstance(e.lit, (int, float))
                      else None, int_=e.int_)
        return self._primary()

    def _primary(self) -> _E:
        k, v = self.peek()
        if k == "str":
            self.i += 1
            return _E(F.lit(v), "str", v)
        if k == "num":
            self.i += 1
            val = float(v) if ("." in v or "e" in v.lower()) else int(v)
            return _E(F.lit(val), "num", val, int_=isinstance(val, int))
        if k == "op" and v == "(":
            self.i += 1
            e = self.expr()
            self.expect_op(")")
            return e
        if k == "id" and v.upper() == "NULL":
            self.i += 1
            return _E(F.lit(None), "other", None)
        if k == "id" and v.upper() == "CAST":
            return self._cast()
        if k == "id" and v.upper() in _FUNCS and self.peek(1) == ("op", "("):
            return self._func(v.upper())
        if k in ("id", "qid"):
            table, name = self._qualified_ref()
            return self._resolve(table, name)
        raise ValueError(f"unexpected token {(k, v)}")

    def _cast(self) -> _E:
        self.expect_kw("CAST")
        self.expect_op("(")
        e = self.expr()
        self.expect_kw("AS")
        k, tname = self.next()
        width = prec = 0
        if self.accept_op("("):
            width = int(self.next()[1])
            if self.accept_op(","):
                prec = int(self.next()[1])
            self.expect_op(")")
        self.expect_op(")")
        typ = _spark_type(tname, width, prec)
        kind = "str" if typ == "string" else (
            "num" if typ in ("long", "double") else "other")
        return _E(e.col.cast(typ), kind, int_=typ == "long")

    def _func(self, name: str) -> _E:
        self.next()
        self.expect_op("(")
        args = [self.expr()]
        while self.accept_op(","):
            args.append(self.expr())
        self.expect_op(")")
        if name == "CONCAT":
            if len(args) < 2:
                raise ValueError(
                    f"Expected 2 or more arguments to CONCAT(), "
                    f"but got {len(args)}")
            return _E(F.concat(*[a.col.cast("string") for a in args]), "str")
        if name == "SUBSTR":
            # arity/type checks per SWQGeneralChecker (ogr_rfc28_38)
            if len(args) not in (2, 3):
                raise ValueError(f"Expected 2 or 3 arguments to SUBSTR(), "
                                 f"but got {len(args)}")
            if args[0].kind == "num":
                raise ValueError("Wrong argument type for SUBSTR()")
            start = int(args[1].lit)
            length = int(args[2].lit) if len(args) > 2 else None
            return _E(OS.ogr_substr(args[0].col, start, length), "str")
        # HSTORE_GET_VALUE(col, 'key')  (swq_op_registrar.cpp:52-59)
        if len(args) != 2:
            raise ValueError(f"Expected 2 arguments to hstore_get_value(), "
                             f"but got {len(args)}")
        return _E(OS.hstore_get_value(args[0].col, str(args[1].lit)), "str")

    # -- select list --------------------------------------------------------

    def _select_item(self) -> list[tuple[Column, str, bool]]:
        """Returns [(column, out_name, is_agg)]; '*' expands to many."""
        k, v = self.peek()
        if k == "op" and v == "*":
            self.i += 1
            return [(F.col(i), n, False)
                    for t in self.tables for n, i in t.attrs]
        if (k in ("id", "qid") and self.peek(1) == ("op", ".")
                and self.peek(2) == ("op", "*")):
            self.i += 3
            t = self._table(v)
            # an explicitly qualified star ALWAYS composes table.field
            # names, even on the primary table (swq_select.cpp:908
            # `compose = (itable != -1) || ...`; asserted by ogr_sql_22)
            pre = t.out_prefix or (v + ".")
            # strip the table's own prefix (not dot-split: field names may
            # themselves contain dots, ogr_rfc28_41)
            return [(F.col(i),
                     pre + (n[len(t.out_prefix):]
                            if t.out_prefix and n.startswith(t.out_prefix)
                            else n), False)
                    for n, i in t.attrs]
        if k == "id" and v.upper() in _AGGS and self.peek(1) == ("op", "("):
            return [self._agg_item(v.upper())]
        # scalar expression; capture naming info (swq_select.cpp:455-505)
        start = self.i
        e = self.expr()
        name = self._default_name(start)
        alias = self._alias()
        return [(e.col, alias or name, False)]

    def _agg_item(self, op: str):
        self.next()
        self.expect_op("(")
        distinct = self.kw("DISTINCT")
        if self.accept_op("*"):
            if op != "COUNT":
                raise ValueError(f"{op}(*) unsupported")
            self.expect_op(")")
            name = self._alias() or "COUNT_*"
            return (F.count(F.lit(1)), name, True)
        start = self.i
        e = self.expr()
        self.expect_op(")")
        field = self._default_name(start)
        name = self._alias() or f"{op}_{field}"
        fns = {"MIN": F.min, "MAX": F.max, "AVG": F.avg, "SUM": F.sum}
        if op == "COUNT":
            col = F.count_distinct(e.col) if distinct else F.count(e.col)
        elif op == "AVG" and e.kind == "other":
            # AVG over a date/timestamp is the average unix time rendered
            # back as a timestamp (swq.cpp summary accumulate on SWQ_DATE
            # — ogr_rfc28_33 expects '2013/07/02 11:59:59.500')
            col = F.timestamp_seconds(
                F.avg(e.col.cast("timestamp").cast("double")))
        else:
            col = fns[op](e.col)
        return (col, name, True)

    def _default_name(self, start: int) -> str:
        """Column-name capture for unaliased items (swq_select.cpp:455-505):
        a bare column ref keeps its field name (qualified refs keep
        'table.field', the joined-star convention the autotest asserts);
        CAST over a leading column ref keeps that column's name
        (swq_select.cpp:472); unaliased CONCAT/SUBSTR whose first
        argument is a column compose '{OP}_{field}' (swq_select.cpp:504,
        asserted by ogr_rfc28_14/15); anything else becomes FIELD_n (the
        reference leaves it unnamed — Spark requires a name)."""
        toks = self.t[start:self.i]
        prefix = ""
        if (len(toks) > 2 and toks[0][0] == "id"
                and toks[0][1].upper() in ("CAST", "CONCAT", "SUBSTR")
                and toks[1] == ("op", "(")):
            if toks[0][1].upper() in ("CONCAT", "SUBSTR"):
                prefix = toks[0][1].upper() + "_"
            toks = toks[2:]
        if toks and toks[0][0] in ("id", "qid"):
            if (len(toks) >= 3 and toks[1] == ("op", ".")
                    and toks[2][0] in ("id", "qid")
                    and toks[0][1].lower() in [t.alias for t in self.tables]):
                name, rest = f"{toks[0][1]}.{toks[2][1]}", toks[3:]
            else:
                name, rest = toks[0][1], toks[1:]
            terminator = (not rest or rest[0] in (("op", ","), ("op", ")"))
                          or (rest[0][0] == "id"
                              and rest[0][1].upper() == "AS"))
            if terminator and name.upper() not in _AGGS \
                    and name.upper() != "NULL":   # bare NULL is anonymous
                return prefix + name
        self._anon += 1
        return f"FIELD_{self._anon}"

    def _alias(self) -> str | None:
        if self.kw("AS"):
            k, v = self.next()
            if k not in ("id", "qid", "str"):
                raise ValueError("expected alias")
            return v
        k, v = self.peek()
        if k in ("qid", "str"):
            self.i += 1
            return v
        if k == "id" and v.upper() not in (
                "FROM", "UNION", "WHERE", "ORDER", "LEFT", "JOIN", "ON",
                "AS", "ASC", "DESC", "LIMIT"):
            self.i += 1
            return v
        return None

    # -- statement ----------------------------------------------------------

    def select_statement(self) -> DataFrame:
        self.tables, self.joined, self._anon = [], None, 0
        self.expect_kw("SELECT")
        distinct = self.kw("DISTINCT")
        items_toks_start = self.i
        # two-pass: skim to FROM to bind tables first, then parse the list
        depth = 0
        j = self.i
        while j < len(self.t):
            k, v = self.t[j]
            if k == "op" and v == "(":
                depth += 1
            elif k == "op" and v == ")":
                depth -= 1
            elif k == "id" and v.upper() == "FROM" and depth == 0:
                break
            j += 1
        self.i = j
        self.expect_kw("FROM")
        self._parse_from()
        where = None
        if self.kw("WHERE"):
            where = self.expr().col
        order_specs: list[tuple[str, str, bool]] = []
        if self.kw("ORDER", "BY"):
            while True:
                table, name = self._qualified_ref()
                desc = self.kw("DESC")
                if not desc:
                    self.kw("ASC")
                order_specs.append((table, name, desc))
                if not self.accept_op(","):
                    break
        tail = self.i
        # now parse the select list in table scope
        self.i = items_toks_start
        items: list[tuple[Column, str, bool]] = []
        while True:
            items.extend(self._select_item())
            if not self.accept_op(","):
                break
        k, v = self.peek()
        if not (k == "id" and v.upper() == "FROM"):
            raise ValueError(f"expected FROM, got {(k, v)}")
        self.i = tail

        df = self.joined
        if where is not None:
            df = df.filter(where)
        aggs = [it for it in items if it[2]]
        if aggs:
            if len(aggs) != len(items):
                raise ValueError("cannot mix aggregates and fields "
                                 "(no GROUP BY in the OGR dialect)")
            return df.agg(*[c.alias(n) for c, n, _ in items])
        if distinct:
            # DISTINCT first, then order on the OUTPUT columns (the
            # reference's DISTINCT_LIST mode sorts the accumulated list)
            out = df.select(*[c.alias(n) for c, n, _ in items]).distinct()
            if order_specs:
                names = {n.lower(): n for _c, n, _a in items}
                cols = []
                for table, name, desc in order_specs:
                    key = (f"{table}.{name}" if table else name).lower()
                    if key not in names and name.lower() in names:
                        key = name.lower()
                    if key not in names:
                        raise ValueError(
                            f"ORDER BY field {name!r} not in DISTINCT list")
                    c = F.col(f"`{names[key]}`")
                    cols.append(c.desc() if desc else c.asc())
                out = out.orderBy(*cols)
            return out
        if order_specs:
            cols = [self._resolve(t, n).col.desc() if d
                    else self._resolve(t, n).col.asc()
                    for t, n, d in order_specs]
            df = df.orderBy(*cols)
        return df.select(*[c.alias(n) for c, n, _ in items])
