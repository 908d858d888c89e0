"""OGR feature-style tools (gdal/ogr/ogrfeaturestyle.cpp).

The engine's drivers carry styles as OGR style STRINGS (the reference's
own storage form); this module supplies the OGRStyleMgr/OGRStyleTool
surface over them: parse a style string into tools + parameters,
rebuild it, read one parameter (with unit split), and the StyleTable
name->style registry with its text-file save/load format.  A Spark
column accessor lets queries project e.g. the pen color of every
feature without leaving the JVM batch path (one vectorized UDF).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_TOOLS = ("PEN", "BRUSH", "SYMBOL", "LABEL", "VECTOR")
_UNITS = ("px", "pt", "mm", "cm", "in", "g")


def parse_style(style: str) -> list[tuple[str, dict]]:
    """Style string → [(tool, {param: raw value})] with OGR quoting
    rules: tools split on ';', params on ',', values may be
    double-quoted with backslash escapes."""
    out = []
    i, n = 0, len(style or "")
    while i < n:
        m = re.match(r"\s*([A-Za-z]+)\s*\(", style[i:])
        if not m:
            break
        tool = m.group(1).upper()
        i += m.end()
        params, key, buf = {}, None, []
        in_q = False
        while i < n:
            c = style[i]
            if in_q:
                if c == "\\" and i + 1 < n:
                    buf.append(style[i + 1])
                    i += 2
                    continue
                if c == '"':
                    in_q = False
                else:
                    buf.append(c)
            elif c == '"':
                in_q = True
            elif c == ":" and key is None:
                key = "".join(buf).strip()
                buf = []
            elif c in ",)":
                if key is not None:
                    params[key.lower()] = "".join(buf)
                key, buf = None, []
                if c == ")":
                    i += 1
                    break
            else:
                buf.append(c)
            i += 1
        out.append((tool, params))
        while i < n and style[i] in "; ":
            i += 1
    return out


def build_style(tools: list[tuple[str, dict]]) -> str:
    """[(tool, params)] → style string; values with separators are
    quoted with escaped inner quotes (the writers' convention)."""
    parts = []
    for tool, params in tools:
        kv = []
        for k, v in params.items():
            v = str(v)
            if any(c in v for c in ',():;"') or " " in v:
                v = '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
            kv.append(f"{k}:{v}")
        parts.append(f"{tool.upper()}({','.join(kv)})")
    return ";".join(parts)


def style_param(style: str, tool: str, param: str) -> str | None:
    """One raw parameter value of the first matching tool, or None."""
    for t, params in parse_style(style):
        if t == tool.upper():
            return params.get(param.lower())
    return None


def style_value(raw: str) -> tuple[float | None, str | None]:
    """Split a numeric parameter into (value, unit) — OGR's pixel/
    point/mm/cm/inch/ground suffixes (ogr_featurestyle.h units)."""
    m = re.match(r"^\s*([-+]?\d*\.?\d+)\s*(px|pt|mm|cm|in|g)?\s*$",
                 raw or "")
    if not m:
        return None, None
    return float(m.group(1)), m.group(2)


def style_param_col(style_col: Column, tool: str, param: str) -> Column:
    """Vectorized column accessor: the raw value of tool.param per row
    (null when absent) — e.g. pen color of every feature."""
    def run(s: pd.Series) -> pd.Series:
        return s.map(lambda v: style_param(v, tool, param)
                     if isinstance(v, str) else None)
    return F.pandas_udf(run, "string")(style_col)


class StyleTable:
    """OGRStyleTable: named styles with the reference's text format
    (one 'name:style' line per entry) and cursor-style iteration."""

    def __init__(self):
        self._styles: list[tuple[str, str]] = []
        self._pos = 0

    def add_style(self, name: str, style: str) -> bool:
        if self.find(name) is not None:
            return False
        self._styles.append((name, style))
        return True

    def find(self, name: str) -> str | None:
        for n, s in self._styles:
            if n == name:
                return s
        return None

    def get_next_style(self) -> str | None:
        if self._pos >= len(self._styles):
            return None
        s = self._styles[self._pos][1]
        self._pos += 1
        return s

    def get_last_style_name(self) -> str | None:
        if self._pos == 0:
            return None
        return self._styles[self._pos - 1][0]

    def reset_style_string_reading(self) -> None:
        self._pos = 0

    def save(self, path: str) -> bool:
        try:
            with open(path, "w", encoding="utf-8") as f:
                for n, s in self._styles:
                    f.write(f"{n}:{s}\n")
            return True
        except OSError:
            return False

    def load(self, path: str) -> bool:
        try:
            with open(path, "r", encoding="utf-8") as f:
                lines = f.read().splitlines()
        except OSError:
            return False
        self._styles = []
        for ln in lines:
            if ln.strip().startswith("#") or ":" not in ln:
                continue
            n, s = ln.split(":", 1)
            self._styles.append((n.strip(), s.strip()))
        self._pos = 0
        return True
