"""Linear referencing (ogrlineref analog) over WKB polyline rows.

Re-expresses the reference's linear-referencing primitives as
batch-vectorized Spark operators:

- measure of a point projected onto a line — OGRSimpleCurve::Project
  (gdal/ogr/ogrlinestring.cpp:1241, GEOSProject semantics: measure of
  the nearest point, first minimal segment wins) with the app's exact
  start/end short-circuit (gdal/apps/ogrlineref.cpp:547-560)
- point at measure — OGRSimpleCurve::Value
  (gdal/ogr/ogrlinestring.cpp:1162: negative → start point, beyond the
  end → end point, zero-length segments skipped, first segment with
  cum <= m <= cum+len interpolates)
- sub-line by measure range — OGRSimpleCurve::getSubLine
  (gdal/ogr/ogrlinestring.cpp:1296: clamps from/to into [0, L], null on
  inverted/degenerate ranges, < 2 points → null)
- uniform milepost parts — the ogrlineref "-c create parts" step loop
  (gdal/apps/ogrlineref.cpp:413-545 CreateSubline over step boundaries)

Scale shape: every operator is a narrow per-row map over WKB columns
(mapInPandas, no shuffle); the parts operator fans one line row out to
ceil(L/step) part rows — an explode, still shuffle-free.  Geometry math
is numpy per geometry over Arrow batches; no per-vertex Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions.geometry import decode_linestring, encode_linestring

# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _seg_arrays(coords: np.ndarray):
    """Per-segment (dx, dy, length, cumulative-length-before) arrays."""
    d = np.diff(coords, axis=0)
    seg = np.hypot(d[:, 0], d[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seg)[:-1]])
    return d, seg, cum


def line_value(coords: np.ndarray, m: float) -> tuple[float, float]:
    """OGRSimpleCurve::Value — point at measure ``m``."""
    if m < 0:
        return float(coords[0, 0]), float(coords[0, 1])
    d, seg, cum = _seg_arrays(coords)
    ok = (seg > 0) & (cum <= m) & (cum + seg >= m)
    idx = np.nonzero(ok)[0]
    if len(idx) == 0:
        return float(coords[-1, 0]), float(coords[-1, 1])
    i = idx[0]
    r = (m - cum[i]) / seg[i]
    return (float(coords[i, 0] * (1 - r) + coords[i + 1, 0] * r),
            float(coords[i, 1] * (1 - r) + coords[i + 1, 1] * r))


def line_project(coords: np.ndarray, px: float, py: float) -> float:
    """Measure along the line of the nearest point to (px, py) — the
    Project semantics ogrlineref uses, including its exact start/end
    equality short-circuits."""
    if px == coords[0, 0] and py == coords[0, 1]:
        return 0.0
    d, seg, cum = _seg_arrays(coords)
    total = float(cum[-1] + seg[-1]) if len(seg) else 0.0
    if px == coords[-1, 0] and py == coords[-1, 1]:
        return total
    live = seg > 0
    if not live.any():
        return 0.0
    x1 = coords[:-1, 0][live]
    y1 = coords[:-1, 1][live]
    dx = d[:, 0][live]
    dy = d[:, 1][live]
    sl = seg[live]
    cm = cum[live]
    t = np.clip(((px - x1) * dx + (py - y1) * dy) / (sl * sl), 0.0, 1.0)
    qx = x1 + t * dx
    qy = y1 + t * dy
    d2 = (px - qx) ** 2 + (py - qy) ** 2
    i = int(np.argmin(d2))  # first minimal segment, as in GEOS's scan
    return float(cm[i] + t[i] * sl[i])


def line_subline(coords: np.ndarray, m0: float, m1: float) -> np.ndarray | None:
    """OGRSimpleCurve::getSubLine — vertices of the [m0, m1] portion;
    None on the reference's failure conditions.  Quirk replicated for
    parity: when ``m0 == 0`` the reference appends vertex 0 and then the
    tail loop re-adds it, so the output starts with a duplicated start
    vertex (gdal/ogr/ogrlinestring.cpp:1330-1340 with i left at 0)."""
    d, seg, cum = _seg_arrays(coords)
    total = float(seg.sum())
    m0 = max(m0, 0.0)
    m1 = min(m1, total)
    if m0 > m1 or m0 >= total:
        return None
    pts: list[tuple[float, float]] = []
    n = len(coords)
    if m0 == 0:
        pts.append((float(coords[0, 0]), float(coords[0, 1])))
        i = 0
    else:
        i = 0
        length = 0.0
        for j in range(n - 1):
            if seg[j] <= 0:
                continue
            if length <= m0 <= length + seg[j]:
                r = (m0 - length) / seg[j]
                pts.append((float(coords[j, 0] * (1 - r) + coords[j + 1, 0] * r),
                            float(coords[j, 1] * (1 - r) + coords[j + 1, 1] * r)))
                if length <= m1 <= length + seg[j]:
                    r = (m1 - length) / seg[j]
                    pts.append((
                        float(coords[j, 0] * (1 - r) + coords[j + 1, 0] * r),
                        float(coords[j, 1] * (1 - r) + coords[j + 1, 1] * r)))
                    if len(pts) < 2:
                        return None
                    return np.asarray(pts)
                i = j + 1
                break
            length += seg[j]
    # middle vertices + interpolated end
    length = float(cum[i]) if i < n - 1 else total
    for j in range(i, n - 1):
        pts.append((float(coords[j, 0]), float(coords[j, 1])))
        if seg[j] > 0:
            if length <= m1 <= length + seg[j]:
                r = (m1 - length) / seg[j]
                pts.append((float(coords[j, 0] * (1 - r) + coords[j + 1, 0] * r),
                            float(coords[j, 1] * (1 - r) + coords[j + 1, 1] * r)))
                return np.asarray(pts) if len(pts) >= 2 else None
            length += seg[j]
    pts.append((float(coords[-1, 0]), float(coords[-1, 1])))
    return np.asarray(pts) if len(pts) >= 2 else None


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def with_measure(df: DataFrame, wkb: str = "wkb", x: str = "x", y: str = "y",
                 out: str = "measure") -> DataFrame:
    """Per-row measure of (x, y) projected onto the row's polyline —
    the ogrlineref "get position for coordinates" mode."""
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out, T.DoubleType())])
    iw = df.columns.index(wkb)
    ix = df.columns.index(x)
    iy = df.columns.index(y)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = np.empty(len(pdf))
            for i, row in enumerate(pdf.itertuples(index=False)):
                coords = decode_linestring(bytes(row[iw]))
                vals[i] = line_project(coords, float(row[ix]), float(row[iy]))
            o = pdf.copy()
            o[out] = vals
            yield o

    return df.mapInPandas(run, schema=schema)


def with_point_at(df: DataFrame, wkb: str = "wkb", measure: str = "measure",
                  out_x: str = "ix", out_y: str = "iy") -> DataFrame:
    """Per-row point at the row's measure along the row's polyline
    (OGRSimpleCurve::Value)."""
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_x, T.DoubleType()),
                             T.StructField(out_y, T.DoubleType())])
    iw = df.columns.index(wkb)
    im = df.columns.index(measure)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs = np.empty(len(pdf))
            ys = np.empty(len(pdf))
            for i, row in enumerate(pdf.itertuples(index=False)):
                coords = decode_linestring(bytes(row[iw]))
                xs[i], ys[i] = line_value(coords, float(row[im]))
            o = pdf.copy()
            o[out_x] = xs
            o[out_y] = ys
            yield o

    return df.mapInPandas(run, schema=schema)


def milepost_parts(df: DataFrame, step: float, wkb: str = "wkb",
                   id_cols: list[str] | None = None) -> DataFrame:
    """Uniform milepost parts: each polyline row explodes into sub-line
    rows [k*step, min((k+1)*step, L)] with (part_id, begin, end,
    part_len, part_wkb) — the ogrlineref -c create-parts output for a
    uniform (scale factor 1) path."""
    id_cols = id_cols if id_cols is not None else [
        c for c in df.columns if c != wkb]
    keep = [df.schema[c] for c in id_cols]
    schema = T.StructType(list(keep) + [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("begin", T.DoubleType()),
        T.StructField("end", T.DoubleType()),
        T.StructField("part_len", T.DoubleType()),
        T.StructField("part_wkb", T.BinaryType()),
    ])
    iw = df.columns.index(wkb)
    idx = [df.columns.index(c) for c in id_cols]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                coords = decode_linestring(bytes(row[iw]))
                d = np.diff(coords, axis=0)
                total = float(np.hypot(d[:, 0], d[:, 1]).sum())
                k = 0
                while k * step < total:
                    b = k * step
                    e = min((k + 1) * step, total)
                    sub = line_subline(coords, b, e)
                    if sub is not None:
                        sd = np.diff(sub, axis=0)
                        plen = float(np.hypot(sd[:, 0], sd[:, 1]).sum())
                        out.append(tuple(row[j] for j in idx)
                                   + (k, b, e, plen,
                                      encode_linestring(sub)))
                    k += 1
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields]) \
                if out else pd.DataFrame(
                    {f.name: [] for f in schema.fields})

    return df.mapInPandas(run, schema=schema)
