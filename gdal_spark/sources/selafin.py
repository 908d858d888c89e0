"""Selafin (TELEMAC) mesh reader/writer.

Reference semantics: gdal/ogr/ogrsf_frmts/selafin/io_selafin.cpp —
Fortran sequential records ([len:u32 BE][payload][len:u32 BE]):
80-char title; [nVar, unused]; nVar 32-char variable names; 10 ints
(unused, EPSG, x-origin, y-origin, 5 unused, has-date flag); optional
6-int start date; [nElements, nPoints, nPointsPerElement, 1]; the
1-based connectivity table; the border array; two float32 coordinate
arrays (plus origin); then per step: [1-int record][float date record
... actually one record [date:f32]] followed by one float32 array per
variable (read_header :446, write_header :567, read_step :653).

Layer model (ogrselafinlayer.cpp): a points layer (one POINT per node,
one Real field per variable) and an elements layer (one POLYGON per
element whose attribute values are the mean of its nodes' values —
the autotest ogr_selafin.py checks exactly that).
"""

from __future__ import annotations

import json
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions import geometry as G
from gdal_spark.sources.formats import FEATURE_SCHEMA


def _rec(payload: bytes) -> bytes:
    n = struct.pack(">I", len(payload))
    return n + payload + n


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.off = 0

    def record(self) -> bytes:
        (n,) = struct.unpack_from(">I", self.d, self.off)
        out = self.d[self.off + 4:self.off + 4 + n]
        self.off += 8 + n
        return out

    def ints(self) -> np.ndarray:
        return np.frombuffer(self.record(), ">i4").astype(np.int64)

    def floats(self) -> np.ndarray:
        return np.frombuffer(self.record(), ">f4").astype(np.float64)


class SelafinMesh:
    def __init__(self, title: str = "", var_names: list[str] | None = None,
                 x=None, y=None, connectivity=None, epsg: int = 0,
                 origin=(0.0, 0.0), date: tuple | None = None,
                 steps=None, step_dates=None):
        self.title = title
        self.var_names = var_names or []
        self.x = np.asarray(x if x is not None else [], "float64")
        self.y = np.asarray(y if y is not None else [], "float64")
        self.connectivity = (np.asarray(connectivity, "int64")
                             if connectivity is not None and
                             len(np.ravel(connectivity))
                             else np.zeros((0, 3), "int64"))
        self.epsg = epsg
        self.origin = origin
        self.date = date
        # steps[s][v] = np.ndarray of nPoints values
        self.steps = steps if steps is not None else []
        self.step_dates = step_dates if step_dates is not None else []

    @property
    def n_points(self) -> int:
        return len(self.x)

    @property
    def n_elements(self) -> int:
        return len(self.connectivity)

    @property
    def points_per_element(self) -> int:
        return self.connectivity.shape[1] if self.n_elements else 3


def read_selafin_mesh(path: str) -> SelafinMesh:
    r = _Reader(open(path, "rb").read())
    title = r.record().decode("latin-1").rstrip()
    nvar = int(r.ints()[0])
    names = [r.record().decode("latin-1").rstrip() for _ in range(nvar)]
    p = r.ints()
    epsg = int(p[1])
    origin = (float(p[2]), float(p[3]))
    date = tuple(r.ints()[:6].tolist()) if p[9] == 1 else None
    ne, npts, ppe, one = r.ints()[:4]
    if one != 1:
        raise ValueError("bad selafin element record")
    conn = r.ints().reshape(int(ne), int(ppe)) if ne else \
        np.zeros((0, int(ppe) or 3), "int64")
    border = r.ints()
    x = r.floats()[:npts] + origin[0]
    y = r.floats()[:npts] + origin[1]
    m = SelafinMesh(title, names, x, y, conn, epsg, origin, date)
    m.connectivity = conn
    m.border = border
    while r.off + 8 <= len(r.d):
        try:
            (dt,) = struct.unpack_from(">f", r.record(), 0)
        except struct.error:
            break
        vals = [r.floats()[:npts] for _ in range(nvar)]
        m.steps.append(vals)
        m.step_dates.append(float(dt))
    return m


def write_selafin_mesh(mesh: SelafinMesh, path: str) -> None:
    with open(path, "wb") as f:
        f.write(_rec(mesh.title.ljust(80)[:80].encode("latin-1")))
        f.write(_rec(struct.pack(">2i", len(mesh.var_names), 0)))
        for n in mesh.var_names:
            f.write(_rec(n.ljust(32)[:32].encode("latin-1")))
        ten = [0] * 10
        ten[1] = mesh.epsg
        ten[2] = int(mesh.origin[0])
        ten[3] = int(mesh.origin[1])
        ten[9] = 1 if mesh.date else 0
        f.write(_rec(struct.pack(">10i", *ten)))
        if mesh.date:
            f.write(_rec(struct.pack(">6i", *mesh.date)))
        ppe = mesh.points_per_element
        f.write(_rec(struct.pack(">4i", mesh.n_elements, mesh.n_points,
                                 ppe, 1)))
        f.write(_rec(mesh.connectivity.astype(">i4").tobytes()))
        border = getattr(mesh, "border",
                         np.zeros(mesh.n_points, "int64"))
        f.write(_rec(np.asarray(border, ">i4").tobytes()))
        f.write(_rec((mesh.x - mesh.origin[0]).astype(">f4").tobytes()))
        f.write(_rec((mesh.y - mesh.origin[1]).astype(">f4").tobytes()))
        for dt, vals in zip(mesh.step_dates, mesh.steps):
            f.write(_rec(struct.pack(">f", dt)))
            for v in vals:
                f.write(_rec(np.asarray(v, ">f4").tobytes()))


def read_selafin(spark: SparkSession, path: str, layer: str = "points",
                 step: int = 0) -> DataFrame:
    """'<title>_p<step>' node layer (POINT + per-variable fields) or
    '<title>_e<step>' element layer (POLYGON + mean-of-node fields)."""
    m = read_selafin_mesh(path)
    vals = m.steps[step] if m.steps else [np.zeros(m.n_points)
                                          for _ in m.var_names]
    rows = []
    if layer.startswith("p"):
        for i in range(m.n_points):
            props = {n: float(v[i]) for n, v in zip(m.var_names, vals)}
            rows.append((path, i, json.dumps(props, sort_keys=True),
                         bytearray(G.encode_point(float(m.x[i]),
                                                  float(m.y[i])))))
    else:
        for e in range(m.n_elements):
            idx = m.connectivity[e] - 1
            ring = np.column_stack([m.x[idx], m.y[idx]])
            ring = np.vstack([ring, ring[:1]])
            props = {n: float(np.mean(v[idx]))
                     for n, v in zip(m.var_names, vals)}
            rows.append((path, e, json.dumps(props, sort_keys=True),
                         bytearray(G.encode_polygon([ring]))))
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
