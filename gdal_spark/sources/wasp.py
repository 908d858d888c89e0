"""WAsP .map reader/writer (wind-atlas elevation/roughness lines).

Reference semantics: gdal/ogr/ogrsf_frmts/wasp/ —
- ogrwaspdatasource.cpp:315-331: 4 header lines (spatial-ref text or
  'no spatial ref sys', then three fixed numeric lines);
- ogrwasplayer.cpp WriteElevation (:379): '%11.3f %11d' then vertex
  pairs '%11.1f %11.1f ' three per line; WriteRoughness (:553):
  '%11.3f %11.3f %11d' with the same vertex layout;
- GetNextRawFeature (:700+): first line holds 2 (elevation) or 3
  (roughness) values, last value = vertex count; vertices stream across
  following lines; geometry is a LineString with z=0."""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions import geometry as G
from gdal_spark.sources.formats import FEATURE_SCHEMA


def _write_line(f, values: list[float], coords: np.ndarray) -> None:
    if len(values) == 1:
        f.write(f"{values[0]:11.3f} {len(coords):11d}")
    else:
        f.write(f"{values[0]:11.3f} {values[1]:11.3f} {len(coords):11d}")
    for v in range(len(coords)):
        if v % 3 == 0:
            f.write("\n" if len(values) == 1 else "\n  ")
        f.write(f"{coords[v][0]:11.1f} {coords[v][1]:11.1f} ")
    f.write("\n")


def write_wasp(df: DataFrame, path: str, z_field: str | None = None,
               left_field: str | None = None,
               right_field: str | None = None,
               srs_text: str | None = None,
               geometry_col: str = "geometry",
               properties_col: str = "properties") -> int:
    """Elevation mode (default: z from the geometry's Z or ``z_field``)
    or roughness mode (``left_field``+``right_field``)."""
    from gdal_spark.functions.curves import decode_geom
    n = 0
    with open(path, "w") as f:
        f.write((srs_text or "no spatial ref sys") + "\n")
        f.write("  0.0 0.0 0.0 0.0\n")
        f.write("  1.0 0.0 1.0 0.0\n")
        f.write("  1.0 0.0\n")
        for r in df.toLocalIterator():
            wkb = r[geometry_col]
            if wkb is None:
                continue
            props = json.loads(r[properties_col] or "{}") \
                if properties_col in df.columns else {}
            g = decode_geom(bytes(wkb))
            lines = [g] if g.kind == 2 else \
                [p for p in getattr(g, "parts", []) if p.kind == 2]
            for line in lines:
                coords = np.asarray(line.coords)
                if left_field is not None:
                    vals = [float(props.get(left_field, 0.0)),
                            float(props.get(right_field, 0.0))]
                elif z_field is not None:
                    vals = [float(props.get(z_field, 0.0))]
                elif coords.shape[1] > 2:
                    vals = [float(coords[0, 2])]
                else:
                    vals = [0.0]
                _write_line(f, vals, coords[:, :2])
                n += 1
    return n


def read_wasp(spark: SparkSession, path: str) -> DataFrame:
    """Features after the 4 header lines; fields 'z' (elevation) or
    'left'/'right' (roughness); LineString geometry."""
    with open(path) as f:
        lines = f.read().split("\n")
    rows = []
    fid = 0
    i = 4
    while i < len(lines):
        toks = lines[i].split()
        i += 1
        if len(toks) < 2:
            continue
        vals = [float(t) for t in toks]
        npts = int(vals[-1])
        head = vals[:-1]
        need = 2 * npts
        nums: list[float] = []
        while len(nums) < need and i < len(lines):
            nums.extend(float(t) for t in lines[i].split())
            i += 1
        coords = np.array(nums[:need]).reshape(-1, 2)
        props = {"z": head[0]} if len(head) == 1 else \
            {"left": head[0], "right": head[1]}
        rows.append((path, fid, json.dumps(props, sort_keys=True),
                     bytearray(G.encode_linestring(coords))))
        fid += 1
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
