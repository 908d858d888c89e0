"""ESRI JSON (FeatureService) and TopoJSON readers.

Reference semantics: gdal/ogr/ogrsf_frmts/geojson/ogresrijsonreader.cpp
(geometryType esriGeometryPoint/Multipoint/Polyline/Polygon, x/y[/z]
members, paths/rings/points arrays, the esriFieldTypeOID field as FID,
spatialReference.wkid) and ogrtopojsonreader.cpp (Topology objects;
quantized delta-encoded arcs through transform.scale/translate;
negative arc index ~i means the reversed complement; named
GeometryCollection objects become their own layer, every other object
lands in the catch-all 'TopoJSON' layer with id/name fields).

GDAL's json-c tolerates trailing commas in ESRI exports; ``_loads``
mirrors that.
"""

from __future__ import annotations

import json
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions import geometry as G
from gdal_spark.sources.formats import FEATURE_SCHEMA


def _loads(text: str) -> dict:
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # strip trailing commas before } or ] (json-c leniency)
        return json.loads(re.sub(r",(\s*[}\]])", r"\1", text))


# ---------------------------------------------------------------------------
# ESRI JSON
# ---------------------------------------------------------------------------

def _esri_geom_to_wkb(gtype: str, geom: dict) -> bytes | None:
    if geom is None:
        return None
    gtype = {"esrigeometrypoint": "esriGeometryPoint",
             "esrigeometrymultipoint": "esriGeometryMultipoint",
             "esrigeometrypolyline": "esriGeometryPolyline",
             "esrigeometrypolygon": "esriGeometryPolygon",
             }.get(gtype.lower(), gtype)
    if gtype == "esriGeometryPoint":
        if "x" not in geom or not isinstance(geom.get("x"), (int, float)):
            return None
        if isinstance(geom.get("z"), (int, float)):
            # 25D point (OGRESRIJSONReadPoint's z member)
            import struct as _s
            return (_s.pack("<BI", 1, 0x80000001)
                    + _s.pack("<3d", float(geom["x"]), float(geom["y"]),
                              float(geom["z"])))
        return G.encode_point(float(geom["x"]), float(geom["y"]))
    if gtype == "esriGeometryMultipoint":
        pts = [(p[0], p[1]) for p in geom.get("points") or []
               if isinstance(p, list) and len(p) >= 2
               and all(isinstance(v, (int, float)) for v in p[:2])]
        if not pts:
            return None
        return G.encode_multipoint(np.array(pts).reshape(-1, 2))
    if gtype == "esriGeometryPolyline":
        paths = [np.array([(p[0], p[1]) for p in path])
                 for path in geom.get("paths") or [] if path]
        if not paths:
            return None
        if len(paths) == 1:
            return G.encode_linestring(paths[0])
        return G.encode_multilinestring(paths)
    if gtype == "esriGeometryPolygon":
        rings = [np.array([(p[0], p[1]) for p in ring])
                 for ring in geom.get("rings") or [] if ring]
        if not rings:
            return None
        # group rings into polygons by containment
        # (ogresrijsonreader.cpp OGRESRIJSONReadPolygon)
        outers: list[int] = []
        holes: dict[int, list[int]] = {}
        for i, r in enumerate(rings):
            parent = None
            for j, r2 in enumerate(rings):
                if i != j and G.py_point_in_ring(r[0][0], r[0][1], r2):
                    parent = j
                    break
            if parent is None:
                outers.append(i)
                holes.setdefault(i, [])
            else:
                holes.setdefault(parent, []).append(i)
        if len(outers) == 1:
            return G.encode_polygon([rings[outers[0]]]
                                    + [rings[h] for h in holes[outers[0]]])
        return G.encode_multipolygon(
            [[rings[o]] + [rings[h] for h in holes.get(o, [])]
             for o in outers])
    return None


def read_esrijson(spark: SparkSession, path: str) -> DataFrame:
    obj = _loads(open(path, encoding="utf-8-sig").read())
    gtype = obj.get("geometryType", "")
    oid_field = obj.get("objectIdFieldName") or next(
        (f["name"] for f in obj.get("fields", [])
         if f.get("type") == "esriFieldTypeOID"), None)
    rows = []
    for i, feat in enumerate(obj.get("features", [])):
        attrs = dict(feat.get("attributes") or {})
        fid = attrs.pop(oid_field, i) if oid_field else i
        wkb = _esri_geom_to_wkb(gtype, feat.get("geometry"))
        rows.append((path, int(fid), json.dumps(attrs, sort_keys=True),
                     bytearray(wkb) if wkb else None))
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def esrijson_wkid(path: str) -> int | None:
    obj = _loads(open(path, encoding="utf-8-sig").read())
    sr = obj.get("spatialReference") or {}
    return sr.get("latestWkid") or sr.get("wkid")


# ---------------------------------------------------------------------------
# TopoJSON
# ---------------------------------------------------------------------------

def _decode_arcs(topo: dict) -> list[np.ndarray | None]:
    tr = topo.get("transform") or {}
    sx, sy = tr.get("scale", [1.0, 1.0])
    tx, ty = tr.get("translate", [0.0, 0.0])
    quantized = "transform" in topo
    out = []
    for arc in topo.get("arcs") or []:
        if not isinstance(arc, list):
            out.append(None)
            continue
        pts = []
        x = y = 0.0
        ok = True
        for p in arc:
            if not isinstance(p, list) or len(p) < 2 or \
                    not all(isinstance(v, (int, float)) for v in p[:2]):
                ok = False
                break
            if quantized:
                x += p[0]
                y += p[1]
                pts.append((x * sx + tx, y * sy + ty))
            else:
                pts.append((p[0], p[1]))
        out.append(np.array(pts) if ok and pts else
                   (np.zeros((0, 2)) if ok else None))
    return out


def _arc_path(arcs, idx_list) -> np.ndarray | None:
    """Concatenate arc indices into one line (ogrtopojsonreader
    ParseArc): negative index i means arcs[~i] reversed; consecutive
    arcs share their junction vertex."""
    if not isinstance(idx_list, list):
        return None
    coords: list[np.ndarray] = []
    for k, idx in enumerate(idx_list):
        if not isinstance(idx, int) or isinstance(idx, bool):
            return None
        pos = ~idx if idx < 0 else idx
        if pos >= len(arcs):
            return None
        a = arcs[pos]
        if a is None or len(a) == 0:
            return None
        if idx < 0:
            a = a[::-1]
        coords.append(a if k == 0 else a[1:])
    if not coords:
        return None
    out = np.vstack(coords)
    return out if len(out) else None


def _topo_geom_to_wkb(arcs, g: dict, tr) -> bytes | None:
    if not isinstance(g, dict):
        return None
    t = g.get("type")
    quantized, (sx, sy), (tx, ty) = tr
    if t == "Point":
        c = g.get("coordinates")
        if not isinstance(c, list) or len(c) < 2 or \
                not all(isinstance(v, (int, float)) for v in c[:2]):
            return None
        if quantized:
            return G.encode_point(c[0] * sx + tx, c[1] * sy + ty)
        return G.encode_point(float(c[0]), float(c[1]))
    if t == "MultiPoint":
        c = g.get("coordinates")
        if not isinstance(c, list):
            return None
        pts = []
        for p in c:
            if isinstance(p, list) and len(p) >= 2 and \
                    all(isinstance(v, (int, float)) for v in p[:2]):
                if quantized:
                    pts.append((p[0] * sx + tx, p[1] * sy + ty))
                else:
                    pts.append((p[0], p[1]))
        if not pts:
            return None
        return G.encode_multipoint(np.array(pts))
    if t == "LineString":
        line = _arc_path(arcs, g.get("arcs") or [])
        return G.encode_linestring(line) if line is not None else None
    if t == "MultiLineString":
        lines = [_arc_path(arcs, part) for part in g.get("arcs") or []]
        lines = [l for l in lines if l is not None]
        return G.encode_multilinestring(lines) if lines else None
    if t == "Polygon":
        rings = []
        for part in g.get("arcs") or []:
            r = _arc_path(arcs, part)
            if r is None:
                continue
            if len(r) and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            rings.append(r)
        return G.encode_polygon(rings) if rings else None
    if t == "MultiPolygon":
        polys = []
        for poly in g.get("arcs") or []:
            if not isinstance(poly, list):
                continue
            rings = []
            for part in poly:
                r = _arc_path(arcs, part)
                if r is None:
                    continue
                if len(r) and not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                rings.append(r)
            if rings:
                polys.append(rings)
        return G.encode_multipolygon(polys) if polys else None
    return None


def topojson_layers(path: str) -> list[str]:
    """Named GeometryCollection objects first, then the catch-all
    'TopoJSON' layer."""
    topo = _loads(open(path, encoding="utf-8-sig").read())
    objs = topo.get("objects")
    names = []
    it = objs.items() if isinstance(objs, dict) else \
        enumerate(objs if isinstance(objs, list) else [])
    for key, obj in it:
        if isinstance(obj, dict) and \
                obj.get("type") == "GeometryCollection":
            name = obj.get("id") or (key if isinstance(key, str) else None)
            if name:
                names.append(str(name))
    return names + ["TopoJSON"]


def read_topojson(spark: SparkSession, path: str,
                  layer: str = "TopoJSON") -> DataFrame:
    topo = _loads(open(path, encoding="utf-8-sig").read())
    if topo.get("type") != "Topology":
        raise ValueError(f"{path} is not TopoJSON")
    arcs = _decode_arcs(topo)
    tr_d = topo.get("transform") or {}
    tr = ("transform" in topo, tuple(tr_d.get("scale", [1.0, 1.0])),
          tuple(tr_d.get("translate", [0.0, 0.0])))
    objs = topo.get("objects")
    it = list(objs.items()) if isinstance(objs, dict) else \
        list(enumerate(objs if isinstance(objs, list) else []))
    rows = []
    fid = 0

    def emit(g):
        nonlocal fid
        props = {"id": None, "name": None}
        if isinstance(g, dict):
            if g.get("id") is not None:
                props["id"] = str(g["id"])
            pr = g.get("properties")
            if isinstance(pr, dict) and pr.get("name") is not None:
                props["name"] = str(pr["name"])
        wkb = _topo_geom_to_wkb(arcs, g, tr) if isinstance(g, dict) \
            else None
        rows.append((path, fid, json.dumps(props, sort_keys=True),
                     bytearray(wkb) if wkb else None))
        fid += 1

    for key, obj in it:
        if not isinstance(obj, dict):
            if layer == "TopoJSON":
                emit(obj)
            continue
        is_named = obj.get("type") == "GeometryCollection" and \
            (obj.get("id") or isinstance(key, str))
        name = str(obj.get("id") or key) if is_named else None
        if is_named and layer == name:
            for g in obj.get("geometries") or []:
                emit(g)
        elif not is_named and layer == "TopoJSON":
            if obj.get("type") == "GeometryCollection":
                for g in obj.get("geometries") or []:
                    emit(g)
            else:
                emit(obj)
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
