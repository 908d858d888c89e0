"""SDTS TVP (USGS Spatial Data Transfer Standard topological vector
profile) reader over the engine's ISO8211 module, mirroring
gdal/frmts/sdts/ (sdtstransfer.cpp module routing,
sdtspointreader/lineereader/polygonreader/attrreader):

- the CATD catalogue lists member modules and their files;
- IREF fixes the coordinate scale/origin (SADR raw BI32 pairs *
  SFAX/SFAY + XORG/YORG);
- point modules (PNTS) -> Point layers, line modules (LINE + SADR
  vertex lists, SNID/ENID node links, PIDL/PIDR polygon links) ->
  LineString layers, polygon modules (POLY) -> Polygon layers with
  rings assembled from the lines naming the polygon on either side;
- attribute modules (ATPR/ATTP) -> geometry-less layers whose field
  names are the trimmed ATTP labels.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.sources.iso8211 import DDFModule


def _sadr_xy(row, sfax, sfay, xorg, yorg):
    x = struct.unpack(">i", row["X"])[0] * sfax + xorg
    y = struct.unpack(">i", row["Y"])[0] * sfay + yorg
    return x, y


class SDTSTransfer:
    def __init__(self, catd_path: str):
        self.dir = os.path.dirname(os.path.abspath(catd_path))
        self.files = {}                      # module name -> file path
        for rec in DDFModule.open(catd_path).records():
            f = rec.field("CATD")
            if f is None:
                continue
            d = f.first()
            name = (d.get("NAME") or "").strip()
            fil = (d.get("FILE") or "").strip()
            if name and fil:
                p = os.path.join(self.dir, fil)
                if not os.path.exists(p):
                    for g in os.listdir(self.dir):
                        if g.lower() == fil.lower():
                            p = os.path.join(self.dir, g)
                            break
                if os.path.exists(p):
                    self.files[name] = p

        self.sfax = self.sfay = 1.0
        self.xorg = self.yorg = 0.0
        if "IREF" in self.files:
            for rec in DDFModule.open(self.files["IREF"]).records():
                f = rec.field("IREF")
                if f is not None:
                    d = f.first()
                    self.sfax = float(d.get("SFAX") or 1)
                    self.sfay = float(d.get("SFAY") or 1)
                    self.xorg = float(d.get("XORG") or 0)
                    self.yorg = float(d.get("YORG") or 0)
        self._lines_cache = {}

    def layer_names(self):
        """Modules that surface as layers: attribute primaries +
        point/line/polygon geometry modules."""
        out = []
        for name, path in self.files.items():
            kind = self.layer_kind(name)
            if kind:
                out.append(name)
        return out

    def layer_kind(self, name):
        path = self.files.get(name)
        if path is None:
            return None
        mod = DDFModule.open(path)
        tags = set(mod.defns)
        if "PNTS" in tags:
            return "Point"
        if "LINE" in tags:
            return "LineString"
        if "POLY" in tags:
            return "Polygon"
        if "ATPR" in tags or "ATTP" in tags:
            return "None"
        return None

    # -------------- records --------------

    def _attributes(self, rec):
        props = {}
        for tag in ("ATTP", "ATTS"):
            f = rec.field(tag)
            if f is None:
                continue
            for d in f.values():
                for k, v in d.items():
                    props[k.strip()] = v
        return props

    def _line_records(self, name):
        if name in self._lines_cache:
            return self._lines_cache[name]
        out = []
        for rec in DDFModule.open(self.files[name]).records():
            line = rec.field("LINE")
            if line is None:
                continue
            d = line.first()
            sadr = rec.field("SADR")
            coords = np.array(
                [_sadr_xy(r, self.sfax, self.sfay, self.xorg, self.yorg)
                 for r in sadr.values()]) if sadr is not None else \
                np.zeros((0, 2))
            pidl = rec.field("PIDL")
            pidr = rec.field("PIDR")
            snid = rec.field("SNID")
            enid = rec.field("ENID")
            out.append({
                "rcid": d["RCID"],
                "coords": coords,
                "pidl": pidl.first().get("RCID") if pidl else None,
                "pidr": pidr.first().get("RCID") if pidr else None,
                "snid": snid.first().get("RCID") if snid else None,
                "enid": enid.first().get("RCID") if enid else None,
                "atid": [a["RCID"] for a in rec.field("ATID").values()]
                if rec.field("ATID") else [],
            })
        self._lines_cache[name] = out
        return out

    def _polygon_rings(self, poly_rcid):
        """Rings from every line module whose PIDL/PIDR names this
        polygon, chained by node ids (sdtspolygonreader semantics)."""
        segs = []
        for name in self.files:
            if self.layer_kind(name) != "LineString":
                continue
            for ln in self._line_records(name):
                if len(ln["coords"]) < 2:
                    continue
                if ln["pidl"] == poly_rcid:
                    segs.append((ln["snid"], ln["enid"], ln["coords"]))
                elif ln["pidr"] == poly_rcid:
                    segs.append((ln["snid"], ln["enid"], ln["coords"]))
        rings = []
        while segs:
            s0, e0, c = segs.pop(0)
            start, end = s0, e0
            ring = c
            progress = True
            while progress and start != end:
                progress = False
                for i, (s, e, cc) in enumerate(segs):
                    if s == end:
                        ring = np.vstack([ring, cc[1:]])
                        end = e
                    elif e == end:
                        ring = np.vstack([ring, cc[::-1][1:]])
                        end = s
                    else:
                        continue
                    segs.pop(i)
                    progress = True
                    break
            if len(ring) >= 4:
                if tuple(ring[0]) != tuple(ring[-1]):
                    ring = np.vstack([ring, ring[:1]])
                rings.append(ring)
        if len(rings) > 1:
            def area(r):
                x, y = r[:, 0], r[:, 1]
                return 0.5 * abs(np.dot(x[:-1], y[1:])
                                 - np.dot(x[1:], y[:-1]))
            rings.sort(key=area, reverse=True)
        return rings

    def layer(self, name):
        """(properties dict, wkb | None) rows for one module."""
        kind = self.layer_kind(name)
        path = self.files[name]
        out = []
        if kind == "None":
            for rec in DDFModule.open(path).records():
                atpr = rec.field("ATPR")
                props = {}
                if atpr is not None:
                    props["RCID"] = atpr.first().get("RCID")
                props.update(self._attributes(rec))
                if props:
                    out.append((props, None))
            return out
        if kind == "Point":
            for rec in DDFModule.open(path).records():
                pnts = rec.field("PNTS")
                if pnts is None:
                    continue
                d = pnts.first()
                props = {"RCID": d["RCID"], "OBRP": d.get("OBRP", "")}
                props.update(self._attributes(rec))
                sadr = rec.field("SADR")
                wkb = None
                if sadr is not None:
                    x, y = _sadr_xy(sadr.first(), self.sfax, self.sfay,
                                    self.xorg, self.yorg)
                    wkb = G.encode_point(x, y)
                out.append((props, wkb))
            return out
        if kind == "LineString":
            for ln in self._line_records(name):
                props = {"RCID": ln["rcid"], "SNID": ln["snid"],
                         "ENID": ln["enid"], "PIDL": ln["pidl"],
                         "PIDR": ln["pidr"]}
                wkb = G.encode_linestring(ln["coords"]) \
                    if len(ln["coords"]) >= 2 else None
                out.append((props, wkb))
            return out
        if kind == "Polygon":
            for rec in DDFModule.open(path).records():
                poly = rec.field("POLY")
                if poly is None:
                    continue
                d = poly.first()
                props = {"RCID": d["RCID"], "OBRP": d.get("OBRP", "")}
                props.update(self._attributes(rec))
                rings = self._polygon_rings(d["RCID"])
                wkb = G.encode_polygon(rings) if rings else None
                out.append((props, wkb))
            return out
        raise KeyError(name)


def open_sdts(catd_path: str) -> SDTSTransfer:
    return SDTSTransfer(catd_path)


def read_sdts(spark, catd_path: str, layer: str):
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    t = open_sdts(catd_path)
    src = os.path.basename(catd_path)
    rows = [(src, i, json.dumps(props, default=str), wkb)
            for i, (props, wkb) in enumerate(t.layer(layer))]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
