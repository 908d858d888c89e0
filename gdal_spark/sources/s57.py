"""S-57 (IHO ENC) vector reader — built on the engine's ISO8211
module, mirroring the reference driver's semantics
(gdal/ogr/ogrsf_frmts/s57/s57reader.cpp):

- DSPM fixes COMF (coordinate divisor) and SOMF (sounding divisor);
- vector records (VRID RCNM 110 VI / 120 VC / 130 VE) carry SG2D/SG3D
  coordinates and VRPT topology pointers (an edge's VRPT name its
  begin/end connected nodes);
- feature records (FRID RCNM 100) map OBJL through the IHO object
  catalogue to a layer per class (ascending OBJL; DSID first), carry
  ATTF/NATF attributes decoded through the attribute catalogue, and
  FSPT pointers that assemble the geometry: PRIM 1 point (SOUNDG ->
  MultiPoint25D from SG3D / SOMF), PRIM 2 linestring chains of edges
  (multilinestring when discontiguous), PRIM 3 polygon rings built
  from the edge set;
- LNAM = %04X%08X%04X of (AGEN, FIDN, FIDS).

Scale shape: one ENC cell is a single self-contained file (MB-scale);
cells parallelize across files — parse runs inside the executor task
for its file, the driver only routes paths.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from gdal_spark.data.s57_catalogue import ATTRIBUTES, OBJECT_CLASSES
from gdal_spark.functions import curves as C
from gdal_spark.functions import geometry as G
from gdal_spark.sources.iso8211 import DDFModule

RCNM_VI, RCNM_VC, RCNM_VE, RCNM_VF = 110, 120, 130, 140


def _name5(raw: bytes) -> tuple[int, int]:
    """VRPT/FSPT NAME: RCNM byte + little-endian RCID."""
    return raw[0], int.from_bytes(raw[1:5], "little")


class S57Cell:
    def __init__(self, path: str):
        self.path = path
        mod = DDFModule.open(path)
        self.comf = 1.0
        self.somf = 1.0
        self.dsid = {}
        # vector records keyed by (RCNM, RCID)
        self.nodes = {}                     # -> (N,2|3) arrays / COMF
        self.edges = {}                     # -> dict(begin, end, coords)
        self.features = []

        for rec in mod.records():
            if rec.field("DSID") is not None:
                d = rec.field("DSID").first()
                self.dsid = {k: (v.decode("latin-1")
                                 if isinstance(v, bytes) else
                                 (v.strip() if isinstance(v, str) else v))
                             for k, v in d.items()}
                dssi = rec.field("DSSI")
                if dssi is not None:
                    self.dsid.update(dssi.first())
                continue
            if rec.field("DSPM") is not None:
                d = rec.field("DSPM").first()
                self.comf = float(d.get("COMF") or 1)
                self.somf = float(d.get("SOMF") or 1)
                self.dsid.update(
                    {k: v for k, v in d.items() if k in
                     ("CSCL", "HDAT", "VDAT", "SDAT", "DUNI", "HUNI")})
                continue
            vrid = rec.field("VRID")
            if vrid is not None:
                self._add_vector(rec, vrid.first())
                continue
            frid = rec.field("FRID")
            if frid is not None:
                self._add_feature(rec, frid.first())

    # ---------------- vector records ----------------

    def _coords(self, rec, want_z=False):
        sg2 = rec.field("SG2D")
        sg3 = rec.field("SG3D")
        if sg3 is not None:
            g = sg3.values()
            arr = np.array([[r["XCOO"] / self.comf, r["YCOO"] / self.comf,
                             r["VE3D"] / self.somf] for r in g])
            return arr
        if sg2 is not None:
            g = sg2.values()
            return np.array([[r["XCOO"] / self.comf,
                              r["YCOO"] / self.comf] for r in g])
        return np.zeros((0, 2))

    def _add_vector(self, rec, vr):
        key = (vr["RCNM"], vr["RCID"])
        if vr["RCNM"] in (RCNM_VI, RCNM_VC):
            self.nodes[key] = self._coords(rec)
        elif vr["RCNM"] == RCNM_VE:
            begin = end = None
            vrpt = rec.field("VRPT")
            if vrpt is not None:
                for p in vrpt.values():
                    nm = _name5(p["NAME"])
                    topi = p.get("TOPI")
                    if topi == 1 and begin is None:
                        begin = nm
                    elif topi == 2:
                        end = nm
                    elif begin is None:
                        begin = nm
                    else:
                        end = nm
            self.edges[key] = {"begin": begin, "end": end,
                               "coords": self._coords(rec)}

    # ---------------- feature records ----------------

    def _add_feature(self, rec, fr):
        objl = fr["OBJL"]
        acronym, prims = OBJECT_CLASSES.get(objl, (f"OBJL{objl}", ()))
        props = {"RCID": fr["RCID"], "PRIM": fr["PRIM"],
                 "GRUP": fr["GRUP"], "OBJL": objl, "RVER": fr["RVER"]}
        foid = rec.field("FOID")
        if foid is not None:
            f = foid.first()
            props.update(AGEN=f["AGEN"], FIDN=f["FIDN"], FIDS=f["FIDS"])
            props["LNAM"] = "%04X%08X%04X" % (f["AGEN"], f["FIDN"],
                                              f["FIDS"])
        for tag in ("ATTF", "NATF"):
            fld = rec.field(tag)
            if fld is None:
                continue
            for a in fld.values():
                code = a.get("ATTL")
                raw = a.get("ATVL", "")
                if isinstance(raw, bytes):
                    raw = raw.decode("latin-1")
                name, kind = ATTRIBUTES.get(code, (f"ATTL{code}", "S"))
                val = raw.rstrip("\x1f").strip() \
                    if isinstance(raw, str) else raw
                if kind in ("I", "E") and isinstance(val, str):
                    try:
                        val = int(val)
                    except ValueError:
                        pass
                elif kind == "F" and isinstance(val, str):
                    try:
                        val = float(val)
                    except ValueError:
                        pass
                props[name] = val
        pointers = []
        fspt = rec.field("FSPT")
        if fspt is not None:
            for p in fspt.values():
                pointers.append((_name5(p["NAME"]), p.get("ORNT", 1),
                                 p.get("USAG", 1), p.get("MASK", 1)))
        self.features.append({"layer": acronym, "objl": objl,
                              "prim": fr["PRIM"], "props": props,
                              "pointers": pointers})

    # ---------------- geometry assembly ----------------

    def _edge_line(self, key, ornt):
        e = self.edges.get(key)
        if e is None:
            return np.zeros((0, 2))
        pts = [e["coords"]] if len(e["coords"]) else []
        b = self.nodes.get(e["begin"])
        a = self.nodes.get(e["end"])
        parts = []
        if b is not None and len(b):
            parts.append(b[:, :2])
        parts.extend(p[:, :2] for p in pts)
        if a is not None and len(a):
            parts.append(a[:, :2])
        if not parts:
            return np.zeros((0, 2))
        line = np.vstack(parts)
        if ornt == 2:
            line = line[::-1]
        return line

    def feature_geometry(self, feat) -> bytes | None:
        prim = feat["prim"]
        if prim == 1:                       # point / sounding
            for (nm, ornt, usag, mask) in feat["pointers"]:
                node = self.nodes.get(nm)
                if node is None or not len(node):
                    continue
                if node.shape[1] == 3:      # SOUNDG: MultiPoint25D
                    pts = [C.Geom(1, True, coords=node[i:i + 1])
                           for i in range(len(node))]
                    return C.encode_geom(C.Geom(4, True, parts=pts))
                if len(node) > 1:
                    return G.encode_multipoint(node[:, :2])
                return G.encode_point(node[0, 0], node[0, 1])
            return None
        if prim == 2:                       # line: chain edges
            lines = []
            for (nm, ornt, usag, mask) in feat["pointers"]:
                if nm[0] != RCNM_VE:
                    continue
                line = self._edge_line(nm, ornt)
                if len(line) < 2:
                    continue
                if lines and tuple(lines[-1][-1]) == tuple(line[0]):
                    lines[-1] = np.vstack([lines[-1], line[1:]])
                else:
                    lines.append(line)
            if not lines:
                return None
            if len(lines) == 1:
                return G.encode_linestring(lines[0])
            return G.encode_multilinestring(lines)
        if prim == 3:                       # area: build rings
            rings = self._assemble_rings(feat["pointers"])
            if not rings:
                return None
            return G.encode_polygon(rings) if len(rings) >= 1 else None
        return None

    def _assemble_rings(self, pointers):
        # Areas link edges in their natural direction (ORNT is not
        # applied before ring building — s57reader.cpp
        # AssembleAreaGeometry feeds raw edges to
        # OGRBuildPolygonFromEdges, which reverses only as needed
        # while chaining from the first pointer).
        segs = []
        for (nm, ornt, usag, mask) in pointers:
            if nm[0] != RCNM_VE:
                continue
            line = self._edge_line(nm, 1)
            if len(line) >= 2:
                segs.append(line)
        rings = []

        def same(a, b):
            # coordinates are exact XCOO/COMF rationals — junction
            # matching must be exact, not tolerance-based
            return a[0] == b[0] and a[1] == b[1]

        while segs:
            ring = segs.pop(0)
            changed = True
            while changed and not same(ring[0], ring[-1]):
                changed = False
                for i, s in enumerate(segs):
                    if same(ring[-1], s[0]):
                        ring = np.vstack([ring, s[1:]])
                        segs.pop(i)
                        changed = True
                        break
                    if same(ring[-1], s[-1]):
                        ring = np.vstack([ring, s[::-1][1:]])
                        segs.pop(i)
                        changed = True
                        break
            if len(ring) >= 4 and same(ring[0], ring[-1]):
                rings.append(ring)
        if not rings:
            return []
        # outer ring first (largest |area|), holes after
        def ring_area(r):
            x, y = r[:, 0], r[:, 1]
            return 0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
        rings.sort(key=ring_area, reverse=True)
        return rings

    # ---------------- layers ----------------

    def layer_names(self):
        """DSID first, then feature classes by ascending OBJL (the
        reference's registration order)."""
        objls = sorted({f["objl"] for f in self.features})
        return ["DSID"] + [OBJECT_CLASSES.get(o, (f"OBJL{o}",))[0]
                           for o in objls]

    def layer_geom_type(self, name):
        """Single-primitive classes fix a type (Area -> Polygon, Point
        -> Point); Line-only stays Unknown because edges can chain
        into multilinestrings, SOUNDG is MultiPoint25D
        (s57featuredefns.cpp:340-371)."""
        if name == "SOUNDG":
            return "MultiPoint25D"
        for code, (acr, prims) in OBJECT_CLASSES.items():
            if acr == name:
                if prims == ("Area",):
                    return "Polygon"
                if prims == ("Point",):
                    return "Point"
                return "Unknown"
        return "Unknown"

    def layer(self, name):
        """(properties dict, wkb) rows for one layer."""
        if name == "DSID":
            return [(dict(self.dsid), None)]
        out = []
        for f in self.features:
            if f["layer"] != name:
                continue
            out.append((f["props"], self.feature_geometry(f)))
        return out


def open_s57(path: str) -> S57Cell:
    return S57Cell(path)


def read_s57(spark, path: str, layer: str):
    """One layer as the engine's uniform feature frame
    (src, fid, properties-json, wkb)."""
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    cell = open_s57(path)
    rows = []
    src = os.path.basename(path)
    for i, (props, wkb) in enumerate(cell.layer(layer)):
        rows.append((src, i,
                     json.dumps(props, default=str), wkb))
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
