"""Arc/Info coverage reader: E00 interchange (ASCII) and binary AVC
coverages, per the public AVCE00 format notes the reference builds on
(gdal/ogr/ogrsf_frmts/avc/, http://avce00.maptools.org/docs/
v7_e00_cover.html Annex A — the autotest sample's source):

- E00: EXP header, then sections (ARC, LAB, PAL, CNT, TOL, ...) with
  a precision flag (2 = single, 3 = double); ARC records are
  (arc#, userid, fnode, tnode, lpoly, rpoly, npts) + coordinate
  pairs, terminated by the arc# = -1 sentinel;
- binary coverage directory: arc.adf / lab.adf / tol.adf with the
  0x0000270A magic, 100-byte header, and big-endian records
  (id, length-in-shorts, payload) — single-precision coverages store
  coordinates as big-endian float32.

Layers mirror the reference driver: ARC (linestrings), LAB (label
points), TOL (tolerances, no geometry).
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from gdal_spark.functions import geometry as G


# ---------------------------------------------------------------------------
# E00 (ASCII interchange)
# ---------------------------------------------------------------------------

def parse_e00(path: str):
    lines = open(path, encoding="latin-1", errors="replace").read() \
        .splitlines()
    if not lines or not lines[0].startswith("EXP"):
        raise ValueError("not an E00 interchange file")
    if "compressed" in lines[0] or lines[0].split()[1] == "1":
        raise ValueError("compressed E00 not supported (the reference "
                         "rejects it too)")
    layers = {"ARC": [], "LAB": [], "TOL": []}
    i = 1
    n = len(lines)
    while i < n:
        tok = lines[i].split()
        if not tok:
            i += 1
            continue
        section = tok[0]
        if section == "EOX":
            break
        if section == "ARC" and len(tok) == 2:
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if len(hdr) < 7:
                    continue
                arc_no = int(hdr[0])
                if arc_no == -1:
                    break
                userid, fnode, tnode, lpoly, rpoly, npts = \
                    (int(x) for x in hdr[1:7])
                coords = []
                while len(coords) < npts * 2:
                    coords.extend(float(x) for x in lines[i].split())
                    i += 1
                pts = np.array(coords).reshape(-1, 2)[:npts]
                layers["ARC"].append((
                    {"ArcId": arc_no, "UserID": userid, "FNODE": fnode,
                     "TNODE": tnode, "LPOLY": lpoly, "RPOLY": rpoly},
                    G.encode_linestring(pts)))
        elif section == "LAB" and len(tok) == 2:
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if len(hdr) < 4:
                    continue
                lab_no = int(hdr[0])
                if lab_no == -1:
                    break
                poly_id = int(hdr[1])
                x, y = float(hdr[2]), float(hdr[3])
                i += 1                       # box line (2 corner pairs)
                layers["LAB"].append((
                    {"LabelId": lab_no, "PolyId": poly_id},
                    G.encode_point(x, y)))
        elif section == "TOL" and len(tok) == 2:
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if len(hdr) < 3:
                    continue
                tol_no = int(hdr[0])
                if tol_no == -1:
                    break
                layers["TOL"].append((
                    {"TolId": tol_no, "TolFlag": int(hdr[1]),
                     "TolValue": float(hdr[2])}, None))
        else:
            i += 1
    return layers


# ---------------------------------------------------------------------------
# Binary coverage
# ---------------------------------------------------------------------------

MAGIC = 0x0000270A
HEADER = 100


def _records(data: bytes):
    """(rec_id, payload bytes) big-endian records after the header."""
    pos = HEADER
    n = len(data)
    while pos + 8 <= n:
        rec_id, n_shorts = struct.unpack_from(">ii", data, pos)
        size = n_shorts * 2
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) < size:
            return
        yield rec_id, payload
        pos += 8 + size


def parse_avc(cover_dir: str):
    """Binary coverage directory -> same layer dict as parse_e00."""
    def member(name):
        p = os.path.join(cover_dir, name)
        if os.path.exists(p):
            return p
        for f in os.listdir(cover_dir):
            if f.lower() == name:
                return os.path.join(cover_dir, f)
        return None

    layers = {"ARC": [], "LAB": [], "TOL": []}
    arc = member("arc.adf")
    if arc:
        data = open(arc, "rb").read()
        if struct.unpack_from(">i", data, 0)[0] != MAGIC:
            raise ValueError("bad arc.adf magic")
        for rec_id, p in _records(data):
            userid, fnode, tnode, lpoly, rpoly, npts = \
                struct.unpack_from(">6i", p, 0)
            pts = np.frombuffer(p, ">f4", npts * 2, 24) \
                .astype(np.float64).reshape(-1, 2)
            layers["ARC"].append((
                {"ArcId": rec_id, "UserID": userid, "FNODE": fnode,
                 "TNODE": tnode, "LPOLY": lpoly, "RPOLY": rpoly},
                G.encode_linestring(pts)))
    lab = member("lab.adf")
    if lab:
        # fixed 32-byte records: id, polyid, center + box (3 f4 pairs)
        data = open(lab, "rb").read()
        pos = HEADER
        while pos + 32 <= len(data):
            rec_id, poly_id = struct.unpack_from(">2i", data, pos)
            x, y = struct.unpack_from(">2f", data, pos + 8)
            layers["LAB"].append((
                {"LabelId": rec_id, "PolyId": poly_id},
                G.encode_point(float(x), float(y))))
            pos += 32
    tol = member("tol.adf")
    if tol:
        # headerless fixed 12-byte records: id, flag, f4 value
        data = open(tol, "rb").read()
        pos = 0
        while pos + 12 <= len(data):
            rec_id, flag = struct.unpack_from(">2i", data, pos)
            val = struct.unpack_from(">f", data, pos + 8)[0]
            layers["TOL"].append((
                {"TolId": rec_id, "TolFlag": flag,
                 "TolValue": float(val)}, None))
            pos += 12
    return layers


def open_avc(path: str):
    if os.path.isdir(path):
        return parse_avc(path)
    return parse_e00(path)


def read_avc(spark, path: str, layer: str):
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    feats = open_avc(path)[layer]
    src = os.path.basename(os.path.normpath(path))
    rows = [(src, i, json.dumps(props), wkb)
            for i, (props, wkb) in enumerate(feats)]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
