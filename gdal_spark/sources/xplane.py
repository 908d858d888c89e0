"""X-Plane / Flightgear aviation data reader (apt.dat, nav.dat,
awy.dat, fix.dat), mirroring gdal/ogr/ogrsf_frmts/xplane/:

- apt.dat (v810/850/1000 row codes, ogr_xplane_apt_reader.cpp):
  airports (code 1/16/17) with tower/first-runway anchor points,
  850 runways (100 -> RunwayPolygon + 2 RunwayThreshold + extra
  non-displaced thresholds + Stopway per non-zero stopway), water
  runways (101), helipads (102), v810 code-10 rows routed to
  taxiway rectangles / runways / water runways / helipads, pavement
  (110 + node codes 111-116 with quadratic/cubic bezier stroking at
  10 steps), boundary (130), linear features (120), tower (14),
  startup locations (15), light beacons (18), windsocks (19),
  taxiway signs (20), VASI/PAPI/WIGWAG (21), ATC frequencies
  (50-56);
- nav.dat codes 2 NDB / 3 VOR / 4,5 ILS / 6 GS / 7,8,9 markers /
  12,13 DME (DME-ILS split out);
- awy.dat airway segments ('-'-joined names fan out) +
  deduplicated intersections; fix.dat fixes.

All rectangle/polygon constructions use the same great-circle
extension math as the reference (gdal_spark.sources.airspace).
"""

from __future__ import annotations

import json
import os

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.sources.airspace import gc_distance, gc_extend, gc_track

FEET_TO_METER = 0.3048

APT_LAYERS = ["APT", "RunwayPolygon", "RunwayThreshold", "Stopway",
              "WaterRunwayPolygon", "WaterRunwayThreshold", "Helipad",
              "HelipadPolygon", "TaxiwayRectangle", "Pavement",
              "APTBoundary", "APTLinearFeature", "ATCFreq",
              "StartupLocation", "APTLightBeacon", "APTWindsock",
              "TaxiwaySign", "VASI_PAPI_WIGWAG"]

_ATC_TYPES = {50: "ATIS", 51: "CTAF", 52: "CLD", 53: "GND", 54: "TWR",
              55: "APP", 56: "DEP"}


def _rectangle(lat, lon, heading, length, width):
    """Polygon ring for a rectangle centered at (lat, lon)."""
    lat0, lon0 = gc_extend(lat, lon, length / 2, heading + 180)
    lat1, lon1 = gc_extend(lat, lon, length / 2, heading)
    return _rwy_polygon(lat0, lon0, lat1, lon1, width)


def _rwy_polygon(lat_a, lon_a, lat_b, lon_b, width):
    """Runway polygon ring from the two threshold centers + width."""
    trk = gc_track(lat_a, lon_a, lat_b, lon_b)
    c1 = gc_extend(lat_a, lon_a, width / 2, trk - 90)
    c2 = gc_extend(lat_a, lon_a, width / 2, trk + 90)
    trk2 = gc_track(lat_b, lon_b, lat_a, lon_a)
    c3 = gc_extend(lat_b, lon_b, width / 2, trk2 - 90)
    c4 = gc_extend(lat_b, lon_b, width / 2, trk2 + 90)
    ring = np.array([(c1[1], c1[0]), (c2[1], c2[0]),
                     (c3[1], c3[0]), (c4[1], c4[0]), (c1[1], c1[0])])
    return G.encode_polygon([ring])


def _pt(lat, lon):
    return G.encode_point(lon, lat)


def _bezier_quad(out, a, ctrl, b):
    for step in range(11):
        t = step / 10.0
        s = 1.0 - t
        out.append((a[1] * s * s + 2 * ctrl[1] * s * t + b[1] * t * t,
                    a[0] * s * s + 2 * ctrl[0] * s * t + b[0] * t * t))


def _bezier_cubic(out, a, ctrl_a, sym_ctrl_b, b):
    ctrl_b = (b[0] - (sym_ctrl_b[0] - b[0]), b[1] - (sym_ctrl_b[1] - b[1]))
    for step in range(11):
        t = step / 10.0
        s = 1.0 - t
        out.append((
            a[1] * s ** 3 + 3 * ctrl_a[1] * s * s * t
            + 3 * ctrl_b[1] * s * t * t + b[1] * t ** 3,
            a[0] * s ** 3 + 3 * ctrl_a[0] * s * s * t
            + 3 * ctrl_b[0] * s * t * t + b[0] * t ** 3))


class _NodeMachine:
    """Shared 111-116 node state machine (ParsePolygonalGeometry /
    ParseLinearGeometry)."""

    def __init__(self):
        self.parts = []          # closed rings / ended line parts
        self.cur = []            # (lon, lat) accumulating
        self.first = None
        self.first_bezier = None
        self.last = None
        self.last_bezier = None
        self.is_first = True
        self.last_is_bezier = False
        self.closed = False

    def feed(self, code, tok):
        """Returns False when `tok` is not a node row (caller re-scans)."""
        if code == 111:
            ll = (float(tok[1]), float(tok[2]))
            if self.last_is_bezier and not self.is_first and ll != self.last:
                _bezier_quad(self.cur, self.last, self.last_bezier, ll)
            else:
                self.cur.append((ll[1], ll[0]))
            self._step(ll, None, closed=False)
        elif code == 112:
            ll = (float(tok[1]), float(tok[2]))
            bz = (float(tok[3]), float(tok[4]))
            if self.last_is_bezier:
                _bezier_cubic(self.cur, self.last, self.last_bezier, bz, ll)
            elif not self.is_first and ll != self.last:
                ctrl = (ll[0] - (bz[0] - ll[0]), ll[1] - (bz[1] - ll[1]))
                _bezier_quad(self.cur, self.last, ctrl, ll)
            self._step(ll, bz, closed=False, bezier=True)
        elif code in (113, 115):
            ll = (float(tok[1]), float(tok[2]))
            if self.is_first:
                return True
            if self.last_is_bezier and ll != self.last:
                _bezier_quad(self.cur, self.last, self.last_bezier, ll)
            else:
                self.cur.append((ll[1], ll[0]))
            self._close(ll, None, ring=(code == 113))
        elif code in (114, 116):
            ll = (float(tok[1]), float(tok[2]))
            bz = (float(tok[3]), float(tok[4]))
            if self.is_first:
                return True
            if self.last_is_bezier:
                _bezier_cubic(self.cur, self.last, self.last_bezier, bz, ll)
            elif ll != self.last:
                ctrl = (ll[0] - (bz[0] - ll[0]), ll[1] - (bz[1] - ll[1]))
                _bezier_quad(self.cur, self.last, ctrl, ll)
            else:
                self.cur.append((ll[1], ll[0]))
            if code == 114 and self.first_bezier is not None:
                _bezier_cubic(self.cur, ll, bz, self.first_bezier,
                              self.first)
            self._close(ll, bz, ring=(code == 114))
        else:
            return False
        return True

    def _step(self, ll, bz, closed, bezier=False):
        if self.is_first:
            self.first = ll
            self.first_bezier = bz if bezier else None
        self.is_first = False
        self.last = ll
        self.last_bezier = bz
        self.last_is_bezier = bezier
        self.closed = closed

    def _close(self, ll, bz, ring):
        if self.cur:
            pts = self.cur
            if ring and pts[0] != pts[-1]:
                pts = pts + [pts[0]]
            self.parts.append(np.array(pts))
        self.cur = []
        self.is_first = True
        self.last_is_bezier = False
        self.closed = True

    def polygons(self):
        """Split rings into polygons: first ring exterior; later rings
        are holes when inside it, otherwise start new polygons
        (FixPolygonTopology + organizePolygons, simplified)."""
        from gdal_spark.functions.geometry import py_point_in_ring as point_in_ring
        polys = []
        for ring in self.parts:
            if len(ring) < 4:
                continue
            placed = False
            if polys:
                ext = polys[0][0]
                try:
                    inside = point_in_ring(ring[0, 0], ring[0, 1], ext)
                except Exception:
                    inside = False
                if inside:
                    polys[0].append(ring)
                    placed = True
            if not placed:
                polys.append([ring])
        return polys


def parse_apt(path: str):
    """{layer: [(props, wkb)]} for one apt.dat file."""
    layers = {name: [] for name in APT_LAYERS}
    apt = {"icao": None}
    tower = {}
    first_rwy = {}

    def flush_apt():
        if apt["icao"] is None:
            return
        anchor = tower.get("ll") or first_rwy.get("ll")
        wkb = _pt(*anchor) if anchor else None
        layers["APT"].append((
            {"apt_icao": apt["icao"], "apt_name": apt["name"],
             "type": apt["type"], "elevation_m": apt["elev"],
             "has_tower": bool(tower)}, wkb))
        apt["icao"] = None
        tower.clear()
        first_rwy.clear()

    def note_rwy(lat, lon):
        if "ll" not in first_rwy:
            first_rwy["ll"] = (lat, lon)

    fh = open(path, encoding="latin-1", errors="replace")
    pending = None
    while True:
        line = pending if pending is not None else fh.readline()
        pending = None
        if line == "":
            break
        tok = line.split()
        if not tok or len(tok) < 1:
            continue
        if tok[0] == "99":
            break
        if len(tok) < 2:
            continue
        try:
            code = int(tok[0])
        except ValueError:
            continue
        icao = apt["icao"]

        if code in (1, 16, 17):
            flush_apt()
            apt.update(icao=tok[4], name=" ".join(tok[5:]), type=code,
                       elev=float(tok[1]) * FEET_TO_METER)
        elif code == 10:                     # v810 runway/taxiway
            lat, lon = float(tok[1]), float(tok[2])
            num = tok[3]
            heading = float(tok[4])
            length = float(tok[5]) * FEET_TO_METER
            displaced = [float(tok[6].split(".")[0]) * FEET_TO_METER,
                         float(tok[6].split(".")[1]) * FEET_TO_METER
                         if "." in tok[6] else 0.0]
            stopway = [float(tok[7].split(".")[0]) * FEET_TO_METER,
                       float(tok[7].split(".")[1]) * FEET_TO_METER
                       if "." in tok[7] else 0.0]
            width = float(tok[8]) * FEET_TO_METER
            codes6 = tok[9] if len(tok[9]) == 6 else "000000"
            lighting = [int(codes6[1]), int(codes6[4])]
            approach = [int(codes6[2]), int(codes6[5])]
            surface = int(tok[10])
            vgpa = [0.0, 0.0]
            if len(tok) >= 16:
                p = tok[15].split(".")
                vgpa[0] = int(p[0]) / 100.0
                vgpa[1] = int(p[1]) / 100.0 if len(p) > 1 else 0.0
            if num == "xxx":
                layers["TaxiwayRectangle"].append((
                    {"apt_icao": icao, "true_heading": heading,
                     "length_m": length, "width_m": width},
                    _rectangle(lat, lon, heading, length, width)))
            elif num[0].isdigit() and len(num) >= 2:
                n1 = int(num[:2])
                n2 = n1 - 18 if n1 > 18 else n1 + 18
                if len(num) > 2 and num[2] not in ("0", "x"):
                    ids = [num, "%02d%s" % (n2, {"L": "R", "R": "L"}
                                            .get(num[2], num[2]))]
                else:
                    ids = ["%02d" % n1, "%02d" % n2]
                ll0 = gc_extend(lat, lon, length / 2, heading + 180)
                ll1 = gc_extend(lat, lon, length / 2, heading)
                note_rwy(*ll0)
                ends = [ll0, ll1]
                if apt["type"] == 16 or surface == 13:
                    for i in range(2):
                        layers["WaterRunwayThreshold"].append((
                            {"apt_icao": icao, "rwy_num": ids[i],
                             "width_m": width}, _pt(*ends[i])))
                    layers["WaterRunwayPolygon"].append((
                        {"apt_icao": icao, "rwy_num1": ids[0],
                         "rwy_num2": ids[1], "width_m": width},
                        _rwy_polygon(ll0[0], ll0[1], ll1[0], ll1[1],
                                     width)))
                else:
                    for i in range(2):
                        layers["RunwayThreshold"].append((
                            {"apt_icao": icao, "rwy_num": ids[i],
                             "width_m": width,
                             "displaced_threshold_m": displaced[i]},
                            _pt(*ends[i])))
                        if displaced[i] != 0:
                            trk = gc_track(*ends[i], *ends[1 - i])
                            nd = gc_extend(*ends[i], displaced[i], trk)
                            layers["RunwayThreshold"].append((
                                {"apt_icao": icao, "rwy_num": ids[i],
                                 "width_m": width, "is_displaced": True},
                                _pt(*nd)))
                        if stopway[i] != 0:
                            layers["Stopway"].append((
                                {"apt_icao": icao, "rwy_num": ids[i],
                                 "stopway_length_m": stopway[i]},
                                _pt(*ends[i])))
                        if approach[i]:
                            layers["VASI_PAPI_WIGWAG"].append((
                                {"apt_icao": icao, "rwy_num": ids[i],
                                 "vgpa": vgpa[i]}, _pt(*ends[i])))
                    layers["RunwayPolygon"].append((
                        {"apt_icao": icao, "rwy_num1": ids[0],
                         "rwy_num2": ids[1], "width_m": width},
                        _rwy_polygon(ll0[0], ll0[1], ll1[0], ll1[1],
                                     width)))
            elif num[0] == "H":
                name = num[:2] if len(num) == 3 and num[2] == "x" else num
                note_rwy(lat, lon)
                props = {"apt_icao": icao, "helipad_name": name,
                         "true_heading": heading, "length_m": length,
                         "width_m": width}
                layers["Helipad"].append((props, _pt(lat, lon)))
                layers["HelipadPolygon"].append((
                    dict(props),
                    _rectangle(lat, lon, heading, length, width)))
        elif code == 100:                    # 850 land runway
            width = float(tok[1])
            ids, lls, disp, stop = [], [], [], []
            for i, base in enumerate((8, 17)):
                ids.append(tok[base])
                lls.append((float(tok[base + 1]), float(tok[base + 2])))
                disp.append(float(tok[base + 3]))
                stop.append(float(tok[base + 4]))
            note_rwy(*lls[0])
            for i in range(2):
                layers["RunwayThreshold"].append((
                    {"apt_icao": icao, "rwy_num": ids[i],
                     "width_m": width,
                     "displaced_threshold_m": disp[i]}, _pt(*lls[i])))
            for i in range(2):
                if disp[i] != 0:
                    trk = gc_track(*lls[i], *lls[1 - i])
                    nd = gc_extend(*lls[i], disp[i], trk)
                    layers["RunwayThreshold"].append((
                        {"apt_icao": icao, "rwy_num": ids[i],
                         "width_m": width, "is_displaced": True},
                        _pt(*nd)))
            layers["RunwayPolygon"].append((
                {"apt_icao": icao, "rwy_num1": ids[0], "rwy_num2": ids[1],
                 "width_m": width},
                _rwy_polygon(lls[0][0], lls[0][1], lls[1][0], lls[1][1],
                             width)))
            for i in range(2):
                if stop[i] != 0:
                    layers["Stopway"].append((
                        {"apt_icao": icao, "rwy_num": ids[i],
                         "stopway_length_m": stop[i]}, _pt(*lls[i])))
        elif code == 101:                    # water runway
            width = float(tok[1])
            ids = [tok[3], tok[6]]
            lls = [(float(tok[4]), float(tok[5])),
                   (float(tok[7]), float(tok[8]))]
            note_rwy(*lls[0])
            for i in range(2):
                layers["WaterRunwayThreshold"].append((
                    {"apt_icao": icao, "rwy_num": ids[i],
                     "width_m": width}, _pt(*lls[i])))
            layers["WaterRunwayPolygon"].append((
                {"apt_icao": icao, "rwy_num1": ids[0], "rwy_num2": ids[1],
                 "width_m": width},
                _rwy_polygon(lls[0][0], lls[0][1], lls[1][0], lls[1][1],
                             width)))
        elif code == 102:                    # helipad
            name = tok[1]
            lat, lon = float(tok[2]), float(tok[3])
            heading, length, width = (float(tok[4]), float(tok[5]),
                                      float(tok[6]))
            note_rwy(lat, lon)
            props = {"apt_icao": icao, "helipad_name": name,
                     "true_heading": heading, "length_m": length,
                     "width_m": width}
            layers["Helipad"].append((props, _pt(lat, lon)))
            layers["HelipadPolygon"].append((
                dict(props), _rectangle(lat, lon, heading, length, width)))
        elif code in (110, 120, 130):        # noded geometries
            if code == 110:
                header = {"apt_icao": icao,
                          "name": " ".join(tok[4:]) if len(tok) > 4 else ""}
            else:
                start = 1 if code == 120 else 2
                header = {"apt_icao": icao,
                          "name": " ".join(tok[start:])}
            nm = _NodeMachine()
            while True:
                nline = fh.readline()
                if nline == "":
                    break
                ntok = nline.split()
                if not ntok:
                    continue
                try:
                    ncode = int(ntok[0])
                except ValueError:
                    continue
                if not nm.feed(ncode, ntok):
                    pending = nline
                    break
            if nm.cur:                      # unterminated part
                nm._close(nm.last, None, ring=False)
            if code == 110:
                for rings in nm.polygons():
                    layers["Pavement"].append((dict(header),
                                               G.encode_polygon(rings)))
            elif code == 130:
                polys = nm.polygons()
                if polys:
                    layers["APTBoundary"].append((
                        dict(header), G.encode_polygon(polys[0])))
            else:
                parts = [p for p in nm.parts if len(p) >= 2]
                if parts:
                    wkb = (G.encode_linestring(parts[0]) if len(parts) == 1
                           else G.encode_multilinestring(parts))
                    layers["APTLinearFeature"].append((dict(header), wkb))
        elif code == 14:
            tower["ll"] = (float(tok[1]), float(tok[2]))
            tower["height"] = float(tok[3]) * FEET_TO_METER
        elif code == 15:
            layers["StartupLocation"].append((
                {"apt_icao": icao, "name": " ".join(tok[4:]),
                 "true_heading": float(tok[3])},
                _pt(float(tok[1]), float(tok[2]))))
        elif code == 18:
            layers["APTLightBeacon"].append((
                {"apt_icao": icao, "name": " ".join(tok[4:]),
                 "color": int(tok[3])},
                _pt(float(tok[1]), float(tok[2]))))
        elif code == 19:
            layers["APTWindsock"].append((
                {"apt_icao": icao, "name": " ".join(tok[4:]),
                 "is_illuminated": bool(int(tok[3]))},
                _pt(float(tok[1]), float(tok[2]))))
        elif code == 20:
            layers["TaxiwaySign"].append((
                {"apt_icao": icao, "text": tok[6] if len(tok) > 6 else "",
                 "true_heading": float(tok[3])},
                _pt(float(tok[1]), float(tok[2]))))
        elif code == 21:
            layers["VASI_PAPI_WIGWAG"].append((
                {"apt_icao": icao, "rwy_num": tok[6] if len(tok) > 6
                 else "", "type": int(tok[3]),
                 "true_heading": float(tok[4])},
                _pt(float(tok[1]), float(tok[2]))))
        elif 50 <= code <= 56:
            layers["ATCFreq"].append((
                {"apt_icao": icao, "atc_type": _ATC_TYPES.get(code, ""),
                 "freq_name": " ".join(tok[2:]),
                 "freq_mhz": float(tok[1]) / 100.0}, None))
    flush_apt()
    fh.close()
    return layers


def parse_nav(path: str):
    layers = {n: [] for n in ("ILS", "VOR", "NDB", "GS", "Marker",
                              "DME", "DMEILS")}
    for line in open(path, encoding="latin-1", errors="replace"):
        tok = line.split()
        if len(tok) < 9 or not tok[0].isdigit():
            continue
        code = int(tok[0])
        if code not in (2, 3, 4, 5, 6, 7, 8, 9, 12, 13):
            continue
        try:
            lat, lon = float(tok[1]), float(tok[2])
        except ValueError:
            continue
        if not (-90 <= lat <= 90 and -180 <= lon <= 180):
            continue                         # readLatLon bounds failure
        if code == 2:
            layers["NDB"].append((
                {"navaid_id": tok[7], "navaid_name": " ".join(tok[8:-1]),
                 "subtype": tok[-1]}, _pt(lat, lon)))
        elif code == 3:
            layers["VOR"].append((
                {"navaid_id": tok[7], "navaid_name": " ".join(tok[8:-1]),
                 "subtype": tok[-1]}, _pt(lat, lon)))
        elif code in (4, 5):
            layers["ILS"].append((
                {"navaid_id": tok[7], "apt_icao": tok[8],
                 "rwy_num": tok[9], "subtype": tok[10]}, _pt(lat, lon)))
        elif code == 6:
            layers["GS"].append((
                {"navaid_id": tok[7], "apt_icao": tok[8],
                 "rwy_num": tok[9]}, _pt(lat, lon)))
        elif code in (7, 8, 9):
            layers["Marker"].append((
                {"apt_icao": tok[8], "rwy_num": tok[9],
                 "subtype": {7: "OM", 8: "MM", 9: "IM"}[code]},
                _pt(lat, lon)))
        elif code in (12, 13):
            if tok[-1] == "DME-ILS":
                layers["DMEILS"].append((
                    {"navaid_id": tok[7], "apt_icao": tok[8],
                     "rwy_num": tok[9]}, _pt(lat, lon)))
            else:
                layers["DME"].append((
                    {"navaid_id": tok[7],
                     "navaid_name": " ".join(tok[8:-1]),
                     "subtype": tok[-1]}, _pt(lat, lon)))
    return layers


def parse_awy(path: str):
    segments = []
    inters = {}
    for line in open(path, encoding="latin-1", errors="replace"):
        tok = line.split()
        if len(tok) < 10 or tok[0] in ("I", "99") or not tok[1].replace(
                ".", "").replace("-", "").isdigit():
            continue
        p1, p2 = tok[0], tok[3]
        lat1, lon1 = float(tok[1]), float(tok[2])
        lat2, lon2 = float(tok[4]), float(tok[5])
        names = tok[9].split("-") if "-" in tok[9] else [tok[9]]
        for name in names:
            segments.append((
                {"segment_name": name, "point1_name": p1,
                 "point2_name": p2, "is_high": int(tok[6]) == 2,
                 "base_FL": int(tok[7]), "top_FL": int(tok[8])},
                G.encode_linestring(np.array([(lon1, lat1),
                                              (lon2, lat2)]))))
        for nm, lat, lon in ((p1, lat1, lon1), (p2, lat2, lon2)):
            inters.setdefault((nm, lat, lon), ({"name": nm},
                                               _pt(lat, lon)))
    return {"AirwaySegment": segments,
            "AirwayIntersection": list(inters.values())}


def parse_fix(path: str):
    out = []
    for line in open(path, encoding="latin-1", errors="replace"):
        tok = line.split()
        if len(tok) != 3 or tok[0] in ("I", "99"):
            continue
        try:
            lat, lon = float(tok[0]), float(tok[1])
        except ValueError:
            continue
        out.append(({"fix_name": tok[2]}, _pt(lat, lon)))
    return {"FIX": out}


def open_xplane(path: str):
    """{layer: [(props, wkb)]} keyed by file kind."""
    base = os.path.basename(path).lower()
    if base.startswith("apt"):
        return parse_apt(path)
    if base.startswith("nav"):
        return parse_nav(path)
    if base.startswith("awy"):
        return parse_awy(path)
    if base.startswith("fix"):
        return parse_fix(path)
    raise ValueError(f"unrecognized x-plane file {base!r}")


def read_xplane(spark, path: str, layer: str):
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    feats = open_xplane(path)[layer]
    src = os.path.basename(path)
    rows = [(src, i, json.dumps(props), wkb)
            for i, (props, wkb) in enumerate(feats)]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
