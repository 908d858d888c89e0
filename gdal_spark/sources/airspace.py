"""Airspace vector formats: OpenAir and Tim Newport-Peace SUA —
text airspace descriptions stroked to polygons with the reference's
own spherical formulas (gdal/ogr/ogrsf_frmts/openair/,
gdal/ogr/ogrsf_frmts/sua/, great-circle math from
gdal/ogr/ogrsf_frmts/xplane/ogr_xplane_geo_utils.cpp).

Semantics mirrored exactly:

- arcs/circles step 1 degree of bearing, radius in nautical miles
  (* 1852 m), positions extended along great circles on the
  authalic-style sphere RAD2METER = (180/pi)*60*1852;
- the OpenAir lat/lon scanner keeps stale minute/second parts between
  the latitude and longitude of one token — a reference quirk that
  its own test fixtures depend on (ogr_openair_1's label point);
- OpenAir styles: per-class SP/SB definitions become
  PEN(c:#RRGGBB,w:Npt[,p:"5px 5px"]);BRUSH(fc:#RRGGBB) strings.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from gdal_spark.functions import geometry as G

DEG2RAD = math.pi / 180.0
RAD2DEG = 180.0 / math.pi
RAD2METER = (180.0 / math.pi) * 60.0 * 1852.0
METER2RAD = 1.0 / RAD2METER


def _safe_acos(x):
    return math.acos(min(1.0, max(-1.0, x)))


def gc_distance(lat_a, lon_a, lat_b, lon_b) -> float:
    """Great-circle distance in metres (OGRXPlane_Distance)."""
    cos_p = math.cos((lon_b - lon_a) * DEG2RAD)
    la, lb = lat_a * DEG2RAD, lat_b * DEG2RAD
    cos_angle = (math.sin(la) * math.sin(lb)
                 + math.cos(la) * math.cos(lb) * cos_p)
    return _safe_acos(cos_angle) * RAD2METER


def gc_track(lat_a, lon_a, lat_b, lon_b) -> float:
    """Initial bearing A->B in degrees (OGRXPlane_Track)."""
    if abs(lat_a - 90) < 1e-10 or abs(lat_b + 90) < 1e-10:
        return 180.0
    if abs(lat_a + 90) < 1e-10 or abs(lat_b - 90) < 1e-10:
        return 0.0
    la, lb = lat_a * DEG2RAD, lat_b * DEG2RAD
    diff_g = (lon_a - lon_b) * DEG2RAD
    denom = math.sin(la) * math.cos(diff_g) - math.cos(la) * math.tan(lb)
    track = math.atan(math.sin(diff_g) / denom) * RAD2DEG
    if denom > 0.0:
        track = 180 + track
    elif track < 0:
        track = 360 + track
    return track


def gc_extend(lat_a, lon_a, distance, heading):
    """Position `distance` metres along `heading` from A
    (OGRXPlane_ExtendPosition)."""
    hr = heading * DEG2RAD
    dr = distance * METER2RAD
    cos_d, sin_d = math.cos(dr), math.sin(dr)
    la = lat_a * DEG2RAD
    cos_cla = math.sin(la)
    sin_cla = math.cos(la)
    cos_clb = cos_d * cos_cla + sin_d * sin_cla * math.cos(hr)
    clb = _safe_acos(cos_clb)
    cos_dg = (cos_d - cos_clb * cos_cla) / (math.sin(clb) * sin_cla)
    lat_b = 90 - clb * RAD2DEG
    dg = _safe_acos(cos_dg) * RAD2DEG
    lon_b = lon_a - dg if math.sin(hr) < 0 else lon_a + dg
    if lon_b > 180:
        lon_b -= 360
    elif lon_b <= -180:
        lon_b += 360
    return lat_b, lon_b


def _arc_points(center_lat, center_lon, start_angle, end_angle,
                start_dist, end_dist, clockwise):
    """1-degree-step arc sampling, exclusive of the end angle."""
    if clockwise and end_angle < start_angle:
        end_angle += 360
    elif not clockwise and start_angle < end_angle:
        end_angle -= 360
    sign = 1 if clockwise else -1
    pts = []
    angle = start_angle
    while (angle - end_angle) * sign < 0:
        pct = (angle - start_angle) / (end_angle - start_angle)
        dist = start_dist * (1 - pct) + end_dist * pct
        lat, lon = gc_extend(center_lat, center_lon, dist, angle)
        pts.append((lon, lat))
        angle += sign
    return pts, end_angle


def _circle_points(center_lat, center_lon, radius):
    pts = []
    for angle in range(360):
        lat, lon = gc_extend(center_lat, center_lon, radius, angle)
        pts.append((lon, lat))
    lat, lon = gc_extend(center_lat, center_lon, radius, 0)
    pts.append((lon, lat))
    return pts


# ---------------------------------------------------------------------------
# OpenAir
# ---------------------------------------------------------------------------

def openair_latlon(s: str):
    """The reference's incremental scanner
    (ogropenairdatasource.cpp OGROpenAirGetLatLon) including its
    stale-part carryover between the two coordinates."""
    cur = 0
    exp = 1.0
    has_exp = False
    part = 0                               # 0 deg, 1 min, 2 sec
    deg = mnt = sec = 0.0
    lat = lon = 0.0
    has_lat = has_lon = False
    for c in s:
        if c.isdigit():
            cur = cur * 10 + int(c)
            if has_exp:
                exp *= 10
        elif c == ".":
            has_exp = True
        elif c == ":":
            val = cur / exp
            if part == 0:
                deg = val
            elif part == 1:
                mnt = val
            else:
                sec = val
            part += 1
            cur, exp, has_exp = 0, 1.0, False
        elif c == " ":
            pass
        elif c in "NS":
            val = cur / exp
            if part == 0:
                deg = val
            elif part == 1:
                mnt = val
            else:
                sec = val
            lat = deg + mnt / 60 + sec / 3600
            if c == "S":
                lat = -lat
            cur, exp, has_exp, part = 0, 1.0, False, 0
            has_lat = True
        elif c in "EW":
            val = cur / exp
            if part == 0:
                deg = val
            elif part == 1:
                mnt = val
            else:
                sec = val
            lon = deg + mnt / 60 + sec / 3600
            if c == "W":
                lon = -lon
            has_lon = True
            break
    return (lat, lon) if has_lat and has_lon else None


def _openair_style(style):
    pen_style, pen_w, pr, pg, pb, fr, fg, fb = style
    parts = []
    if pen_style != -1:
        s = f"PEN(c:#{pr:02X}{pg:02X}{pb:02X},w:{pen_w}pt"
        if pen_style == 1:
            s += ',p:"5px 5px"'
        parts.append(s + ")")
    if fr != -1:
        parts.append(f"BRUSH(fc:#{fr:02X}{fg:02X}{fb:02X})")
    else:
        parts.append('BRUSH(fc:#00000000,id:"ogr-brush-1")')
    return ";".join(parts) if (pen_style != -1 or fr != -1) else None


def parse_openair(path: str):
    """(airspaces, labels): airspace rows are (props, style, wkb
    polygon); labels are (props, style, wkb point)."""
    lines = open(path, encoding="latin-1").read().splitlines()
    airspaces = []
    labels = []
    style_map = {}

    cls = name = floor = ceiling = ""
    ring = []
    clockwise = True
    center = None
    style = [-1, -1, -1, -1, -1, -1, -1, -1]

    def flush():
        nonlocal cls, name, floor, ceiling, ring, clockwise, center, style
        if ring:
            st = style
            if (st[0] == -1 and st[5] == -1) and cls in style_map:
                st = style_map[cls]
            if ring[0] != ring[-1]:
                ring.append(ring[0])
            airspaces.append((
                {"CLASS": cls, "NAME": name, "FLOOR": floor,
                 "CEILING": ceiling},
                _openair_style(st),
                G.encode_polygon([np.array(ring)])))
        cls = name = floor = ceiling = ""
        ring = []
        clockwise = True
        center = None
        style = [-1, -1, -1, -1, -1, -1, -1, -1]

    lcls = lname = lfloor = lceiling = ""
    for line in lines:
        if not line or line.startswith("*"):
            continue
        if line.startswith("AC ") or line.startswith("AC,"):
            # style-only AC blocks register the class style
            if cls and not ring and (style[0] != -1 or style[5] != -1):
                style_map[cls] = list(style)
                cls = line[3:]
                style = [-1, -1, -1, -1, -1, -1, -1, -1]
                clockwise, center = True, None
                continue
            if cls:
                flush()
            cls = line[3:]
            lcls = line[3:]
        elif line.startswith("AN "):
            name = line[3:]
            lname = line[3:]
        elif line.startswith("AH "):
            ceiling = line[3:]
            lceiling = line[3:]
        elif line.startswith("AL "):
            floor = line[3:]
            lfloor = line[3:]
        elif line.startswith("AT "):
            ll = openair_latlon(line[3:])
            if ll:
                labels.append((
                    {"CLASS": lcls, "NAME": lname, "FLOOR": lfloor,
                     "CEILING": lceiling},
                    f'LABEL(t:"{lname}")',
                    G.encode_point(ll[1], ll[0])))
        elif line.startswith("SP "):
            tok = line[3:].replace(",", " ").split()
            if len(tok) == 5:
                style[0:5] = [int(t) for t in tok]
        elif line.startswith("SB "):
            tok = line[3:].replace(",", " ").split()
            if len(tok) == 3:
                style[5:8] = [int(t) for t in tok]
        elif line.startswith("DP "):
            ll = openair_latlon(line[3:])
            if ll:
                ring.append((ll[1], ll[0]))
        elif line.startswith("DA ") and center:
            body = line[3:].split("*")[0]
            tok = body.split(",")
            if len(tok) == 3:
                radius = float(tok[0]) * 1852
                pts, end = _arc_points(center[0], center[1],
                                       float(tok[1]), float(tok[2]),
                                       radius, radius, clockwise)
                ring.extend(pts)
                lat, lon = gc_extend(center[0], center[1], radius, end)
                ring.append((lon, lat))
        elif line.startswith("DB ") and center:
            body = line[3:].split("*")[0]
            tok = body.split(",")
            if len(tok) == 2:
                f = openair_latlon(tok[0])
                s = openair_latlon(tok[1])
                if f and s:
                    sd = gc_distance(center[0], center[1], f[0], f[1])
                    ed = gc_distance(center[0], center[1], s[0], s[1])
                    sa = gc_track(center[0], center[1], f[0], f[1])
                    ea = gc_track(center[0], center[1], s[0], s[1])
                    pts, _ = _arc_points(center[0], center[1], sa, ea,
                                         sd, ed, clockwise)
                    ring.extend(pts)
                    ring.append((s[1], s[0]))
        elif line.startswith("DC ") or line.startswith("DC="):
            if not center and "V X=" in line:
                center = openair_latlon(line[line.index("V X=") + 4:])
            if center:
                radius = float(line[3:].split("*")[0]) * 1852
                ring.extend(_circle_points(center[0], center[1], radius))
        elif line.startswith("V X="):
            center = openair_latlon(line[4:])
        elif line.startswith("V D=-"):
            clockwise = False
        elif line.startswith("V D=+"):
            clockwise = True
    flush()
    return airspaces, labels


# ---------------------------------------------------------------------------
# SUA (Tim Newport-Peace special use airspace)
# ---------------------------------------------------------------------------

def _sua_latlon(s: str):
    """Fixed NDDMMSS EDDDMMSS pair (ogrsualayer.cpp GetLatLon)."""
    if len(s) < 16 or s[7] != " " or s[0] not in "NS" or s[8] not in "EW":
        return None
    lat = int(s[1:3]) + int(s[3:5]) / 60.0 + int(s[5:7]) / 3600.0
    if s[0] == "S":
        lat = -lat
    lon = int(s[9:12]) + int(s[12:14]) / 60.0 + int(s[14:16]) / 3600.0
    if s[8] == "W":
        lon = -lon
    return lat, lon


def parse_sua(path: str):
    """(props, wkb polygon) rows: TYPE/CLASS/TITLE/TOPS/BASE fields,
    POINT/CLOCKWISE/ANTI-CLOCKWISE/CIRCLE geometry directives."""
    out = []
    typ = cls = title = tops = base = ""
    ring = []
    last = None

    def flush():
        nonlocal typ, cls, title, tops, base, ring, last
        if ring:
            if ring[0] != ring[-1]:
                ring.append(ring[0])
            out.append(({"TYPE": typ, "CLASS": cls, "TITLE": title,
                         "TOPS": tops, "BASE": base},
                        G.encode_polygon([np.array(ring)])))
        typ = cls = title = tops = base = ""
        ring = []
        last = None

    for line in open(path, encoding="latin-1").read().splitlines():
        if not line or line.startswith("#"):
            continue
        if line.startswith("TYPE="):
            if typ:
                flush()
            typ = line[5:]
        elif line.startswith("CLASS="):
            if cls:
                flush()
            cls = line[6:]
        elif line.startswith("TITLE="):
            if title:
                flush()
            title = line[6:]
        elif line.startswith("TOPS="):
            tops = line[5:]
        elif line.startswith("BASE="):
            base = line[5:]
        elif line.startswith("POINT="):
            ll = _sua_latlon(line[6:])
            if ll:
                ring.append((ll[1], ll[0]))
                last = ll
        elif line.startswith("CLOCKWISE") or line.startswith(
                "ANTI-CLOCKWISE"):
            if not ring or last is None:
                continue
            clockwise = line.startswith("CLOCKWISE")
            try:
                centre = _sua_latlon(
                    line[line.index("CENTRE=") + 7:])
                to = _sua_latlon(line[line.index("TO=") + 3:])
            except ValueError:
                continue
            if not centre or not to:
                continue
            sd = gc_distance(centre[0], centre[1], last[0], last[1])
            ed = gc_distance(centre[0], centre[1], to[0], to[1])
            sa = gc_track(centre[0], centre[1], last[0], last[1])
            ea = gc_track(centre[0], centre[1], to[0], to[1])
            pts, _ = _arc_points(centre[0], centre[1], sa, ea, sd, ed,
                                 clockwise)
            ring.extend(pts)
            ring.append((to[1], to[0]))
            last = to
        elif line.startswith("CIRCLE"):
            try:
                radius = float(
                    line[line.index("RADIUS=") + 7:].split()[0]) * 1852
                centre = _sua_latlon(line[line.index("CENTRE=") + 7:])
            except ValueError:
                continue
            if not centre:
                continue
            ring.extend(_circle_points(centre[0], centre[1], radius))
            last = _sua_latlon(line[line.index("CENTRE=") + 7:])
    flush()
    return out


def read_openair(spark, path: str, layer: str = "airspaces"):
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    airspaces, labels = parse_openair(path)
    rows = []
    src = os.path.basename(path)
    feats = airspaces if layer == "airspaces" else labels
    for i, (props, style, wkb) in enumerate(feats):
        if style:
            props = {**props, "OGR_STYLE": style}
        rows.append((src, i, json.dumps(props), wkb))
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def read_sua(spark, path: str):
    from gdal_spark.sources.formats import FEATURE_SCHEMA
    rows = [(os.path.basename(path), i, json.dumps(props), wkb)
            for i, (props, wkb) in enumerate(parse_sua(path))]
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
