"""Z (2.5-D) and ISO SQL/MM curve geometry support.

Extends the engine's 2-D linear WKB/WKT codec (functions/geometry.py) with
the reference's full geometry-type surface (gdal/ogr/ogr_core.h:309-369):

- Z coordinates on the seven linear types, encoded old-OGC style with the
  ``wkb25DBit`` high bit (0x80000001..0x80000007) on export and accepted in
  both the 25D-bit and ISO (+1000) spellings on import, mirroring
  ``OGRGeometry::exportToWkb(wkbVariantOldOgc)`` /
  ``createFromWkb``.
- The five ISO curve types CircularString(8) / CompoundCurve(9) /
  CurvePolygon(10) / MultiCurve(11) / MultiSurface(12), which only exist as
  ISO codes (+1000 for Z) — ``OGRCircularString::exportToWkt`` forces the
  ISO variant (gdal/ogr/ogrcircularstring.cpp:150).

Behavioral ports (semantics only — all code here is from-scratch numpy):

- ``GetCurveParmeters`` (gdal/ogr/ogrgeometryfactory.cpp:3249): circle
  center/radius/angles from 3 points with the input-scale normalization and
  the arbitrary counter-clockwise choice for the 3-point full circle.
- ``curveToLineString`` + ``OGRGeometryFactoryStrokeArc``
  (ogrgeometryfactory.cpp:3498,3331): endpoint-ordered symmetric stroking
  (``OGRGF_NeedSwithArcOrder``), constant angle steps with
  nSteps = round(|Δα|/step) floored at 4 (or the 7-plus-even stealth
  constraint), Z linear in angle, and the STEALTH encoding of the
  intermediate-point angle ratio in the low byte of each intermediate
  x/y double (``OGRGF_SetHiddenValue``).
- Arc measures: ``OGRCircularString::get_Length`` (R·|Δα| per arc),
  ``get_AreaOfCurveSegments`` (circular-segment formula),
  ``get_Area`` (full-circle πR² / convex linear+segments /
  stroked fallback, ogrcircularstring.cpp:668), ``Value`` (point at
  curvilinear distance), and envelope extension through quadrant
  crossings (``ExtendEnvelopeWithCircular``; the reference's
  ``case 3`` reads MIN(MaxY, cy-R) — an evident typo we correct to MinY).
- ``OGRCompoundCurve::get_Area`` (ogrcompoundcurve.cpp:752) and
  ``OGRCurvePolygon::get_Area`` (exterior minus holes,
  ogrcurvepolygon.cpp:556).

The default arc step is 4 degrees (``OGR_ARC_STEPSIZE``,
ogrgeometryfactory.cpp:2663).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import geometry as G

WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12

WKB_25D_BIT = 0x80000000

CURVE_KINDS = frozenset(
    (WKB_CIRCULARSTRING, WKB_COMPOUNDCURVE, WKB_CURVEPOLYGON,
     WKB_MULTICURVE, WKB_MULTISURFACE))

_KIND_NAMES = {
    G.WKB_POINT: "POINT",
    G.WKB_LINESTRING: "LINESTRING",
    G.WKB_POLYGON: "POLYGON",
    G.WKB_MULTIPOINT: "MULTIPOINT",
    G.WKB_MULTILINESTRING: "MULTILINESTRING",
    G.WKB_MULTIPOLYGON: "MULTIPOLYGON",
    G.WKB_GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
    WKB_CIRCULARSTRING: "CIRCULARSTRING",
    WKB_COMPOUNDCURVE: "COMPOUNDCURVE",
    WKB_CURVEPOLYGON: "CURVEPOLYGON",
    WKB_MULTICURVE: "MULTICURVE",
    WKB_MULTISURFACE: "MULTISURFACE",
}
_NAME_KINDS = {v: k for k, v in _KIND_NAMES.items()}

DEFAULT_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default


def parse_wkb_type(raw: int) -> tuple[int, bool]:
    """(base type, has_z) from a raw WKB type word. Accepts the 99-402
    25D bit and ISO +1000 codes (wkbHasZ, gdal/ogr/ogr_core.h:393)."""
    has_z = bool(raw & WKB_25D_BIT)
    base = raw & 0x0FFFFFFF
    if base & 0x8000:
        # legacy 'Z flag in the 2nd byte' encoding the reference
        # tolerates (ogrutils.cpp OGRReadWKBGeometryType)
        base &= 0xFF
        has_z = True
    if 1000 <= base < 2000:
        base -= 1000
        has_z = True
    if not (1 <= base <= 12):
        raise ValueError(f"unsupported geometry type {raw}")
    return base, has_z


class Geom:
    """Decoded geometry tree.

    ``coords``: (N, 2|3) float64 for POINT / LINESTRING / CIRCULARSTRING.
    ``parts``:
      POLYGON                     -> list of (N, 2|3) ring arrays
      CURVEPOLYGON                -> list of ring Geoms (line/circ/compound)
      COMPOUNDCURVE               -> list of member curve Geoms
      MULTI* / GEOMETRYCOLLECTION -> list of member Geoms
    """

    __slots__ = ("kind", "has_z", "coords", "parts")

    def __init__(self, kind, has_z=False, coords=None, parts=None):
        self.kind = kind
        self.has_z = has_z
        self.coords = coords
        self.parts = parts

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Geom({_KIND_NAMES[self.kind]}, z={self.has_z})"


# ---------------------------------------------------------------------------
# WKB decode
# ---------------------------------------------------------------------------

def _read_coords(buf, endian, off, n, dim):
    arr = np.frombuffer(buf, dtype=endian + "f8", count=dim * n, offset=off)
    return arr.reshape(n, dim).copy(), off + 8 * dim * n


def _decode_body(buf: memoryview, off: int) -> tuple[Geom, int]:
    byte_order = buf[off]
    # 0x30/0x31 are DB2 V7.2 ASCII byte-order markers
    # (ogr_p.h DB2_V72_FIX_BYTE_ORDER)
    endian = "<" if byte_order in (1, 0x31) else ">"
    (raw,) = struct.unpack_from(endian + "I", buf, off + 1)
    kind, has_z = parse_wkb_type(raw)
    off += 5
    dim = 3 if has_z else 2

    if kind == G.WKB_POINT:
        coords, off = _read_coords(buf, endian, off, 1, dim)
        return Geom(kind, has_z, coords), off
    if kind in (G.WKB_LINESTRING, WKB_CIRCULARSTRING):
        (n,) = struct.unpack_from(endian + "I", buf, off)
        coords, off = _read_coords(buf, endian, off + 4, n, dim)
        return Geom(kind, has_z, coords), off
    if kind == G.WKB_POLYGON:
        (nr,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(endian + "I", buf, off)
            r, off = _read_coords(buf, endian, off + 4, n, dim)
            rings.append(r)
        return Geom(kind, has_z, parts=rings), off
    # all remaining kinds hold full sub-geometries with their own headers
    (ng,) = struct.unpack_from(endian + "I", buf, off)
    off += 4
    parts = []
    for _ in range(ng):
        g, off = _decode_body(buf, off)
        parts.append(g)
    return Geom(kind, has_z, parts=parts), off


def decode_geom(wkb: bytes) -> Geom:
    g, _ = _decode_body(memoryview(wkb), 0)
    return g


# ---------------------------------------------------------------------------
# WKB encode (little-endian; old-OGC 25D bit for linear Z, ISO for curves)
# ---------------------------------------------------------------------------

def _type_word(kind: int, has_z: bool) -> int:
    if not has_z:
        return kind
    if kind in CURVE_KINDS:
        return kind + 1000
    return kind | WKB_25D_BIT


def _coord_bytes(coords: np.ndarray) -> bytes:
    return np.ascontiguousarray(coords, dtype="<f8").tobytes()


def encode_geom(g: Geom) -> bytes:
    out = [b"\x01", struct.pack("<I", _type_word(g.kind, g.has_z))]
    if g.kind == G.WKB_POINT:
        c = g.coords[0] if len(g.coords) else \
            ([math.nan] * (3 if g.has_z else 2))
        out.append(np.asarray(c, dtype="<f8").tobytes())
    elif g.kind in (G.WKB_LINESTRING, WKB_CIRCULARSTRING):
        out.append(struct.pack("<I", len(g.coords)))
        out.append(_coord_bytes(g.coords))
    elif g.kind == G.WKB_POLYGON:
        out.append(struct.pack("<I", len(g.parts)))
        for r in g.parts:
            out.append(struct.pack("<I", len(r)))
            out.append(_coord_bytes(r))
    else:
        out.append(struct.pack("<I", len(g.parts)))
        for p in g.parts:
            out.append(encode_geom(p))
    return b"".join(out)


# ---------------------------------------------------------------------------
# WKT codec
# ---------------------------------------------------------------------------

def _fmt_coords(coords: np.ndarray) -> str:
    return ",".join(" ".join(G._fmt(v) for v in row) for row in coords)


def _ring_wkt(ring_or_geom, force_named: bool = False) -> str:
    """WKT for a CurvePolygon ring / CompoundCurve member / MultiCurve
    member: bare parenthesized coords for plain linestring rings, named
    form for curve members (OGRCompoundCurve::exportToWkt)."""
    g = ring_or_geom
    if isinstance(g, np.ndarray):
        return "(" + _fmt_coords(g) + ")"
    if g.kind == G.WKB_LINESTRING:
        return "(" + _fmt_coords(g.coords) + ")"
    return wkt_from_geom(g)


def wkt_from_geom(g: Geom) -> str:
    name = _KIND_NAMES[g.kind]
    # curve types are ISO-only and print the Z token; linear 25D types
    # print bare 3-coordinate tuples (wkbVariantOldOgc)
    ztok = " Z" if (g.has_z and g.kind in CURVE_KINDS) else ""
    if g.kind == G.WKB_POINT:
        if not len(g.coords) or np.isnan(g.coords[0, 0]):
            return f"{name}{ztok} EMPTY"
        return f"{name}{ztok} ({_fmt_coords(g.coords)})"
    if g.kind in (G.WKB_LINESTRING, WKB_CIRCULARSTRING):
        if not len(g.coords):
            return f"{name}{ztok} EMPTY"
        return f"{name}{ztok} ({_fmt_coords(g.coords)})"
    if g.kind == G.WKB_POLYGON:
        if not g.parts:
            return f"{name}{ztok} EMPTY"
        return (f"{name}{ztok} ("
                + ",".join("(" + _fmt_coords(r) + ")" for r in g.parts) + ")")
    if not g.parts:
        return f"{name}{ztok} EMPTY"
    if g.kind in (WKB_COMPOUNDCURVE, WKB_CURVEPOLYGON):
        body = ",".join(_ring_wkt(p) for p in g.parts)
    elif g.kind == WKB_MULTICURVE:
        body = ",".join(_ring_wkt(p) for p in g.parts)
    elif g.kind == WKB_MULTISURFACE:
        # polygon members print bare ring-lists, curve polygons named
        chunks = []
        for p in g.parts:
            if p.kind == G.WKB_POLYGON:
                chunks.append(
                    "(" + ",".join("(" + _fmt_coords(r) + ")"
                                   for r in p.parts) + ")")
            else:
                chunks.append(wkt_from_geom(p))
        body = ",".join(chunks)
    elif g.kind == G.WKB_MULTIPOINT:
        body = ",".join(_fmt_coords(p.coords) for p in g.parts)
    elif g.kind == G.WKB_MULTILINESTRING:
        body = ",".join("(" + _fmt_coords(p.coords) + ")" for p in g.parts)
    elif g.kind == G.WKB_MULTIPOLYGON:
        body = ",".join(
            "(" + ",".join("(" + _fmt_coords(r) + ")" for r in p.parts) + ")"
            for p in g.parts)
    else:  # GEOMETRYCOLLECTION
        body = ",".join(wkt_from_geom(p) for p in g.parts)
    return f"{name}{ztok} ({body})"


def _parse_coords(s: str) -> tuple[np.ndarray, bool]:
    rows = []
    ncol = 2
    for tok in s.split(","):
        vals = [float(v) for v in tok.split()]
        ncol = max(ncol, len(vals))
        rows.append(vals)
    arr = np.zeros((len(rows), ncol), dtype=np.float64)
    for i, vals in enumerate(rows):
        arr[i, :len(vals)] = vals
    return arr, ncol >= 3


def _split_top(s: str) -> list[str]:
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i].strip())
            start = i + 1
    tail = s[start:].strip()
    if tail:
        out.append(tail)
    return out


def geom_from_wkt(wkt: str) -> Geom:
    s = wkt.strip()
    i = 0
    while i < len(s) and (s[i].isalpha() or s[i] in "_"):
        i += 1
    name = s[:i].upper()
    rest = s[i:].strip()
    has_z_tok = False
    if rest[:2].upper() in ("Z ", "Z("):
        has_z_tok = True
        rest = rest[1:].strip()
    elif rest.upper() == "Z EMPTY":
        has_z_tok = True
        rest = "EMPTY"
    kind = _NAME_KINDS.get(name)
    if kind is None:
        raise ValueError(f"unsupported WKT kind {name!r}")
    if rest.upper() == "EMPTY" or not rest:
        if kind == G.WKB_POINT:
            dim = 3 if has_z_tok else 2
            return Geom(kind, has_z_tok,
                        np.full((1, dim), math.nan))
        if kind in (G.WKB_LINESTRING, WKB_CIRCULARSTRING):
            return Geom(kind, has_z_tok,
                        np.zeros((0, 3 if has_z_tok else 2)))
        if kind == G.WKB_POLYGON:
            return Geom(kind, has_z_tok, parts=[])
        return Geom(kind, has_z_tok, parts=[])
    if not (rest.startswith("(") and rest.endswith(")")):
        raise ValueError(f"malformed WKT body: {wkt!r}")
    body = rest[1:-1].strip()

    if kind == G.WKB_POINT:
        coords, z = _parse_coords(body)
        return Geom(kind, has_z_tok or z, coords)
    if kind in (G.WKB_LINESTRING, WKB_CIRCULARSTRING):
        coords, z = _parse_coords(body)
        return Geom(kind, has_z_tok or z, coords)
    if kind == G.WKB_POLYGON:
        rings, z = [], has_z_tok
        for grp in _split_top(body):
            r, rz = _parse_coords(grp.strip()[1:-1])
            z = z or rz
            rings.append(r)
        rings = [_pad_dim(r, z) for r in rings]
        return Geom(kind, z, parts=rings)
    if kind == G.WKB_MULTIPOINT:
        groups = _split_top(body)
        pts, z = [], has_z_tok
        for grp in groups:
            inner = grp.strip()
            if inner.startswith("("):
                inner = inner[1:-1]
            if not inner.strip():
                continue
            c, cz = _parse_coords(inner)
            z = z or cz
            pts.append(c)
        parts = [Geom(G.WKB_POINT, z, _pad_dim(c, z)) for c in pts]
        return Geom(kind, z, parts=parts)
    if kind in (G.WKB_MULTILINESTRING, WKB_MULTICURVE):
        parts, z = [], has_z_tok
        for grp in _split_top(body):
            grp = grp.strip()
            if grp.startswith("("):
                c, cz = _parse_coords(grp[1:-1])
                z = z or cz
                parts.append(Geom(G.WKB_LINESTRING, cz, c))
            else:
                sub = geom_from_wkt(grp)
                z = z or sub.has_z
                parts.append(sub)
        for p in parts:
            _set_dim(p, z)
        return Geom(kind, z, parts=parts)
    if kind in (G.WKB_MULTIPOLYGON, WKB_MULTISURFACE):
        parts, z = [], has_z_tok
        for grp in _split_top(body):
            grp = grp.strip()
            if grp.startswith("("):
                rings, rz = [], False
                for rg in _split_top(grp[1:-1]):
                    r, rz1 = _parse_coords(rg.strip()[1:-1])
                    rz = rz or rz1
                    rings.append(r)
                z = z or rz
                parts.append(Geom(G.WKB_POLYGON, rz, parts=rings))
            else:
                sub = geom_from_wkt(grp)
                z = z or sub.has_z
                parts.append(sub)
        for p in parts:
            _set_dim(p, z)
        return Geom(kind, z, parts=parts)
    if kind in (WKB_COMPOUNDCURVE, WKB_CURVEPOLYGON):
        parts, z = [], has_z_tok
        for grp in _split_top(body):
            grp = grp.strip()
            if grp.startswith("("):
                c, cz = _parse_coords(grp[1:-1])
                z = z or cz
                parts.append(Geom(G.WKB_LINESTRING, cz, c))
            else:
                sub = geom_from_wkt(grp)
                z = z or sub.has_z
                parts.append(sub)
        for p in parts:
            _set_dim(p, z)
        return Geom(kind, z, parts=parts)
    # GEOMETRYCOLLECTION
    parts = [geom_from_wkt(grp) for grp in _split_top(body)]
    z = has_z_tok or any(p.has_z for p in parts)
    return Geom(kind, z, parts=parts)


def _pad_dim(coords: np.ndarray, has_z: bool) -> np.ndarray:
    want = 3 if has_z else 2
    if coords.shape[1] == want:
        return coords
    if coords.shape[1] < want:
        out = np.zeros((len(coords), want))
        out[:, :coords.shape[1]] = coords
        return out
    return coords[:, :want].copy()


def _set_dim(g: Geom, has_z: bool) -> None:
    """Promote/normalize a parsed subtree to a uniform dimension (OGR
    promotes all members when any member has Z)."""
    g.has_z = has_z
    if g.coords is not None:
        g.coords = _pad_dim(g.coords, has_z)
    elif g.kind == G.WKB_POLYGON:
        g.parts = [_pad_dim(r, has_z) for r in g.parts]
    elif g.parts:
        for p in g.parts:
            _set_dim(p, has_z)


# ---------------------------------------------------------------------------
# Arc parameters + stroking (ogrgeometryfactory.cpp ports)
# ---------------------------------------------------------------------------

def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """Port of OGRGeometryFactory::GetCurveParmeters
    (gdal/ogr/ogrgeometryfactory.cpp:3249). Returns
    (R, cx, cy, alpha0, alpha1, alpha2) or None for collinear points."""
    if x0 == x2 and y0 == y2 and (x0 != x1 or y0 != y1):
        cx = (x0 + x1) / 2
        cy = (y0 + y1) / 2
        R = math.hypot(x0 - cx, y0 - cy)
        alpha0 = math.atan2(y0 - cy, x0 - cx)
        return R, cx, cy, alpha0, alpha0 + math.pi, alpha0 + 2 * math.pi

    dx01, dy01 = x1 - x0, y1 - y0
    dx12, dy12 = x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    if scale == 0:
        return None
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1e-8:
        return None
    x01m, x12m = (x0 + x1) * inv, (x1 + x2) * inv
    y01m, y12m = (y0 + y1) * inv, (y1 + y2) * inv
    c01 = dx01 * x01m + dy01 * y01m
    c12 = dx12 * x12m + dy12 * y12m
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    alpha0 = math.atan2((y0 - cy) * inv, (x0 - cx) * inv)
    alpha1 = math.atan2((y1 - cy) * inv, (x1 - cx) * inv)
    alpha2 = math.atan2((y2 - cy) * inv, (x2 - cx) * inv)
    R = math.hypot(x0 - cx, y0 - cy)
    if det < 0:
        if alpha1 > alpha0:
            alpha1 -= 2 * math.pi
        if alpha2 > alpha1:
            alpha2 -= 2 * math.pi
    else:
        if alpha1 < alpha0:
            alpha1 += 2 * math.pi
        if alpha2 < alpha1:
            alpha2 += 2 * math.pi
    return R, cx, cy, alpha0, alpha1, alpha2


def _set_hidden_value(nval: int, x: float, y: float) -> tuple[float, float]:
    """OGRGF_SetHiddenValue: stash 16 bits in the low byte of x and y."""
    bx = bytearray(struct.pack("<d", x))
    bx[0] = nval & 0xFF
    by = bytearray(struct.pack("<d", y))
    by[0] = (nval >> 8) & 0xFF
    return struct.unpack("<d", bytes(bx))[0], struct.unpack("<d", bytes(by))[0]


def get_hidden_value(x: float, y: float) -> int:
    bx = struct.pack("<d", x)
    by = struct.pack("<d", y)
    return bx[0] | (by[0] << 8)


_HIDDEN_ALPHA_SCALE = (1 << 32) - 2


def _stroke_arc(pts, cx, cy, R, z0, z1, has_z, alpha0, alpha1, step,
                stealth_constraints):
    """OGRGeometryFactoryStrokeArc: append intermediate vertices only."""
    sign = 1 if step > 0 else -1
    nsteps = int(abs((alpha1 - alpha0) / step) + 0.5)
    if stealth_constraints:
        if nsteps < 1 + 6:
            nsteps = 1 + 6
        else:
            nsteps = 1 + 6 + 2 * ((nsteps - (1 + 6) + 1) // 2)
    elif nsteps < 4:
        nsteps = 4
    step = sign * abs((alpha1 - alpha0) / nsteps)
    alpha = alpha0 + step
    while (alpha - alpha1) * sign < -1e-8:
        x = cx + R * math.cos(alpha)
        y = cy + R * math.sin(alpha)
        if has_z:
            z = z0 + (z1 - z0) * (alpha - alpha0) / (alpha1 - alpha0)
            pts.append((x, y, z))
        else:
            pts.append((x, y))
        alpha += step


def curve_to_linestring(p0, p1, p2, has_z=False,
                        max_step_deg=0.0, stealth=True,
                        add_intermediate=False) -> np.ndarray:
    """Port of OGRGeometryFactory::curveToLineString: stroke one arc
    (p0 via p1 to p2) into an (N, 2|3) vertex array."""
    x0, y0 = p0[0], p0[1]
    x2, y2 = p2[0], p2[1]
    # full endpoint ordering for binary-symmetric output
    if x0 < x2 or (x0 == x2 and y0 < y2):
        rev = curve_to_linestring(p2, p1, p0, has_z, max_step_deg,
                                  stealth, add_intermediate)
        return rev[::-1].copy()

    z0 = p0[2] if has_z else 0.0
    z1 = p1[2] if has_z else 0.0
    z2 = p2[2] if has_z else 0.0
    x1, y1 = p1[0], p1[1]

    params = get_curve_parameters(x0, y0, x1, y1, x2, y2)
    is_arc = params is not None
    if params is None:
        R = cx = cy = alpha0 = alpha1 = alpha2 = 0.0
    else:
        R, cx, cy, alpha0, alpha1, alpha2 = params

    sign = 1 if alpha1 >= alpha0 else -1
    if max_step_deg < 1e-6:
        max_step_deg = DEFAULT_STEP_DEG
    step = max_step_deg / 180.0 * math.pi
    if step <= 0.01 / 180.0 * math.pi:
        step = 0.01 / 180.0 * math.pi
    step *= sign

    pts = [(x0, y0, z0) if has_z else (x0, y0)]
    if not is_arc or add_intermediate:
        _stroke_arc(pts, cx, cy, R, z0, z1, has_z, alpha0, alpha1,
                    step, False)
        pts.append((x1, y1, z1) if has_z else (x1, y1))
        _stroke_arc(pts, cx, cy, R, z1, z2, has_z, alpha1, alpha2,
                    step, False)
    else:
        _stroke_arc(pts, cx, cy, R, z0, z2, has_z, alpha0, alpha2,
                    step, stealth)
        if stealth:
            ratio = (alpha1 - alpha0) / (alpha2 - alpha0)
            n_ratio = int(0.5 + _HIDDEN_ALPHA_SCALE * ratio)
            lo = n_ratio & 0xFFFF
            hi = n_ratio >> 16
            # the reference runs this loop BEFORE appending the final
            # endpoint, so n counts x0 + the intermediates only; the
            # first pair carries (lo, hi), the last pair (hi, lo), and
            # every other intermediate gets the 0xFFFF marker
            n = len(pts)
            i = 1
            while i + 1 < n:
                for j, pos in ((0, i), (1, i + 1)):
                    nval = 0xFFFF
                    if i == 1:
                        nval = lo if j == 0 else hi
                    elif i == n - 2:
                        nval = hi if j == 0 else lo
                    x, y = pts[pos][0], pts[pos][1]
                    x, y = _set_hidden_value(nval, x, y)
                    pts[pos] = (x, y, pts[pos][2]) if has_z else (x, y)
                i += 2
    pts.append((x2, y2, z2) if has_z else (x2, y2))
    return np.asarray(pts, dtype=np.float64)


def _circularstring_to_line(coords: np.ndarray, has_z: bool,
                            max_step_deg=0.0, stealth=True) -> np.ndarray:
    """OGRCircularString::CurveToLine: stroke each (i, i+1, i+2) arc and
    concatenate, skipping the duplicated join vertex."""
    if len(coords) < 3:
        return coords[:, :3 if has_z else 2].copy()
    chunks = []
    for i in range(0, len(coords) - 2, 2):
        arc = curve_to_linestring(coords[i], coords[i + 1], coords[i + 2],
                                  has_z, max_step_deg, stealth)
        chunks.append(arc if i == 0 else arc[1:])
    return np.vstack(chunks)


def geom_to_linear(g: Geom, max_step_deg: float = 0.0,
                   stealth: bool = True) -> Geom:
    """GetLinearGeometry: CircularString→LineString,
    CompoundCurve→LineString, CurvePolygon→Polygon,
    MultiCurve→MultiLineString, MultiSurface→MultiPolygon
    (OGRGeometry::getLinearGeometry)."""
    if g.kind == WKB_CIRCULARSTRING:
        return Geom(G.WKB_LINESTRING, g.has_z,
                    _circularstring_to_line(g.coords, g.has_z, max_step_deg,
                                            stealth))
    if g.kind == WKB_COMPOUNDCURVE:
        chunks = []
        for i, p in enumerate(g.parts):
            lin = geom_to_linear(p, max_step_deg, stealth)
            chunks.append(lin.coords if i == 0 else lin.coords[1:])
        coords = (np.vstack(chunks) if chunks
                  else np.zeros((0, 3 if g.has_z else 2)))
        return Geom(G.WKB_LINESTRING, g.has_z, coords)
    if g.kind == WKB_CURVEPOLYGON:
        rings = []
        for p in g.parts:
            if isinstance(p, np.ndarray):
                rings.append(p)
            else:
                rings.append(geom_to_linear(p, max_step_deg, stealth).coords)
        return Geom(G.WKB_POLYGON, g.has_z, parts=rings)
    if g.kind == WKB_MULTICURVE:
        return Geom(G.WKB_MULTILINESTRING, g.has_z,
                    parts=[geom_to_linear(p, max_step_deg, stealth)
                           for p in g.parts])
    if g.kind == WKB_MULTISURFACE:
        return Geom(G.WKB_MULTIPOLYGON, g.has_z,
                    parts=[geom_to_linear(p, max_step_deg, stealth)
                           for p in g.parts])
    if g.kind == G.WKB_GEOMETRYCOLLECTION:
        return Geom(g.kind, g.has_z,
                    parts=[geom_to_linear(p, max_step_deg, stealth)
                           for p in g.parts])
    return g


# ---------------------------------------------------------------------------
# Measures
# ---------------------------------------------------------------------------

def _arc_pairs(coords: np.ndarray):
    for i in range(0, len(coords) - 2, 2):
        yield (coords[i], coords[i + 1], coords[i + 2])


def curve_length(g: Geom) -> float:
    """get_Length over the curve hierarchy: arcs contribute R·|Δα|
    (OGRCircularString::get_Length), linear members their polyline
    length; surfaces/points contribute 0."""
    if g.kind == WKB_CIRCULARSTRING:
        total = 0.0
        for p0, p1, p2 in _arc_pairs(g.coords):
            params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1],
                                          p2[0], p2[1])
            if params is not None:
                R, _cx, _cy, a0, _a1, a2 = params
                total += abs(a2 - a0) * R
            else:
                total += math.hypot(p2[0] - p0[0], p2[1] - p0[1])
        return total
    if g.kind == G.WKB_LINESTRING:
        c = g.coords
        return float(np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1])).sum())
    if g.kind in (WKB_COMPOUNDCURVE, WKB_MULTICURVE,
                  G.WKB_MULTILINESTRING, G.WKB_GEOMETRYCOLLECTION):
        return sum(curve_length(p) for p in g.parts)
    return 0.0


def _iter_points(g: Geom) -> np.ndarray:
    """Control-point iterator over a ring curve (getPointIterator order)."""
    if g.coords is not None:
        return g.coords
    if g.kind == WKB_COMPOUNDCURVE:
        chunks = []
        for i, p in enumerate(g.parts):
            c = _iter_points(p)
            chunks.append(c if i == 0 else c[1:])
        return np.vstack(chunks) if chunks else np.zeros((0, 2))
    raise ValueError(f"not a simple curve: {g!r}")


def _is_convex(coords: np.ndarray) -> bool:
    """OGRCurve::IsConvex: no positive cross product along the points."""
    n = len(coords)
    for i in range(n - 2):
        cross = ((coords[i + 1, 0] - coords[i, 0])
                 * (coords[i + 2, 1] - coords[i + 1, 1])
                 - (coords[i + 1, 1] - coords[i, 1])
                 * (coords[i + 2, 0] - coords[i + 1, 0]))
        if cross > 0:
            return False
    return True


def _linear_area(coords: np.ndarray) -> float:
    """OGRSimpleCurve::get_LinearArea: plain 0.5·|shoelace| (no first-
    vertex shift — mirror the reference exactly)."""
    n = len(coords)
    if n < 2:
        return 0.0
    x, y = coords[:, 0], coords[:, 1]
    s = float(np.dot(x, np.roll(y, -1) - np.roll(y, 1)))
    return 0.5 * abs(s)


def _area_of_curve_segments(g: Geom) -> float:
    if g.kind == WKB_CIRCULARSTRING:
        total = 0.0
        for p0, p1, p2 in _arc_pairs(g.coords):
            params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1],
                                          p2[0], p2[1])
            if params is not None:
                R, _cx, _cy, a0, a1, a2 = params
                d01, d12 = a1 - a0, a2 - a1
                total += 0.5 * R * R * abs(
                    d01 - math.sin(d01) + d12 - math.sin(d12))
        return total
    if g.kind == WKB_COMPOUNDCURVE:
        return sum(_area_of_curve_segments(p) for p in g.parts)
    return 0.0


def _is_full_circle(g: Geom):
    """OGRCircularString::IsFullCircle → (cx, cy, R²) or None."""
    if g.kind != WKB_CIRCULARSTRING:
        return None
    c = g.coords
    n = len(c)
    if n == 3 and c[0, 0] == c[2, 0] and c[0, 1] == c[2, 1]:
        cx = (c[0, 0] + c[1, 0]) / 2
        cy = (c[0, 1] + c[1, 1]) / 2
        r2 = (c[1, 0] - cx) ** 2 + (c[1, 1] - cy) ** 2
        return cx, cy, r2
    if n == 5 and c[0, 0] == c[4, 0] and c[0, 1] == c[4, 1]:
        pa = get_curve_parameters(c[0, 0], c[0, 1], c[1, 0], c[1, 1],
                                  c[2, 0], c[2, 1])
        pb = get_curve_parameters(c[2, 0], c[2, 1], c[3, 0], c[3, 1],
                                  c[4, 0], c[4, 1])
        if (pa and pb and abs(pa[0] - pb[0]) < 1e-10
                and abs(pa[1] - pb[1]) < 1e-10
                and abs(pa[2] - pb[2]) < 1e-10
                and (pa[5] - pa[3]) * (pb[5] - pb[3]) > 0):
            return pa[1], pa[2], pa[0] * pa[0]
    return None


def _ring_is_closed(g: Geom) -> bool:
    pts = _iter_points(g)
    return len(pts) > 1 and pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]


def curve_ring_area(g: Geom) -> float:
    """get_Area of one closed ring curve (OGRCircularString::get_Area /
    OGRCompoundCurve::get_Area / OGRLineString::get_Area)."""
    if isinstance(g, np.ndarray):
        return _linear_area(g)
    if g.kind == G.WKB_LINESTRING:
        return _linear_area(g.coords)
    if g.kind not in (WKB_CIRCULARSTRING, WKB_COMPOUNDCURVE):
        raise ValueError(f"not a ring curve: {g!r}")
    pts = _iter_points(g)
    if len(pts) == 0 or not _ring_is_closed(g):
        return 0.0
    full = _is_full_circle(g)
    if full is not None:
        return math.pi * full[2]
    if _is_convex(pts):
        return _linear_area(pts) + _area_of_curve_segments(g)
    lin = geom_to_linear(g)
    return _linear_area(lin.coords)


def curve_area(g: Geom) -> float:
    """get_Area over the full hierarchy (CurvePolygon: exterior minus
    holes, ogrcurvepolygon.cpp:556; collections sum surfaces)."""
    if g.kind == WKB_CURVEPOLYGON:
        if not g.parts:
            return 0.0
        total = curve_ring_area(g.parts[0])
        for hole in g.parts[1:]:
            total -= curve_ring_area(hole)
        return total
    if g.kind == G.WKB_POLYGON:
        if not g.parts:
            return 0.0
        total = G.ring_area(g.parts[0][:, :2])
        for hole in g.parts[1:]:
            total -= G.ring_area(hole[:, :2])
        return total
    if g.kind in (WKB_MULTISURFACE, G.WKB_MULTIPOLYGON,
                  G.WKB_GEOMETRYCOLLECTION):
        return sum(curve_area(p) for p in g.parts
                   if p.kind in (G.WKB_POLYGON, G.WKB_MULTIPOLYGON,
                                 WKB_CURVEPOLYGON, WKB_MULTISURFACE,
                                 G.WKB_GEOMETRYCOLLECTION))
    if g.kind in (WKB_CIRCULARSTRING, WKB_COMPOUNDCURVE):
        return curve_ring_area(g)
    return 0.0


def curve_envelope(g: Geom) -> tuple[float, float, float, float]:
    """(minx, maxx, miny, maxy), extending arcs through quadrant
    crossings (ExtendEnvelopeWithCircular)."""
    if g.coords is not None and len(g.coords):
        c = g.coords
        minx, maxx = float(c[:, 0].min()), float(c[:, 0].max())
        miny, maxy = float(c[:, 1].min()), float(c[:, 1].max())
        if g.kind == WKB_CIRCULARSTRING:
            for p0, p1, p2 in _arc_pairs(c):
                params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1],
                                              p2[0], p2[1])
                if params is None:
                    continue
                R, cx, cy, a0, _a1, a2 = params
                q0 = math.floor(a0 / (math.pi / 2))
                q1 = math.floor(a2 / (math.pi / 2))
                if q0 > q1:
                    q0, q1 = q1, q0
                for j in range(int(q0) + 1, int(q1) + 1):
                    m = (j + 8) % 4
                    if m == 0:
                        maxx = max(maxx, cx + R)
                    elif m == 1:
                        maxy = max(maxy, cy + R)
                    elif m == 2:
                        minx = min(minx, cx - R)
                    else:
                        miny = min(miny, cy - R)
        return minx, maxx, miny, maxy
    boxes = []
    if g.kind == G.WKB_POLYGON:
        for r in g.parts:
            if len(r):
                boxes.append((float(r[:, 0].min()), float(r[:, 0].max()),
                              float(r[:, 1].min()), float(r[:, 1].max())))
    elif g.parts:
        for p in g.parts:
            if isinstance(p, np.ndarray):
                if len(p):
                    boxes.append((float(p[:, 0].min()), float(p[:, 0].max()),
                                  float(p[:, 1].min()), float(p[:, 1].max())))
            else:
                try:
                    boxes.append(curve_envelope(p))
                except ValueError:
                    pass
    if not boxes:
        raise ValueError("empty geometry has no envelope")
    return (min(b[0] for b in boxes), max(b[1] for b in boxes),
            min(b[2] for b in boxes), max(b[3] for b in boxes))


def curve_value(g: Geom, distance: float) -> tuple:
    """Value(): point at curvilinear distance along a LineString or
    CircularString (OGRCircularString::Value / OGRSimpleCurve::Value)."""
    c = g.coords
    if g.kind == WKB_COMPOUNDCURVE:
        # walk members, delegating into the one containing the distance
        total = 0.0
        for p in g.parts:
            seg = curve_length(p)
            if distance <= total + seg or p is g.parts[-1]:
                return curve_value(p, distance - total)
            total += seg
        raise ValueError("empty compound curve")
    if g.kind == G.WKB_LINESTRING:
        if distance < 0:
            return tuple(c[0])
        seglens = np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))
        total = 0.0
        for i, sl in enumerate(seglens):
            if sl > 0 and total <= distance <= total + sl:
                t = (distance - total) / sl
                return tuple(c[i] * (1 - t) + c[i + 1] * t)
            total += sl
        return tuple(c[-1])
    if g.kind != WKB_CIRCULARSTRING:
        raise ValueError(f"Value() unsupported on {g!r}")
    if distance < 0:
        return tuple(c[0])
    total = 0.0
    for i in range(0, len(c) - 2, 2):
        p0, p1, p2 = c[i], c[i + 1], c[i + 2]
        params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1],
                                      p2[0], p2[1])
        if params is not None:
            R, cx, cy, a0, _a1, a2 = params
            seg = abs(a2 - a0) * R
            if seg > 0:
                if total <= distance <= total + seg:
                    t = (distance - total) / seg
                    alpha = a0 * (1 - t) + a2 * t
                    x = cx + R * math.cos(alpha)
                    y = cy + R * math.sin(alpha)
                    if g.has_z:
                        return (x, y, p0[2] * (1 - t) + p2[2] * t)
                    return (x, y)
                total += seg
        else:
            seg = math.hypot(p2[0] - p0[0], p2[1] - p0[1])
            if seg > 0:
                if total <= distance <= total + seg:
                    t = (distance - total) / seg
                    out = p0 * (1 - t) + p2 * t
                    return tuple(out)
                total += seg
    return tuple(c[-1])


def circularstring_segmentize(coords: np.ndarray, has_z: bool,
                              max_length: float) -> np.ndarray:
    """Port of OGRCircularString::segmentize: insert arc-intermediate
    control points (an odd count per half-arc, so pairs stay arcs) when a
    half-arc exceeds ``max_length``, reversing first for endpoint-order
    symmetry (binary-identical forward/backward, as the reference
    asserts in autotest ogr_geom.py)."""
    n = len(coords)
    if n == 0:
        return coords
    if (coords[0, 0] < coords[-1, 0]
            or (coords[0, 0] == coords[-1, 0]
                and coords[0, 1] < coords[-1, 1])):
        out = circularstring_segmentize(coords[::-1].copy(), has_z,
                                        max_length)
        return out[::-1].copy()

    rows: list[tuple] = []

    def _z_of(row):
        return row[2] if has_z else None

    for i in range(0, n - 2, 2):
        p0, p1, p2 = coords[i], coords[i + 1], coords[i + 2]
        rows.append(tuple(p0))
        params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1],
                                      p2[0], p2[1])
        if params is not None:
            R, cx, cy, a0, a1, a2 = params
            seg1 = abs(a1 - a0) * R
            seg2 = abs(a2 - a1) * R
            split = seg1 > max_length or seg2 > max_length
            if split:
                nint = 1 + 2 * int(math.floor(seg1 / max_length / 2))
                step = (a1 - a0) / (nint + 1)
                for j in range(1, nint + 1):
                    alpha = a0 + step * j
                    x = cx + R * math.cos(alpha)
                    y = cy + R * math.sin(alpha)
                    if has_z:
                        z = p0[2] + (p1[2] - p0[2]) * (alpha - a0) / (a1 - a0)
                        rows.append((x, y, z))
                    else:
                        rows.append((x, y))
            rows.append(tuple(p1))
            if split:
                nint = 1 + 2 * int(math.floor(seg2 / max_length / 2))
                step = (a2 - a1) / (nint + 1)
                for j in range(1, nint + 1):
                    alpha = a1 + step * j
                    x = cx + R * math.cos(alpha)
                    y = cy + R * math.sin(alpha)
                    if has_z:
                        z = p1[2] + (p2[2] - p1[2]) * (alpha - a1) / (a2 - a1)
                        rows.append((x, y, z))
                    else:
                        rows.append((x, y))
        else:
            seg1 = math.hypot(p1[0] - p0[0], p1[1] - p0[1])
            seg2 = math.hypot(p2[0] - p1[0], p2[1] - p1[1])
            split = seg1 > max_length or seg2 > max_length
            if split:
                nint = 1 + 2 * int(math.ceil(seg1 / max_length / 2))
                for j in range(1, nint + 1):
                    t = j / (nint + 1)
                    rows.append(tuple(p0 + t * (p1 - p0)))
            rows.append(tuple(p1))
            if split:
                nint = 1 + 2 * int(math.ceil(seg2 / max_length / 2))
                for j in range(1, nint + 1):
                    t = j / (nint + 1)
                    rows.append(tuple(p1 + t * (p2 - p1)))
    rows.append(tuple(coords[-1]))
    out = np.asarray(rows, dtype=np.float64)
    return out if len(out) > n else coords


# ---------------------------------------------------------------------------
# Convenience wrappers over WKB
# ---------------------------------------------------------------------------

def wkb_to_linear(wkb: bytes, max_step_deg: float = 0.0,
                  stealth: bool = True) -> bytes:
    return encode_geom(geom_to_linear(decode_geom(wkb), max_step_deg,
                                      stealth))


def wkb_curve_area(wkb: bytes) -> float:
    return curve_area(decode_geom(wkb))


def wkb_curve_length(wkb: bytes) -> float:
    return curve_length(decode_geom(wkb))


def wkb_force_2d(wkb: bytes) -> bytes:
    """Drop Z from every coordinate (OGRGeometry::flattenTo2D)."""
    g = decode_geom(wkb)

    def flatten(h: Geom) -> None:
        h.has_z = False
        if h.coords is not None:
            h.coords = h.coords[:, :2].copy()
        elif h.kind == G.WKB_POLYGON:
            h.parts = [r[:, :2].copy() for r in h.parts]
        elif h.parts:
            for p in h.parts:
                flatten(p)

    flatten(g)
    return encode_geom(g)


# ---------------------------------------------------------------------------
# Curve re-detection: curveFromLineString / GetCurveGeometry
# (ports of OGRGF_FixAngle:3663, OGRGF_DetectArc:3682,
#  OGRGeometryFactory::curveFromLineString:4183)
# ---------------------------------------------------------------------------

def _fix_angle(start: float, stop: float, alpha: float) -> float:
    """OGRGF_FixAngle: shift alpha by 2π multiples between start/stop."""
    if start < stop:
        while alpha <= start + 1e-8:
            alpha += 2 * math.pi
    else:
        while alpha >= start - 1e-8:
            alpha -= 2 * math.pi
    return alpha


_ALMOST_INT = 1e-8


def _is_almost_integer(x: float) -> bool:
    return abs(x - math.floor(x + 0.5)) < _ALMOST_INT


def _detect_arc(coords: np.ndarray, has_z: bool, i: int, state: dict,
                is_ring: bool) -> int:
    """Port of OGRGF_DetectArc: try to start/extend an arc at vertex i.
    ``state`` carries the under-construction compound members:
    'cc' (list of member Geoms), 'cs' (current circularstring point
    list), 'ls' (current linestring point list). Returns the next
    vertex index, or -1 (no arc here), or -2 (consumed to the end)."""
    n = len(coords)
    if i + 3 >= n:
        return -1
    p0, p1, p2 = coords[i], coords[i + 1], coords[i + 2]
    params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1],
                                  p2[0], p2[1])
    if params is None:
        return -1
    R1, cx1, cy1, a0_1, a1_1, a2_1 = params
    if not abs(a2_1 - a0_1) < 2 * 20.0 / 180.0 * math.pi:
        return -1

    d10 = a1_1 - a0_1
    d21 = a2_1 - a1_1
    max_delta = max(abs(d10), abs(d21))
    alpha_ratio_ref = (get_hidden_value(p1[0], p1[1])
                       | (get_hidden_value(p2[0], p2[1]) << 16))
    found_ffff = False
    found_reversed = False
    valid_ratio = 0 < alpha_ratio_ref < 0xFFFFFFFF
    count_valid = 1

    scale = max(1.0, R1, abs(cx1), abs(cy1))
    scale = 10.0 ** math.ceil(math.log10(scale))
    inv_scale = 1.0 / scale
    initial_const_step = (abs(d10 - d21) / max_delta) < 1e-4
    delta_eps = max_delta * 1e-4 if initial_const_step else max_delta / 10

    i_mid = -1
    last_valid_alpha = a2_1
    last_log_rel = 0.0
    j = i + 1
    while j + 2 < n:
        q1, q2, q3 = coords[j], coords[j + 1], coords[j + 2]
        params2 = get_curve_parameters(q1[0], q1[1], q2[0], q2[1],
                                       q3[0], q3[1])
        if params2 is None:
            break
        R2, cx2, cy2, a0_2, a1_2, a2_2 = params2
        rdR = abs(R1 - R2) * inv_scale
        rdx = abs(cx1 - cx2) * inv_scale
        rdy = abs(cy1 - cy2) * inv_scale
        if (rdR > 1e-6 and rdx > 1e-6 and rdy > 1e-6) \
                or d10 * (a1_2 - a0_2) < 0:
            break
        if rdR > 0 and rdx > 0 and rdy > 0:
            log_rel = min(abs(math.log10(rdR)), abs(math.log10(rdx)),
                          abs(math.log10(rdy)))
            if (log_rel > 0 and last_log_rel > 0 and last_log_rel >= 8
                    and log_rel <= 8 and log_rel < last_log_rel - 2):
                break
            last_log_rel = log_rel
        s10, s21 = abs(a1_2 - a0_2), abs(a2_2 - a1_2)
        if not (s10 < 2 * max_delta and s21 < 2 * max_delta):
            break

        if valid_ratio and j > i + 1 and (i % 2) != (j % 2):
            rev = ((get_hidden_value(q1[0], q1[1]) << 16)
                   | get_hidden_value(q2[0], q2[1]))
            if not found_ffff and rev == 0xFFFFFFFF:
                found_ffff = True
                count_valid += 1
            elif found_ffff and not found_reversed and rev == 0xFFFFFFFF:
                count_valid += 1
            elif found_ffff and not found_reversed \
                    and rev == alpha_ratio_ref:
                found_reversed = True
                count_valid += 1
            else:
                if initial_const_step \
                        and abs(last_valid_alpha - a0_1) >= math.pi \
                        and count_valid > 10:
                    if last_valid_alpha - a0_1 > 0:
                        while (last_valid_alpha - a0_1 - max_delta
                               - math.pi > -max_delta / 10):
                            last_valid_alpha -= max_delta
                            j -= 1
                    else:
                        while (last_valid_alpha - a0_1 + max_delta
                               + math.pi < max_delta / 10):
                            last_valid_alpha += max_delta
                            j -= 1
                    q2 = coords[j + 1]
                    break
                valid_ratio = False

        last_valid_alpha = _fix_angle(a0_1, a1_1, a2_2)

        if j > i + 1 and i_mid < 0 \
                and delta_eps < 1.0 / 180.0 * math.pi:
            if abs(s10 - max_delta) > delta_eps:
                i_mid = j + (0 if initial_const_step else 1)
            elif abs(s21 - max_delta) > delta_eps:
                i_mid = j + (1 if initial_const_step else 2)
        j += 1

    if j < i + 3:
        return -1
    valid_ratio = valid_ratio and found_ffff and found_reversed

    # flush pending linestring into the compound
    ls = state.get("ls")
    if ls is not None:
        scale2 = max(1.0, abs(p0[0]), abs(p0[1]))
        if (abs(ls[-1][0] - p0[0]) / scale2 > 1e-8
                or abs(ls[-1][1] - p0[1]) / scale2 > 1e-8):
            ls.append(tuple(p0))
        if len(ls) >= 2:
            state.setdefault("cc", []).append(
                Geom(G.WKB_LINESTRING, has_z,
                     np.asarray(ls, dtype=np.float64)))
        state["ls"] = None

    if state.get("cs") is None:
        state["cs"] = [tuple(p0)]
    cs = state["cs"]

    # reference: poFinalPoint = (j+2 >= numPoints) ? p3 : p2, where at
    # natural exit j = n-2 and p3 = coords[n-1] = coords[j+1], and at a
    # break p2 = coords[j+1] — i.e. always coords[j+1]
    final_pt = coords[j + 1] if j + 1 < n else coords[n - 1]

    xmid = ymid = zmid = 0.0
    if valid_ratio:
        if final_pt[0] > p0[0] or (final_pt[0] == p0[0]
                                   and final_pt[1] > p0[1]):
            # NeedSwitchArcOrder(p0, final)
            amid = last_valid_alpha + alpha_ratio_ref * \
                (a0_1 - last_valid_alpha) / _HIDDEN_ALPHA_SCALE
            amid = _fix_angle(a0_1, last_valid_alpha, amid)
        else:
            amid = a0_1 + alpha_ratio_ref * \
                (last_valid_alpha - a0_1) / _HIDDEN_ALPHA_SCALE
        xmid = cx1 + R1 * math.cos(amid)
        ymid = cy1 + R1 * math.sin(amid)

        if has_z:
            last_alpha = 0.0
            last_z = 0.0
            k = i
            while k < j + 2:
                p = coords[k]
                alpha = math.atan2(p[1] - cy1, p[0] - cx1)
                alpha = _fix_angle(a0_1, last_valid_alpha, alpha)
                if k > i and ((alpha < last_valid_alpha
                               and amid < alpha)
                              or (alpha > last_valid_alpha
                                  and amid > alpha)):
                    ratio = (amid - last_alpha) / (alpha - last_alpha)
                    zmid = (1 - ratio) * last_z + ratio * p[2]
                    break
                last_alpha, last_z = alpha, p[2]
                k += 1
            else:
                zmid = last_z
            if _is_almost_integer(zmid):
                zmid = math.floor(zmid + 0.5)

        if R1 > 1e-5:
            start_end_int = (_is_almost_integer(p0[0])
                             and _is_almost_integer(p0[1])
                             and _is_almost_integer(final_pt[0])
                             and _is_almost_integer(final_pt[1]))
            if start_end_int \
                    and abs(xmid - math.floor(xmid + 0.5)) / scale < 1e-4 \
                    and abs(ymid - math.floor(ymid + 0.5)) / scale < 1e-4:
                xmid = float(math.floor(xmid + 0.5))
                ymid = float(math.floor(ymid + 0.5))
                best_err = abs(R1 - math.hypot(xmid - cx1, ymid - cy1))
                best_x = best_y = 0
                if best_err > 0.001 and R1 > 2:
                    sr = 1
                    max_c = max(abs(p0[0]), abs(p0[1]), final_pt[0],
                                final_pt[1], xmid, ymid)
                    if R1 > max_c * 1000:
                        sr = 100
                    elif R1 > max_c * 10:
                        sr = 10
                    for iy in range(-sr, sr + 1):
                        for ix in range(-sr, sr + 1):
                            cxm, cym = xmid + ix, ymid + iy
                            if abs(cxm - p0[0]) < 1e-8 \
                                    and abs(cym - p0[1]) < 1e-8:
                                continue
                            if abs(cxm - final_pt[0]) < 1e-8 \
                                    and abs(cym - final_pt[1]) < 1e-8:
                                continue
                            err = abs(R1 - math.hypot(cxm - cx1,
                                                      cym - cy1))
                            if err < best_err:
                                best_x, best_y, best_err = ix, iy, err
                xmid += best_x
                ymid += best_y
            else:
                if abs(xmid) < 100000000:
                    xmid = math.floor(xmid * 100000000 + 0.5) / 100000000.0
                if abs(ymid) < 100000000:
                    ymid = math.floor(ymid * 100000000 + 0.5) / 100000000.0

    def _mk(p, x=None, y=None, z=None):
        row = list(p[:3] if has_z else p[:2])
        if x is not None:
            row[0] = x
        if y is not None:
            row[1] = y
        if has_z and z is not None:
            row[2] = z
        return tuple(row)

    full_circle = (p0[0] == final_pt[0] and p0[1] == final_pt[1]
                   and (not has_z or p0[2] == final_pt[2]))
    if full_circle and not is_ring:
        cs.append(_mk(coords[(i + j + 2) // 4]))
        if valid_ratio:
            cs.append(_mk(coords[(i + j + 2) // 4], xmid, ymid, zmid))
        else:
            cs.append(_mk(coords[(i + j + 1) // 2]))
        cs.append(_mk(coords[3 * (i + j + 2) // 4]))
    elif valid_ratio:
        cs.append(_mk(p0, xmid, ymid, zmid))
    elif 1 <= i_mid < j:
        cs.append(_mk(coords[i_mid]))
    else:
        cs.append(_mk(coords[(i + j + 1) // 2]))
    cs.append(_mk(final_pt))

    if j + 2 >= n:
        return -2
    return j + 1


def curve_from_linestring(coords: np.ndarray, has_z: bool,
                          is_ring: bool = False) -> Geom:
    """OGRGeometryFactory::curveFromLineString: LINESTRING →
    CIRCULARSTRING / COMPOUNDCURVE / LINESTRING."""
    state: dict = {"cc": [], "cs": None, "ls": None}
    n = len(coords)
    i = 0
    ended = False
    while i < n:
        new_i = _detect_arc(coords, has_z, i, state, is_ring)
        if new_i == -2:
            ended = True
            break
        if new_i >= 0:
            i = new_i
            continue
        if state["cs"] is not None:
            state["cc"].append(Geom(WKB_CIRCULARSTRING, has_z,
                                    np.asarray(state["cs"],
                                               dtype=np.float64)))
            state["cs"] = None
        p = coords[i]
        if state["ls"] is None:
            state["ls"] = [tuple(p[:3] if has_z else p[:2])]
        else:
            sc = max(1.0, abs(p[0]), abs(p[1]))
            last = state["ls"][-1]
            if (abs(last[0] - p[0]) / sc > 1e-8
                    or abs(last[1] - p[1]) / sc > 1e-8):
                state["ls"].append(tuple(p[:3] if has_z else p[:2]))
        i += 1

    cc = state["cc"]
    cs = (Geom(WKB_CIRCULARSTRING, has_z,
               np.asarray(state["cs"], dtype=np.float64))
          if state["cs"] is not None else None)
    ls = (Geom(G.WKB_LINESTRING, has_z,
               np.asarray(state["ls"], dtype=np.float64))
          if state["ls"] is not None else None)

    src = Geom(G.WKB_LINESTRING, has_z,
               coords[:, :3 if has_z else 2].copy())
    if ls is not None and len(ls.coords) < 2:
        ls = None
        if cc:
            if len(cc) == 1:
                return cc[0]
            return Geom(WKB_COMPOUNDCURVE, has_z, parts=cc)
        return src
    if cc:
        cc.append(ls if ls is not None else cs)
        return Geom(WKB_COMPOUNDCURVE, has_z,
                    parts=[m for m in cc if m is not None])
    if ls is not None:
        return ls
    if cs is not None:
        return cs
    return src


def get_curve_geometry(g: Geom, is_ring: bool = False) -> Geom:
    """OGRGeometry::getCurveGeometry over the tree: LineString →
    detected curve, Polygon → CurvePolygon (when any ring curves),
    MultiLineString → MultiCurve, MultiPolygon → MultiSurface."""
    if g.kind == G.WKB_LINESTRING:
        if g.coords is None or len(g.coords) < 4:
            return g
        return curve_from_linestring(g.coords, g.has_z, is_ring)
    if g.kind == G.WKB_POLYGON:
        rings = [curve_from_linestring(r, g.has_z, is_ring=True)
                 if len(r) >= 4 else Geom(G.WKB_LINESTRING, g.has_z, r)
                 for r in g.parts]
        if all(r.kind == G.WKB_LINESTRING for r in rings):
            return g
        return Geom(WKB_CURVEPOLYGON, g.has_z, parts=[
            r if r.kind != G.WKB_LINESTRING else r.coords
            for r in rings])
    if g.kind == G.WKB_MULTILINESTRING:
        parts = [get_curve_geometry(p) for p in g.parts]
        if all(p.kind == G.WKB_LINESTRING for p in parts):
            return g
        return Geom(WKB_MULTICURVE, g.has_z, parts=parts)
    if g.kind == G.WKB_MULTIPOLYGON:
        parts = [get_curve_geometry(p) for p in g.parts]
        if all(p.kind == G.WKB_POLYGON for p in parts):
            return g
        return Geom(WKB_MULTISURFACE, g.has_z, parts=parts)
    if g.kind == G.WKB_GEOMETRYCOLLECTION:
        parts = [get_curve_geometry(p) for p in g.parts]
        return Geom(g.kind, g.has_z, parts=parts)
    return g
