"""Per-feature WKB geometry pipeline ops backing ogr2ogr's geometry flags.

Reference semantics: the per-feature translate loop in
gdal/apps/ogr2ogr.cpp:3843-3964 —
- -explodecollections splits each collection member into its own output
  feature (ogr2ogr.cpp:2987, :3843),
- -segmentize / -simplify apply OGRGeometry::segmentize /
  SimplifyPreserveTopology to the destination geometry (:3867-3882),
- -clipsrc / -clipdst intersect with an arbitrary polygon and DROP the
  feature when the result is empty (:3885-3905 — clipsrc before
  reprojection, clipdst after),
- -wrapdateline splits geometries crossing the antimeridian
  (transformWithOptions WRAPDATELINE, gdal/ogr/ogrgeometryfactory.cpp),
- -nlt maps to OGRGeometryFactory::forceTo (:3946): closed lines become
  polygons, container rings aggregate into one polygon
  (forceToPolygon), singles wrap into multis, polygon rings become
  linestrings (forceToMultiLineString).

Execution model: every kernel here runs per feature inside Arrow map
passes (apps.ogr2ogr's mapInPandas stages); operand geometries are
feature-sized, so scale comes from row parallelism across the cluster,
never from these kernels.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from gdal_spark.functions import clipping as CL
from gdal_spark.functions import geometry as G
from gdal_spark.functions.geometry import (
    WKB_GEOMETRYCOLLECTION,
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    _geom_end,
    _read_header,
)

__all__ = [
    "explode_wkb",
    "wkb_members",
    "wkb_segmentize",
    "wkb_simplify",
    "wkb_force_to",
    "wkb_clip_to_polygon",
    "wkb_wrapdateline",
    "build_polygon_from_edges",
    "wkb_close_rings",
    "wkb_value",
]

_MULTI_OF = {WKB_POINT: WKB_MULTIPOINT, WKB_LINESTRING: WKB_MULTILINESTRING,
             WKB_POLYGON: WKB_MULTIPOLYGON}


def _type_of(wkb: bytes) -> int:
    gtype, _, _ = _read_header(memoryview(wkb), 0)
    return gtype


def wkb_members(wkb: bytes) -> list[bytes]:
    """Sub-geometry WKBs of any container type (multi or collection);
    a single geometry yields itself."""
    buf = memoryview(wkb)
    gtype, endian, off = _read_header(buf, 0)
    if gtype not in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                     WKB_GEOMETRYCOLLECTION):
        return [bytes(wkb)]
    (n,) = struct.unpack_from(endian + "I", buf, off)
    p = off + 4
    parts = []
    for _ in range(n):
        end = _geom_end(buf, p)
        parts.append(bytes(buf[p:end]))
        p = end
    return parts


def explode_wkb(wkb: bytes) -> list[bytes]:
    """-explodecollections: one output geometry per container member
    (ogr2ogr.cpp:3843 extracts the iPart-th member per dst feature).
    Non-container input passes through as a single-element list."""
    return wkb_members(wkb)


def _encode_container(gtype: int, parts: list[bytes]) -> bytes:
    head = b"\x01" + struct.pack("<II", gtype, len(parts))
    return head + b"".join(parts)


def _map_coords(wkb: bytes, line_fn, ring_fn) -> bytes:
    """Rebuild a geometry with every linestring run through ``line_fn``
    and every polygon ring through ``ring_fn`` (points untouched)."""
    gtype = _type_of(wkb)
    if gtype in (WKB_POINT, WKB_MULTIPOINT):
        return bytes(wkb)
    if gtype == WKB_LINESTRING:
        return G.encode_linestring(line_fn(G.decode_linestring(wkb)))
    if gtype == WKB_POLYGON:
        rings = G.decode_polygons(wkb)[0]
        return G.encode_polygon([ring_fn(r) for r in rings])
    if gtype in (WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                 WKB_GEOMETRYCOLLECTION):
        parts = [_map_coords(m, line_fn, ring_fn) for m in wkb_members(wkb)]
        return _encode_container(gtype, parts)
    raise ValueError(f"unsupported geometry type {gtype}")


def wkb_segmentize(wkb: bytes, max_len: float) -> bytes:
    """-segmentize: densify so no segment exceeds ``max_len``
    (OGRGeometry::segmentize, equal subdivision per segment)."""
    fn = lambda c: G.segmentize(c, max_len)  # noqa: E731
    return _map_coords(wkb, fn, fn)


def wkb_simplify(wkb: bytes, tolerance: float) -> bytes:
    """-simplify: SimplifyPreserveTopology per linestring/ring."""
    fn = lambda c: G.simplify_preserve_topology(c, tolerance)  # noqa: E731
    return _map_coords(wkb, fn, fn)


# ---------------------------------------------------------------------------
# -nlt forceTo
# ---------------------------------------------------------------------------

def _is_closed_line(wkb: bytes) -> bool:
    if _type_of(wkb) != WKB_LINESTRING:
        return False
    c = G.decode_linestring(wkb)
    return len(c) >= 4 and bool(np.all(c[0] == c[-1]))


def _collect_rings(wkb: bytes) -> list[np.ndarray]:
    """Every polygon ring in the geometry, outer and inner alike
    (forceToPolygon's 'aggregated polygon from all the rings')."""
    gtype = _type_of(wkb)
    if gtype == WKB_POLYGON:
        return list(G.decode_polygons(wkb)[0])
    if gtype in (WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        out: list[np.ndarray] = []
        for m in wkb_members(wkb):
            out.extend(_collect_rings(m))
        return out
    return []


def wkb_force_to(wkb: bytes, target: str) -> bytes:
    """-nlt: OGRGeometryFactory::forceTo family
    (gdal/ogr/ogrgeometryfactory.cpp). Supported targets:
    PROMOTE_TO_MULTI and the six concrete names. Conversions with no
    defined mapping return the input unchanged (the factory's lenient
    contract)."""
    t = target.upper()
    gtype = _type_of(wkb)
    if t == "PROMOTE_TO_MULTI":
        if gtype in _MULTI_OF:
            return _encode_container(_MULTI_OF[gtype], [bytes(wkb)])
        return bytes(wkb)
    if t == "POLYGON":
        if _is_closed_line(wkb):
            return G.encode_polygon([G.decode_linestring(wkb)])
        rings = _collect_rings(wkb)
        if gtype in (WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION) and rings:
            return G.encode_polygon(rings)
        return bytes(wkb)
    if t == "MULTIPOLYGON":
        if gtype == WKB_POLYGON:
            return _encode_container(WKB_MULTIPOLYGON, [bytes(wkb)])
        if _is_closed_line(wkb):
            return _encode_container(
                WKB_MULTIPOLYGON,
                [G.encode_polygon([G.decode_linestring(wkb)])])
        if gtype == WKB_GEOMETRYCOLLECTION:
            polys = [m for m in wkb_members(wkb)
                     if _type_of(m) == WKB_POLYGON]
            if polys:
                return _encode_container(WKB_MULTIPOLYGON, polys)
        return bytes(wkb)
    if t == "MULTILINESTRING":
        if gtype == WKB_LINESTRING:
            return _encode_container(WKB_MULTILINESTRING, [bytes(wkb)])
        if gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
            # forceToMultiLineString: polygon rings become linestrings
            lines = [G.encode_linestring(r) for r in _collect_rings(wkb)]
            return _encode_container(WKB_MULTILINESTRING, lines)
        return bytes(wkb)
    if t == "MULTIPOINT":
        if gtype == WKB_POINT:
            return _encode_container(WKB_MULTIPOINT, [bytes(wkb)])
        return bytes(wkb)
    if t == "LINESTRING":
        if gtype == WKB_MULTILINESTRING:
            parts = wkb_members(wkb)
            if len(parts) == 1:
                return parts[0]
        return bytes(wkb)
    if t == "POINT":
        if gtype == WKB_MULTIPOINT:
            parts = wkb_members(wkb)
            if len(parts) == 1:
                return parts[0]
        return bytes(wkb)
    raise ValueError(f"unsupported -nlt target {target!r}")


# ---------------------------------------------------------------------------
# Arbitrary-polygon clip (clipsrc/clipdst with a geometry operand)
# ---------------------------------------------------------------------------

def _point_in_polys(px: float, py: float,
                    polys: list[list[np.ndarray]]) -> bool:
    """Even-odd membership across outer+hole rings of each polygon."""
    for rings in polys:
        if not G.py_point_in_ring(px, py, rings[0]):
            continue
        in_hole = any(G.py_point_in_ring(px, py, h) for h in rings[1:])
        if not in_hole:
            return True
    return False


def _clip_line_to_polys(coords: np.ndarray,
                        polys: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Polyline ∩ polygon: split every segment at each crossing with a
    clip edge, keep the sub-segments whose midpoint is inside. Adjacent
    kept pieces stitch into maximal runs (GEOS LineString∩Polygon
    semantics for the non-degenerate case; boundary-collinear runs
    follow the midpoint test)."""
    edges = []
    for rings in polys:
        for r in rings:
            for i in range(len(r) - 1):
                edges.append((r[i], r[i + 1]))
    runs: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        d = b - a
        ts = [0.0, 1.0]
        for p, q in edges:
            e = q - p
            den = d[0] * e[1] - d[1] * e[0]
            if den == 0.0:
                continue
            w = p - a
            t = (w[0] * e[1] - w[1] * e[0]) / den
            u = (w[0] * d[1] - w[1] * d[0]) / den
            if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                ts.append(float(t))
        ts = sorted(set(ts))
        for t0, t1 in zip(ts, ts[1:]):
            if t1 - t0 <= 1e-12:
                continue
            mid = a + d * ((t0 + t1) / 2.0)
            p0, p1 = a + d * t0, a + d * t1
            if _point_in_polys(float(mid[0]), float(mid[1]), polys):
                if cur and np.allclose(cur[-1], p0):
                    cur.append(p1)
                else:
                    if len(cur) >= 2:
                        runs.append(cur)
                    cur = [p0, p1]
            else:
                if len(cur) >= 2:
                    runs.append(cur)
                cur = []
    if len(cur) >= 2:
        runs.append(cur)
    return [np.asarray(r) for r in runs]


def wkb_clip_to_polygon(wkb: bytes, clip_wkb: bytes) -> bytes | None:
    """Feature geometry ∩ arbitrary (multi)polygon — the Intersection
    call at ogr2ogr.cpp:3887/:3931. Returns None when empty (the app
    drops the feature). Points use even-odd membership, lines the
    segment-split clip, polygons the Martinez–Rueda boolean kernel."""
    gtype = _type_of(wkb)
    clip_polys = G.decode_polygons(clip_wkb)
    if gtype == WKB_POINT:
        x, y = G.decode_point(wkb)
        return bytes(wkb) if _point_in_polys(x, y, clip_polys) else None
    if gtype == WKB_MULTIPOINT:
        kept = [m for m in wkb_members(wkb)
                if _point_in_polys(*G.decode_point(m), clip_polys)]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else _encode_container(
            WKB_MULTIPOINT, kept)
    if gtype == WKB_LINESTRING:
        runs = _clip_line_to_polys(G.decode_linestring(wkb), clip_polys)
        if not runs:
            return None
        if len(runs) == 1:
            return G.encode_linestring(runs[0])
        return G.encode_multilinestring(runs)
    if gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
        r = CL.wkb_boolean(wkb, clip_wkb, CL.INTERSECTION)
        return None if r is None else r[0]
    if gtype in (WKB_MULTILINESTRING, WKB_GEOMETRYCOLLECTION):
        kept = []
        for m in wkb_members(wkb):
            c = wkb_clip_to_polygon(m, clip_wkb)
            if c is not None:
                kept.extend(wkb_members(c))
        if not kept:
            return None
        if len(kept) == 1:
            return kept[0]
        kinds = {_type_of(k) for k in kept}
        if kinds == {WKB_LINESTRING}:
            return _encode_container(WKB_MULTILINESTRING, kept)
        if kinds == {WKB_POLYGON}:
            return _encode_container(WKB_MULTIPOLYGON, kept)
        if kinds == {WKB_POINT}:
            return _encode_container(WKB_MULTIPOINT, kept)
        return _encode_container(WKB_GEOMETRYCOLLECTION, kept)
    raise ValueError(f"unsupported geometry type {gtype}")


# ---------------------------------------------------------------------------
# -wrapdateline
# ---------------------------------------------------------------------------

def _unwrap_x(coords: np.ndarray) -> np.ndarray:
    """Make lon continuous across the antimeridian: whenever a step
    jumps by more than 180°, shift the remainder by ∓360°."""
    c = coords.copy()
    dx = np.diff(c[:, 0])
    shift = np.concatenate([[0.0], np.cumsum(
        np.where(dx > 180.0, -360.0, np.where(dx < -180.0, 360.0, 0.0)))])
    c[:, 0] += shift
    return c


def _crosses_dateline(wkb: bytes) -> bool:
    gtype = _type_of(wkb)
    if gtype in (WKB_POINT, WKB_MULTIPOINT):
        return False
    if gtype == WKB_LINESTRING:
        return bool(np.any(np.abs(np.diff(
            G.decode_linestring(wkb)[:, 0])) > 180.0))
    if gtype == WKB_POLYGON:
        return any(bool(np.any(np.abs(np.diff(r[:, 0])) > 180.0))
                   for r in G.decode_polygons(wkb)[0])
    return any(_crosses_dateline(m) for m in wkb_members(wkb))


_WEST = None  # lazily built clip windows (module import order)
_EAST = None


def _windows():
    global _WEST, _EAST
    if _WEST is None:
        _WEST = G.encode_polygon([np.array(
            [[-180.0, -90.0], [180.0, -90.0], [180.0, 90.0],
             [-180.0, 90.0], [-180.0, -90.0]])])
        _EAST = G.encode_polygon([np.array(
            [[180.0, -90.0], [540.0, -90.0], [540.0, 90.0],
             [180.0, 90.0], [180.0, -90.0]])])
    return _WEST, _EAST


def wkb_wrapdateline(wkb: bytes) -> bytes:
    """-wrapdateline: split a geometry that crosses the antimeridian
    into a multi-geometry with all longitudes in [-180, 180]
    (transformWithOptions WRAPDATELINE, ogrgeometryfactory.cpp). The
    unwrap normalizes lon to a continuous span (west part stays in
    [-180,180], the overflow lands in [180,540]); each half is clipped
    and the east half shifted back by -360."""
    if not _crosses_dateline(wkb):
        return bytes(wkb)
    gtype = _type_of(wkb)
    if gtype in (WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                 WKB_GEOMETRYCOLLECTION):
        parts = []
        for m in wkb_members(wkb):
            parts.extend(wkb_members(wkb_wrapdateline(m)))
        kinds = {_type_of(p) for p in parts}
        if kinds == {WKB_POLYGON}:
            return _encode_container(WKB_MULTIPOLYGON, parts)
        if kinds == {WKB_LINESTRING}:
            return _encode_container(WKB_MULTILINESTRING, parts)
        return _encode_container(WKB_GEOMETRYCOLLECTION, parts)
    unwrapped = _map_coords(wkb, _unwrap_x, _unwrap_x)
    # after the unwrap the geometry lives in [-180, 540); shift west so
    # both halves are positive-lon clips of the same figure
    west_w, east_w = _windows()
    halves = []
    for window, shift in ((west_w, 0.0), (east_w, -360.0)):
        piece = wkb_clip_to_polygon(unwrapped, window)
        if piece is None:
            continue
        if shift:
            sh = lambda c, s=shift: c + np.array([s, 0.0])  # noqa: E731
            piece = _map_coords(piece, sh, sh)
        halves.extend(wkb_members(piece))
    if not halves:
        return bytes(wkb)
    if len(halves) == 1:
        return halves[0]
    kinds = {_type_of(p) for p in halves}
    if kinds == {WKB_POLYGON}:
        return _encode_container(WKB_MULTIPOLYGON, halves)
    if kinds == {WKB_LINESTRING}:
        return _encode_container(WKB_MULTILINESTRING, halves)
    return _encode_container(WKB_GEOMETRYCOLLECTION, halves)


# ---------------------------------------------------------------------------
# polygon assembly from edges, ring closing, point-along-line
# ---------------------------------------------------------------------------

def _check_pts(a, b, tol: float):
    """CheckPoints (gdal/ogr/ograssemblepolygon.cpp:45): exact equality
    when tol == 0, else a Chebyshev prefilter + euclidean test. Returns
    the distance when within tol (for best-candidate updates), else
    None; exact match returns 0.0."""
    if tol == 0.0:
        return 0.0 if (a[0] == b[0] and a[1] == b[1]) else None
    dx, dy = abs(a[0] - b[0]), abs(a[1] - b[1])
    if dx > tol or dy > tol:
        return None
    d = math.hypot(dx, dy)
    return d if d < tol else None


def build_polygon_from_edges(wkb: bytes, auto_close: bool = False,
                             tolerance: float = 0.0) -> bytes:
    """OGRBuildPolygonFromEdges (gdal/ogr/ograssemblepolygon.cpp:134):
    chain a MULTILINESTRING / collection of LINESTRINGs into rings by
    matching loose ends (within ``tolerance``), then assemble a polygon
    with the largest-envelope ring as the exterior (#3610 rule).
    Raises ValueError for non-linestring content or an unclosable ring
    (the reference's OGRERR_FAILURE paths, ogr_geom_build_from_edges_3).
    Zero-point members (LINESTRING EMPTY) are skipped."""
    gtype = _type_of(wkb)
    if gtype not in (WKB_MULTILINESTRING, WKB_GEOMETRYCOLLECTION):
        raise ValueError("BuildPolygonFromEdges: expected a collection "
                         "of linestrings")
    edges = []
    for m in wkb_members(wkb):
        if _type_of(m) != WKB_LINESTRING:
            raise ValueError("the geometry collection contains non line "
                             "string geometries")
        c = G.decode_linestring(m)
        edges.append(c)
    consumed = [len(c) < 2 for c in edges]
    rings: list[np.ndarray] = []
    while not all(consumed):
        first = consumed.index(False)
        consumed[first] = True
        ring = [p for p in edges[first]]
        work_done = True
        while (_check_pts(ring[0], ring[-1], 0.0) is None
               and not all(consumed) and work_done):
            work_done = False
            best = tolerance
            best_edge, best_rev = -1, False
            for i, line in enumerate(edges):
                if consumed[i]:
                    continue
                d = _check_pts(line[0], ring[-1], best)
                if d is not None:
                    best = d if tolerance else best
                    best_edge, best_rev = i, False
                d = _check_pts(line[-1], ring[-1], best)
                if d is not None:
                    best = d if tolerance else best
                    best_edge, best_rev = i, True
                if tolerance == 0.0 and best_edge != -1:
                    break
            if best_edge != -1:
                line = edges[best_edge]
                pts = line[::-1] if best_rev else line
                # skip the repeated joint vertex (AddEdgeToRing)
                if _check_pts(ring[-1], pts[0], 0.0) is not None:
                    pts = pts[1:]
                ring.extend(pts)
                consumed[best_edge] = True
                work_done = True
        if _check_pts(ring[0], ring[-1], tolerance or 0.0) is None:
            raise ValueError(
                f"failed to close ring {len(rings)}: end points "
                f"({ring[0][0]},{ring[0][1]}) and ({ring[-1][0]},{ring[-1][1]})")
        if auto_close and _check_pts(ring[0], ring[-1], 0.0) is None:
            ring.append(ring[0])
        rings.append(np.asarray(ring))
    # exterior = largest envelope area (#3610)
    if not rings:
        return G.encode_polygon([])
    areas = [(r[:, 0].max() - r[:, 0].min()) * (r[:, 1].max() - r[:, 1].min())
             for r in rings]
    ext = int(np.argmax(areas))
    ordered = [rings[ext]] + [r for i, r in enumerate(rings) if i != ext]
    return G.encode_polygon(ordered)


def wkb_close_rings(wkb: bytes) -> bytes:
    """OGRGeometry::closeRings: append the start point to any polygon
    ring whose last point differs from its first."""
    def close(r: np.ndarray) -> np.ndarray:
        if len(r) and not np.array_equal(r[0], r[-1]):
            return np.vstack([r, r[:1]])
        return r
    return _map_coords(wkb, lambda c: c, close)


def wkb_value(wkb: bytes, distance: float) -> bytes:
    """OGRSimpleCurve::Value (gdal/ogr/ogrlinestring.cpp:1162): the
    point at ``distance`` along a linestring; clamps to the start for
    negative distances and to the end past the total length."""
    if _type_of(wkb) != WKB_LINESTRING:
        raise ValueError("Value: expected a LINESTRING")
    c = G.decode_linestring(wkb)
    if distance < 0:
        return G.encode_point(float(c[0, 0]), float(c[0, 1]))
    acc = 0.0
    for i in range(len(c) - 1):
        seg = math.hypot(c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1])
        if seg > 0 and acc <= distance <= acc + seg:
            t = (distance - acc) / seg
            return G.encode_point(
                float(c[i, 0] * (1 - t) + c[i + 1, 0] * t),
                float(c[i, 1] * (1 - t) + c[i + 1, 1] * t))
        acc += seg
    return G.encode_point(float(c[-1, 0]), float(c[-1, 1]))
