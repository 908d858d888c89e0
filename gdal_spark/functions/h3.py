"""H3-style aperture-7 hexagonal cell index — the other half of the
north rule's "H3/S2 index", as vectorized column math over Arrow
batches (no per-row Python).

Implements the published H3 grid mathematics (h3geo.org / Uber h3lib,
Apache-2.0 — re-derived, not copied):

    lat/lon -> unit XYZ -> nearest icosahedron face (max dot with the
    20 face centers) -> gnomonic projection (r = tan(angular dist),
    theta relative to the face's i-axis azimuth, Class III resolutions
    rotated by asin(sqrt(3/28))) -> hex2d scaled by sqrt(7)^res ->
    axial hex coords via cube rounding -> aperture-7 digit walk
    (upAp7 / upAp7r alternating by resolution class) -> 62-bit id.

Two deliberate deviations from Uber's h3lib, both documented:

* **Face constants are derived, not tabulated.** The 20 face centers,
  vertex sets and i-axis azimuths are computed at import from the
  canonical icosahedron (cyclic permutations of (0, ±1, ±phi),
  normalized); h3lib instead ships measured tables (faceCenterGeo,
  faceAxesAzRadsCII) plus a 122-entry base-cell table. Ids here are
  therefore *internally* canonical — deterministic and stable, with the
  same hierarchy/partitioning properties, but not bit-compatible with
  h3lib (which is not installed in this environment to verify against).
* **Cells are face-local.** h3lib stitches cells that straddle
  icosahedron edges onto a home face (overage handling, faceijk.c);
  here every point belongs to its nearest face center, so a hex that
  crosses a face edge is represented per-face. For the index's Spark
  uses — partition keys, prefix joins, rollups — this only means a few
  extra distinct cells along the 30 icosahedron edges.

Why this exists next to functions/s2.py: S2 gives bit-prefix quadtree
rollups (see its module docstring for the H3-vs-S2 rationale); H3-style
hexes give near-uniform cell *shapes* (every non-edge cell has 6
equidistant neighbors), which is what kNN ring expansion and skew
salting prefer. The bit layout below keeps S2's best trick anyway:
every coarser resolution is an integer mask over the same column
(digits below the target res set to 7, the H3 "unused digit" marker).

Bit layout (62 bits, always a non-negative int64):

    [61..58] res (0..15)   [57..53] face (0..19)
    [52..49] i0+8          [48..45] j0+8        (res-0 axial coords)
    [44..0]  15 x 3-bit digits, digit for res r at bits 3*(15-r),
             digits beyond `res` filled with 7.

The reference (GDAL) has no discrete global grid; its analog is the
gdal2tiles WebMercator tile math (gdal/swig/python/scripts/
gdal2tiles.py:211) which functions/tiles.py covers. Parity target here
is the north rule's index contract, cross-checked three ways: an
independent scalar walker in tests, the DuckDB oracle replaying the
same digit walk as a recursive CTE, and decode/encode fixed-point
tests.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MAX_RES = 15
PHI = (1.0 + math.sqrt(5.0)) / 2.0
# h3lib's RES0_U_GNOMONIC (= 2 - phi): gnomonic length of a res-0 hex
# "unit" — public constant from the H3 spec.
RES0_U_GNOMONIC = 0.381966011250105
SQRT7 = math.sqrt(7.0)
# Class III rotation between successive resolutions: asin(sqrt(3/28)).
AP7_ROT = math.asin(math.sqrt(3.0 / 28.0))
SQRT3_2 = math.sqrt(3.0) / 2.0


def _pow7(res: int) -> float:
    """sqrt(7)^res by repeated multiplication — one canonical float per
    res, shared verbatim between the numpy path and the SQL oracle so
    both sides scale by the bit-identical constant."""
    p = 1.0
    for _ in range(res):
        p *= SQRT7
    return p


# ---------------------------------------------------------------------------
# Icosahedron, derived at import (deterministic vertex/face ordering).

def _build_icosahedron():
    verts = []
    for a in (1.0, -1.0):
        for b in (PHI, -PHI):
            verts.append((0.0, a, b))
            verts.append((a, b, 0.0))
            verts.append((b, 0.0, a))
    v = np.array(verts, dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # Faces = all mutually-adjacent vertex triples. Adjacent iff the
    # chord distance equals the icosahedron edge (dot = 1/sqrt(5)).
    dots = v @ v.T
    adj = np.abs(dots - 1.0 / math.sqrt(5.0)) < 1e-9
    faces = []
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces.sort()
    assert len(faces) == 20 and n == 12
    centers = np.array([v[list(f)].sum(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    return v, faces, centers


_VERTS, _FACES, FACE_XYZ = _build_icosahedron()
FACE_LAT = np.arcsin(FACE_XYZ[:, 2])
FACE_LON = np.arctan2(FACE_XYZ[:, 1], FACE_XYZ[:, 0])


def _geo_azimuth(lat1, lon1, lat2, lon2):
    """Initial bearing from (lat1,lon1) to (lat2,lon2), radians
    (the standard great-circle azimuth formula h3lib's
    _geoAzimuthRads uses)."""
    dlon = lon2 - lon1
    return np.arctan2(
        np.cos(lat2) * np.sin(dlon),
        np.cos(lat1) * np.sin(lat2)
        - np.sin(lat1) * np.cos(lat2) * np.cos(dlon))


# i-axis azimuth per face: bearing from the face center to its lowest-
# numbered vertex (internal convention; h3lib tabulates measured ones).
_v0 = _VERTS[[f[0] for f in _FACES]]
FACE_AZ0 = _geo_azimuth(FACE_LAT, FACE_LON,
                        np.arcsin(_v0[:, 2]),
                        np.arctan2(_v0[:, 1], _v0[:, 0]))


# ---------------------------------------------------------------------------
# Core math (all element-wise numpy; every constant a module literal so
# the DuckDB oracle can embed the identical bits).

def _rnd(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (h3lib lroundl semantics)."""
    return np.where(x >= 0, np.floor(x + 0.5), -np.floor(0.5 - x))


def _cube_round(fi: np.ndarray, fj: np.ndarray):
    """Nearest hex center in axial coords: round cube coords
    (a,b,c)=(i,j,-i-j) and repair the axis with the largest error."""
    fc = -fi - fj
    ri, rj, rc = _rnd(fi), _rnd(fj), _rnd(fc)
    di, dj, dc = np.abs(ri - fi), np.abs(rj - fj), np.abs(rc - fc)
    fix_i = (di > dj) & (di > dc)
    fix_j = ~fix_i & (dj > dc)
    ri = np.where(fix_i, -rj - rc, ri)
    rj = np.where(fix_j, -ri - rc, rj)
    return ri.astype(np.int64), rj.astype(np.int64)


# Axial displacement -> H3 digit (CENTER,K,J,JK,I,IK,IJ = 0..6).
# Axial basis: i_vec=(1,0), j_vec=(-1/2, sqrt3/2), k_vec=-(i_vec+j_vec).
_DIGIT_OF = {(0, 0): 0, (-1, -1): 1, (0, 1): 2, (-1, 0): 3,
             (1, 0): 4, (0, -1): 5, (1, 1): 6}
_DIGIT_LUT = np.full(9, -1, dtype=np.int64)
for (_di, _dj), _d in _DIGIT_OF.items():
    _DIGIT_LUT[(_di + 1) * 3 + (_dj + 1)] = _d
_DIGIT_VEC = np.zeros((7, 2), dtype=np.int64)
for (_di, _dj), _d in _DIGIT_OF.items():
    _DIGIT_VEC[_d] = (_di, _dj)


def _up_step(ci: np.ndarray, cj: np.ndarray, res: int):
    """One aperture-7 up-aggregation at resolution `res`: parent axial
    coords and the child's digit. Odd res = Class III (ccw upAp7),
    even res = Class II (cw upAp7r) — h3lib faceijk.c:_faceIjkToH3."""
    if res % 2 == 1:  # Class III
        pi = _rnd((3.0 * ci - cj) / 7.0).astype(np.int64)
        pj = _rnd((ci + 2.0 * cj) / 7.0).astype(np.int64)
        center_i = pi * 2 + pj          # downAp7: i->(2,-1), j->(1,3)
        center_j = -pi + pj * 3
    else:             # Class II
        pi = _rnd((2.0 * ci + cj) / 7.0).astype(np.int64)
        pj = _rnd((3.0 * cj - ci) / 7.0).astype(np.int64)
        center_i = pi * 3 - pj          # downAp7r: i->(3,1), j->(-1,2)
        center_j = pi + pj * 2
    di = ci - center_i
    dj = cj - center_j
    digit = _DIGIT_LUT[(di + 1) * 3 + (dj + 1)]
    if np.any(digit < 0):
        raise AssertionError("aperture-7 walk produced a non-unit diff")
    return pi, pj, digit


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lon/lat degrees -> 62-bit hex cell ids at `res` (int64 >= 0)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in 0..{MAX_RES}")
    lam = np.radians(lon)
    phi = np.radians(lat)
    cp = np.cos(phi)
    x, y, z = cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)
    dots = (x[:, None] * FACE_XYZ[:, 0] + y[:, None] * FACE_XYZ[:, 1]
            + z[:, None] * FACE_XYZ[:, 2])
    face = np.argmax(dots, axis=1).astype(np.int64)
    fdot = dots[np.arange(len(face)), face]
    ang = np.arccos(np.clip(fdot, -1.0, 1.0))
    az = _geo_azimuth(FACE_LAT[face], FACE_LON[face], phi, lam)
    theta = FACE_AZ0[face] - az
    if res % 2 == 1:  # Class III grid rotation
        theta = theta - AP7_ROT
    r_gn = np.tan(ang) / RES0_U_GNOMONIC * _pow7(res)
    hx = r_gn * np.cos(theta)
    hy = r_gn * np.sin(theta)
    fj = hy / SQRT3_2
    fi = hx + 0.5 * fj
    ci, cj = _cube_round(fi, fj)

    digits = np.zeros(len(ci), dtype=np.int64)
    for r in range(res, 0, -1):
        ci, cj, d = _up_step(ci, cj, r)
        digits |= d << (3 * (MAX_RES - r))
    # unused digits below `res` = 7 (H3's unused-digit marker)
    digits |= (np.int64(1) << (3 * (MAX_RES - res))) - 1
    if np.any((ci < -8) | (ci > 7) | (cj < -8) | (cj > 7)):
        raise AssertionError("res-0 axial coordinate out of packing range")
    return (np.int64(res) << 58 | face << 53
            | (ci + 8) << 49 | (cj + 8) << 45 | digits)


def parent_id(ids: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarser-resolution ancestor as pure integer column math (digits
    beyond parent_res -> 7, res field swapped) — the S2-style rollup."""
    fill = (np.int64(1) << (3 * (MAX_RES - parent_res))) - 1
    res_mask = ~(np.int64(15) << 58)
    return (ids & res_mask) | (np.int64(parent_res) << 58) | fill


def cell_res(ids: np.ndarray) -> np.ndarray:
    return (ids >> 58) & 15


def decode_center(ids: np.ndarray):
    """Cell ids -> center (lon, lat) degrees: reverse digit walk, then
    inverse gnomonic + great-circle destination from the face center."""
    ids = np.asarray(ids, dtype=np.int64)
    res = (ids >> 58) & 15
    if len(ids) and not np.all(res == res[0]):
        raise ValueError("decode_center expects a single resolution")
    r_lvl = int(res[0]) if len(ids) else 0
    face = (ids >> 53) & 31
    ci = ((ids >> 49) & 15) - 8
    cj = ((ids >> 45) & 15) - 8
    for r in range(1, r_lvl + 1):
        if r % 2 == 1:
            ni = ci * 2 + cj
            nj = -ci + cj * 3
        else:
            ni = ci * 3 - cj
            nj = ci + cj * 2
        d = (ids >> (3 * (MAX_RES - r))) & 7
        ci = ni + _DIGIT_VEC[d, 0]
        cj = nj + _DIGIT_VEC[d, 1]
    hx = ci - 0.5 * cj
    hy = cj * SQRT3_2
    r_gn = np.hypot(hx, hy)
    ang = np.arctan(r_gn * RES0_U_GNOMONIC / _pow7(r_lvl))
    theta = np.arctan2(hy, hx)
    if r_lvl % 2 == 1:
        theta = theta + AP7_ROT
    az = FACE_AZ0[face] - theta
    lat1, lon1 = FACE_LAT[face], FACE_LON[face]
    slat = (np.sin(lat1) * np.cos(ang)
            + np.cos(lat1) * np.sin(ang) * np.cos(az))
    lat2 = np.arcsin(np.clip(slat, -1.0, 1.0))
    lon2 = lon1 + np.arctan2(
        np.sin(az) * np.sin(ang) * np.cos(lat1),
        np.cos(ang) - np.sin(lat1) * slat)
    lon2 = (lon2 + math.pi) % (2.0 * math.pi) - math.pi
    return np.degrees(lon2), np.degrees(lat2)


def with_h3_columns(df: DataFrame, lon: str = "lon", lat: str = "lat",
                    res: int = 9, parent_res: Optional[int] = None,
                    out: str = "h3_id") -> DataFrame:
    """Append the hex cell id (and, if ``parent_res`` is given, the
    coarser ancestor as ``{out}_r{parent_res}``) as int64 columns.
    One Arrow pass, numpy-vectorized; no shuffle."""
    from pyspark.sql import types as T

    extra = [out] + ([f"{out}_r{parent_res}"]
                     if parent_res is not None else [])
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(c, T.LongType()) for c in extra])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = encode(pdf[lon].to_numpy(np.float64),
                         pdf[lat].to_numpy(np.float64), res) \
                if len(pdf) else np.zeros(0, dtype=np.int64)
            pdf = pdf.copy()
            pdf[out] = ids
            if parent_res is not None:
                pdf[f"{out}_r{parent_res}"] = parent_id(ids, parent_res)
            yield pdf

    return df.mapInPandas(run, schema=schema)
