"""S2 cell-id encoding — the north rule's "H3/S2 index" as vectorized
column math over Arrow batches (no per-row Python).

Implements the public S2 geometry cell scheme (s2geometry.io quadtree on
the 6 cube faces, quadratic ST projection, Hilbert-curve position):

    lat/lon -> unit XYZ -> face (largest |axis|) -> (u,v) -> quadratic
    s,t -> 30-bit (i,j) -> Hilbert position (lookup-table walk, 4 bits
    per step) -> 64-bit cell id  =  face(3) | position(2*30+1, leaf).

Why S2 rather than H3 here: S2's quadtree parents are bit prefixes of the
leaf id, so EVERY coarser level is a cheap integer mask over the same
column — one encode pass serves range-partitioning, prefix joins
(repartition-by-cell-prefix per the north star), and level-k rollups
without re-projection. H3's aperture-7 hexes lack prefix nesting and the
icosahedral projection has no closed form the DuckDB oracle could twin.

The reference (GDAL) has no discrete global grid; its analog is the tile
math in gdal2tiles (gdal/swig/python/scripts/gdal2tiles.py:211) which
functions/tiles.py covers. S2 is the skew-robust upgrade: cell sizes are
near-uniform on the sphere (WebMercator cells shrink toward the poles).

Parity: the Hilbert tables and bit layout follow the published
s2geometry reference implementation (s2cell_id FromFaceIJ); tests
cross-check against an independent per-level state-machine walker and
the DuckDB oracle replays the same walk as a recursive CTE.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1          # 61
LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

# Hilbert sub-cell orders (public S2 constants): for each of the 4
# curve orientations, the (i,j) sub-cell visited at position p, packed
# as ij = i*2 + j; and the orientation delta applied at position p.
POS_TO_IJ = np.array([[0, 1, 3, 2],
                      [0, 2, 3, 1],
                      [3, 2, 0, 1],
                      [3, 1, 0, 2]], dtype=np.int64)
POS_TO_ORIENTATION = np.array([SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK],
                              dtype=np.int64)
IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        IJ_TO_POS[_o, POS_TO_IJ[_o, _p]] = _p

# 4-bits-per-step lookup tables: index (ij<<2 | orientation) ->
# (pos<<2 | orientation') and the inverse.
_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int,
                 orientation: int) -> None:
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    for index in range(4):
        ij = int(POS_TO_IJ[orientation, index])
        _init_lookup(level, i + (ij >> 1), j + (ij & 1), orig,
                     pos + index,
                     orientation ^ int(POS_TO_ORIENTATION[index]))


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    """Degrees -> unit sphere. Plain IEEE double ops (oracle-twinnable)."""
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube face (0..5) + gnomonic (u,v) in [-1,1], per the S2 layout:
    faces 0,1,2 = +x,+y,+z; 3,4,5 = -x,-y,-z."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0,
                    np.where(ay >= az, 1, 2)).astype(np.int64)
    face = face + np.where(
        np.choose(face, [x, y, z]) < 0, 3, 0)
    # unused lanes divide by ~0 harmlessly; every selected lane divides
    # by the largest-|.| axis which is >= 1/sqrt(3) on the unit sphere
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z,
                             z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z,
                             y / x, -x / y, -x / z])
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (area-uniformizing)."""
    with np.errstate(invalid="ignore"):  # unused where-branch may sqrt(<0)
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64),
                   0, (1 << MAX_LEVEL) - 1)


def faceij_to_cellid(face: np.ndarray, i: np.ndarray,
                     j: np.ndarray) -> np.ndarray:
    """Leaf cell id (uint64) from face + 30-bit (i,j): the lookup-table
    Hilbert walk, 4 bits per step, fully vectorized."""
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = (face & SWAP_MASK).astype(np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= (SWAP_MASK | INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def cellid_from_lonlat(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    x, y, z = lonlat_to_xyz(np.asarray(lon, dtype=np.float64),
                            np.asarray(lat, dtype=np.float64))
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return faceij_to_cellid(face, i, j)


def parent_id(ids: np.ndarray, level: int) -> np.ndarray:
    """Level-k ancestor of leaf ids — pure bit math (prefix nesting)."""
    ids = ids.astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & (~(lsb - np.uint64(1)) ^ lsb)) | lsb


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of the lowest set bit)."""
    ids = ids.astype(np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    return MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2).astype(np.int64)


def token(ids: np.ndarray) -> list:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    out = []
    for v in ids.astype(np.uint64):
        s = format(int(v), "016x").rstrip("0")
        out.append(s if s else "X")
    return out


def with_s2_columns(df: DataFrame, lon: str = "lon", lat: str = "lat",
                    level: Optional[int] = None,
                    out: str = "s2_id") -> DataFrame:
    """Append the S2 leaf id (and, if ``level`` is given, the level-k
    parent id as ``{out}_l{level}``) as int64 columns (two's-complement
    of the uint64 id — faces 3..5 wrap negative, ordering-stable within
    a face). One Arrow pass, numpy-vectorized; no shuffle."""
    from pyspark.sql import types as T

    extra = [out] + ([f"{out}_l{level}"] if level is not None else [])
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(c, T.LongType()) for c in extra])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = cellid_from_lonlat(pdf[lon].to_numpy(np.float64),
                                     pdf[lat].to_numpy(np.float64)) \
                if len(pdf) else np.zeros(0, dtype=np.uint64)
            pdf = pdf.copy()
            pdf[out] = ids.view(np.int64)
            if level is not None:
                pdf[f"{out}_l{level}"] = parent_id(ids, level).view(np.int64)
            yield pdf

    return df.mapInPandas(run, schema=schema)
