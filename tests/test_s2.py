"""S2 cell-id encoder tests.

The lookup-table encoder is cross-checked against an INDEPENDENT
per-level Hilbert state-machine walker (2 bits per step, no tables), so
a transcription error in either implementation breaks the comparison.
Face packing is pinned by the published face-cell ids
((2*face+1) << 60, tokens 1/3/5/7/9/b).
"""

import numpy as np
import pytest

from gdal_spark.functions import s2


def slow_cellid(lon: float, lat: float) -> int:
    """Independent reference: same public algorithm, level-at-a-time."""
    x, y, z = s2.lonlat_to_xyz(np.array([lon]), np.array([lat]))
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    face = int(face[0])
    i = int(s2.st_to_ij(s2.uv_to_st(u))[0])
    j = int(s2.st_to_ij(s2.uv_to_st(v))[0])
    pos = 0
    orientation = face & s2.SWAP_MASK
    for k in range(s2.MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = int(s2.IJ_TO_POS[orientation, ij])
        pos = (pos << 2) | p
        orientation ^= int(s2.POS_TO_ORIENTATION[p])
    n = (face << (s2.POS_BITS - 1)) | pos
    return n * 2 + 1


def test_lookup_matches_independent_walker():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-85, 85, 300)
    fast = s2.cellid_from_lonlat(lon, lat)
    slow = np.array([slow_cellid(a, b) for a, b in zip(lon, lat)],
                    dtype=np.uint64)
    np.testing.assert_array_equal(fast, slow)


def test_face_cells_match_published_ids():
    # face centers -> level-0 ancestors are the canonical face cells
    pts = [(0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 90.0, 2),
           (180.0, 0.0, 3), (-90.0, 0.0, 4), (0.0, -90.0, 5)]
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    ids = s2.cellid_from_lonlat(lon, lat)
    parents = s2.parent_id(ids, 0)
    want = np.array([(2 * p[2] + 1) << 60 for p in pts], dtype=np.uint64)
    np.testing.assert_array_equal(parents, want)
    assert s2.token(want) == ["1", "3", "5", "7", "9", "b"]


def test_parent_nesting_and_level():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-85, 85, 100)
    ids = s2.cellid_from_lonlat(lon, lat)
    assert (s2.cell_level(ids) == 30).all()
    prev = ids
    for lvl in (25, 12, 4, 0):
        par = s2.parent_id(ids, lvl)
        assert (s2.cell_level(par) == lvl).all()
        # range containment: child id within [parent - lsb + 1, parent + lsb - 1]
        lsb = np.uint64(1) << np.uint64(2 * (30 - lvl))
        lo = par - lsb + np.uint64(1)
        hi = par + lsb - np.uint64(1)
        assert ((prev >= lo) & (prev <= hi)).all()
        prev = par


def test_nearby_points_share_coarse_parent():
    base_lon, base_lat = 13.40, 52.52
    lon = base_lon + np.array([0.0, 1e-7, -1e-7])
    lat = base_lat + np.array([0.0, 1e-7, -1e-7])
    ids = s2.cellid_from_lonlat(lon, lat)
    p = s2.parent_id(ids, 20)
    assert len(np.unique(p)) == 1
    far = s2.cellid_from_lonlat(np.array([base_lon + 10]),
                                np.array([base_lat]))
    assert s2.parent_id(far, 8)[0] != s2.parent_id(ids, 8)[0]


def test_with_s2_columns(spark):
    df = spark.createDataFrame(
        [(0, 13.4, 52.52), (1, -74.0, 40.7), (2, 139.7, 35.7)],
        "doc_id long, lon double, lat double")
    out = s2.with_s2_columns(df, level=10).orderBy("doc_id").collect()
    ids = s2.cellid_from_lonlat(np.array([13.4, -74.0, 139.7]),
                                np.array([52.52, 40.7, 35.7]))
    want = ids.view(np.int64)
    want_par = s2.parent_id(ids, 10).view(np.int64)
    assert [r.s2_id for r in out] == want.tolist()
    assert [r.s2_id_l10 for r in out] == want_par.tolist()
    assert out[0].lon == 13.4  # original columns pass through


@pytest.mark.parametrize("lon,lat", [(0.0, 45.0), (45.0, 35.26),
                                     (-135.0, -35.26), (179.999, 0.0)])
def test_face_boundaries_stay_in_range(lon, lat):
    ids = s2.cellid_from_lonlat(np.array([lon]), np.array([lat]))
    assert 0 <= int(ids[0]) >> 61 <= 5
    assert int(ids[0]) & 1 == 1
