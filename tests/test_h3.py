"""H3-style aperture-7 hex index (functions/h3.py).

Cross-checks the vectorized encoder three ways: an independent scalar
walker written directly from the published H3 grid math, decode/encode
fixed-point and distance invariants, and structural bit-layout checks.
The DuckDB replay of the same walk lives in queries.py (h3_cells oracle).
"""

import math

import numpy as np
import pytest

from gdal_spark.functions import h3


def scalar_encode(lon_deg: float, lat_deg: float, res: int) -> int:
    """Independent per-point walker (plain Python floats, no numpy
    vector ops) following h3lib's published pipeline:
    _geoToHex2d -> _hex2dToCoordIJK -> _faceIjkToH3."""
    lam, phi = math.radians(lon_deg), math.radians(lat_deg)
    x = math.cos(phi) * math.cos(lam)
    y = math.cos(phi) * math.sin(lam)
    z = math.sin(phi)
    face, best = -1, -2.0
    for f in range(20):
        d = (x * h3.FACE_XYZ[f, 0] + y * h3.FACE_XYZ[f, 1]
             + z * h3.FACE_XYZ[f, 2])
        if d > best:
            face, best = f, d
    ang = math.acos(min(1.0, max(-1.0, best)))
    lat1, lon1 = float(h3.FACE_LAT[face]), float(h3.FACE_LON[face])
    dlon = lam - lon1
    az = math.atan2(
        math.cos(phi) * math.sin(dlon),
        math.cos(lat1) * math.sin(phi)
        - math.sin(lat1) * math.cos(phi) * math.cos(dlon))
    theta = float(h3.FACE_AZ0[face]) - az
    if res % 2 == 1:
        theta -= h3.AP7_ROT
    r = math.tan(ang) / h3.RES0_U_GNOMONIC * h3._pow7(res)
    hx, hy = r * math.cos(theta), r * math.sin(theta)

    fj = hy / h3.SQRT3_2
    fi = hx + 0.5 * fj
    fc = -fi - fj

    def rnd(v):
        return math.floor(v + 0.5) if v >= 0 else -math.floor(0.5 - v)

    ri, rj, rc = rnd(fi), rnd(fj), rnd(fc)
    di, dj, dc = abs(ri - fi), abs(rj - fj), abs(rc - fc)
    if di > dj and di > dc:
        ri = -rj - rc
    elif dj > dc:
        rj = -ri - rc
    ci, cj = int(ri), int(rj)

    digit_of = {(0, 0): 0, (-1, -1): 1, (0, 1): 2, (-1, 0): 3,
                (1, 0): 4, (0, -1): 5, (1, 1): 6}
    digits = 0
    for r_ in range(res, 0, -1):
        if r_ % 2 == 1:
            pi = rnd((3.0 * ci - cj) / 7.0)
            pj = rnd((ci + 2.0 * cj) / 7.0)
            center_i, center_j = pi * 2 + pj, -pi + pj * 3
        else:
            pi = rnd((2.0 * ci + cj) / 7.0)
            pj = rnd((3.0 * cj - ci) / 7.0)
            center_i, center_j = pi * 3 - pj, pi + pj * 2
        digits |= digit_of[(ci - int(center_i), cj - int(center_j))] \
            << (3 * (15 - r_))
        ci, cj = int(pi), int(pj)
    digits |= (1 << (3 * (15 - res))) - 1
    return (res << 58) | (face << 53) | ((ci + 8) << 49) \
        | ((cj + 8) << 45) | digits


@pytest.fixture(scope="module")
def sample():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180.0, 180.0, 400)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 400)))
    return lon, lat


@pytest.mark.parametrize("res", [0, 1, 2, 7, 9, 15])
def test_matches_independent_scalar_walker(sample, res):
    lon, lat = sample
    vec = h3.encode(lon, lat, res)
    ref = np.array([scalar_encode(float(a), float(b), res)
                    for a, b in zip(lon, lat)], dtype=np.int64)
    assert np.array_equal(vec, ref)


def test_bit_layout_and_res_field(sample):
    lon, lat = sample
    for res in (0, 4, 9, 15):
        ids = h3.encode(lon, lat, res)
        assert np.all(ids >= 0)                       # bit 63/62 unused
        assert np.all(h3.cell_res(ids) == res)
        fill = (np.int64(1) << (3 * (15 - res))) - 1
        assert np.all((ids & fill) == fill)           # unused digits = 7
        faces = (ids >> 53) & 31
        assert faces.min() >= 0 and faces.max() <= 19


def test_parent_is_prefix_and_matches_direct_walk(sample):
    lon, lat = sample
    child = h3.encode(lon, lat, 9)
    par = h3.parent_id(child, 5)
    assert np.all(h3.cell_res(par) == 5)
    shift = 3 * (15 - 5)
    low = (np.int64(1) << shift) - 1
    # everything above the masked digits except the res field is shared:
    # face, res-0 coords, digits 1..5 form a literal bit prefix
    mask_hi = ((np.int64(1) << 58) - 1) & ~low
    assert np.array_equal(par & mask_hi, child & mask_hi)
    # masked digits are all 7s (H3 unused-digit marker)
    assert np.all((par & low) == low)
    # and grouping by parent is coarser than by child
    assert len(np.unique(par)) <= len(np.unique(child))


def test_decode_fixed_point_fine_res(sample):
    lon, lat = sample
    for res in (9, 12, 15):
        ids = h3.encode(lon, lat, res)
        clon, clat = h3.decode_center(ids)
        assert np.array_equal(h3.encode(clon, clat, res), ids)


def test_decode_center_is_inside_cell(sample):
    """Angular distance point->cell-center bounded by the cell
    circumradius (~ gnomonic unit / sqrt(7)^res, with slack for
    gnomonic distortion at face edges)."""
    lon, lat = sample
    for res in (1, 3, 5, 9):
        ids = h3.encode(lon, lat, res)
        clon, clat = h3.decode_center(ids)
        p = np.radians(np.stack([lat, lon], 1))
        c = np.radians(np.stack([clat, clon], 1))
        d = np.arccos(np.clip(
            np.sin(p[:, 0]) * np.sin(c[:, 0])
            + np.cos(p[:, 0]) * np.cos(c[:, 0]) * np.cos(p[:, 1] - c[:, 1]),
            -1, 1))
        bound = 2.0 * math.atan(h3.RES0_U_GNOMONIC / h3._pow7(res))
        assert np.all(d <= bound), (res, d.max(), bound)


def test_res0_census_covers_all_faces():
    """Dense global sample: every face owns cells; the face-local res-0
    census is deterministic (documented deviation: edge hexes are
    per-face, so the count exceeds canonical H3's 122)."""
    g = np.linspace(-179.5, 179.5, 240)
    t = np.degrees(np.arcsin(np.linspace(-0.999, 0.999, 121)))
    lon, lat = [a.ravel() for a in np.meshgrid(g, t)]
    ids = np.unique(h3.encode(lon, lat, 0))
    faces = np.unique((ids >> 53) & 31)
    assert len(faces) == 20
    assert 122 <= len(ids) <= 320


def test_aperture7_children_count():
    """Every res-(r-1) cell splits into ~7 res-r cells (exactly 7 in
    the hex interior)."""
    rng = np.random.RandomState(3)
    lon = rng.uniform(-3, 3, 20000)
    lat = rng.uniform(-3, 3, 20000)
    c5 = h3.encode(lon, lat, 4)
    c6 = h3.encode(lon, lat, 5)
    # group children by their walked parent (drop last digit)
    par_of_6 = h3.parent_id(c6, 4)
    import collections
    kids = collections.defaultdict(set)
    for p, c in zip(par_of_6.tolist(), c6.tolist()):
        kids[p].add(c)
    sizes = np.array([len(v) for v in kids.values()])
    assert sizes.max() <= 7
    assert (sizes == 7).mean() > 0.5  # most sampled parents fully covered
    # Parent-by-walk vs direct coarse encode: aperture-7 children
    # overhang their parent (H3's documented approximate containment),
    # so ideal planar agreement is 64.4% (measured by Monte Carlo on
    # the rotated ideal grids; the WRONG Class III rotation sign gives
    # 0.03%). Assert we sit at the ideal value, not the misaligned one.
    agree = (par_of_6 == c5).mean()
    assert 0.60 < agree < 0.70, agree


def test_with_h3_columns_spark(spark):
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": np.arange(64),
        "lon": np.linspace(-170, 170, 64),
        "lat": np.linspace(-80, 80, 64),
    })
    df = spark.createDataFrame(pdf)
    out = h3.with_h3_columns(df, res=9, parent_res=5).toPandas()
    ids = h3.encode(pdf.lon.to_numpy(), pdf.lat.to_numpy(), 9)
    assert np.array_equal(np.sort(out.h3_id.to_numpy()), np.sort(ids))
    assert np.array_equal(
        np.sort(out.h3_id_r5.to_numpy()),
        np.sort(h3.parent_id(ids, 5)))
