"""SRS transform family validation.

Strategy (no external goldens needed): every projection is checked by
independent mathematical invariants — exact round-trips, unit scale
factor on standard parallels by numerical differentiation (conformal
LCC), the ellipsoidal area element for Albers (equal-area Jacobian), a
from-scratch *spherical* twin at f=0, WKT codec round-trips, exact
polynomial/TPS recovery, and the ApproxTransform error bound against the
exact chain.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.functions import srs as S

RNG = np.random.RandomState(7)


def conus_lcc():
    return S.LambertConformalConic(lat1=33.0, lat2=45.0, lat0=23.0,
                                   lon0=-96.0, fe=0.0, fn=0.0)


def conus_albers():
    return S.AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0)


@pytest.mark.parametrize("crs", [conus_lcc(), conus_albers(),
                                 S.utm_crs(18), S.WebMercator()])
def test_roundtrip(crs):
    lon = RNG.uniform(-120, -70, 500)
    lat = RNG.uniform(25, 50, 500)
    x, y = crs.forward(lon, lat)
    lon2, lat2 = crs.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_lcc_scale_factor_on_standard_parallels():
    """Conformal scale k = 1 exactly on both standard parallels; > 1
    outside, < 1 between (Snyder ch. 15). k measured by numerical
    differentiation along a parallel — fully independent of the series."""
    crs = conus_lcc()
    e = np.sqrt(crs.f * (2 - crs.f))
    for lat, expect in [(33.0, 1.0), (45.0, 1.0)]:
        d = 1e-6
        x1, y1 = crs.forward(-96.0, lat)
        x2, y2 = crs.forward(-96.0 + d, lat)
        dist = np.hypot(x2 - x1, y2 - y1)
        phi = np.deg2rad(lat)
        true = (np.deg2rad(d) * crs.a * np.cos(phi)
                / np.sqrt(1 - (e * np.sin(phi)) ** 2))
        assert abs(dist / true - expect) < 1e-6
    # between the parallels k < 1, outside k > 1
    def k(lat):
        d = 1e-6
        x1, y1 = crs.forward(-96.0, lat)
        x2, y2 = crs.forward(-96.0 + d, lat)
        phi = np.deg2rad(lat)
        true = (np.deg2rad(d) * crs.a * np.cos(phi)
                / np.sqrt(1 - (e * np.sin(phi)) ** 2))
        return float(np.hypot(x2 - x1, y2 - y1) / true)
    assert k(39.0) < 1.0 < k(50.0)
    assert k(25.0) > 1.0


def test_lcc_central_meridian_maps_to_false_easting():
    crs = S.LambertConformalConic(lat1=33, lat2=45, lat0=23, lon0=-96,
                                  fe=2000000.0, fn=500000.0)
    x, y = crs.forward(np.full(5, -96.0), np.linspace(25, 50, 5))
    np.testing.assert_allclose(x, 2000000.0, atol=1e-6)
    # y increases with latitude
    assert np.all(np.diff(y) > 0)


def test_albers_equal_area_jacobian():
    """The defining property: the Jacobian determinant of (x, y) w.r.t.
    (lon, lat) radians equals the ellipsoidal area element
    a²(1-e²)cosφ/(1-e²sin²φ)² everywhere (Snyder ch. 14)."""
    crs = conus_albers()
    e2 = crs.f * (2 - crs.f)
    lon = RNG.uniform(-120, -70, 200)
    lat = RNG.uniform(24, 50, 200)
    d = 1e-6
    x0, y0 = crs.forward(lon, lat)
    xl, yl = crs.forward(lon + d, lat)
    xp, yp = crs.forward(lon, lat + d)
    dr = np.deg2rad(d)
    jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (dr * dr)
    phi = np.deg2rad(lat)
    s2 = np.sin(phi) ** 2
    element = crs.a ** 2 * (1 - e2) * np.cos(phi) / (1 - e2 * s2) ** 2
    np.testing.assert_allclose(jac, element, rtol=2e-4)


def _spherical_lcc(lat1, lat2, lat0, lon0, a):
    """Independent spherical LCC (Snyder eqs 15-1..15-4 with e=0),
    written from the textbook formulas — shares no code with srs.py."""
    p1, p2, p0 = map(np.deg2rad, (lat1, lat2, lat0))
    if abs(p1 - p2) < 1e-12:
        n = np.sin(p1)
    else:
        n = (np.log(np.cos(p1) / np.cos(p2))
             / np.log(np.tan(np.pi / 4 + p2 / 2) / np.tan(np.pi / 4 + p1 / 2)))
    big_f = np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** n / n
    rho0 = a * big_f / np.tan(np.pi / 4 + p0 / 2) ** n

    def fwd(lon, lat):
        phi = np.deg2rad(lat)
        rho = a * big_f / np.tan(np.pi / 4 + phi / 2) ** n
        th = n * np.deg2rad(lon - lon0)
        return rho * np.sin(th), rho0 - rho * np.cos(th)

    return fwd


def test_lcc_matches_spherical_twin_at_f0():
    crs = S.LambertConformalConic(lat1=33, lat2=45, lat0=23, lon0=-96,
                                  a=6370997.0, f=0.0)
    twin = _spherical_lcc(33, 45, 23, -96, 6370997.0)
    lon = RNG.uniform(-120, -70, 100)
    lat = RNG.uniform(25, 50, 100)
    x1, y1 = crs.forward(lon, lat)
    x2, y2 = twin(lon, lat)
    np.testing.assert_allclose(x1, x2, atol=1e-6)
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_wkt_codec_roundtrip_all_kinds():
    for crs in (conus_lcc(), conus_albers(), S.utm_crs(18), S.Geographic()):
        wkt = S.crs_to_wkt(crs)
        back = S.crs_from_wkt(wkt)
        assert type(back) is type(crs)
        lon = np.array([-96.0, -80.0]); lat = np.array([30.0, 45.0])
        np.testing.assert_allclose(np.c_[crs.forward(lon, lat)],
                                   np.c_[back.forward(lon, lat)], atol=1e-9)


def test_genimgproj_compose_lcc_to_geographic():
    """dst geographic grid → src LCC raster: the composed chain equals
    manual step-by-step application."""
    lcc = conus_lcc()
    src_gt = (-2500000.0, 5000.0, 0.0, 2000000.0, 0.0, -5000.0)  # LCC meters
    dst_gt = (-120.0, 0.05, 0.0, 50.0, 0.0, -0.05)               # degrees
    tr = S.GenImgProjTransform(src_gt, dst_gt, src_crs=lcc)
    px, py = np.meshgrid(np.arange(0, 100, 7.5), np.arange(0, 80, 3.5))
    sx, sy = tr(px, py)
    lon = dst_gt[0] + px * dst_gt[1]
    lat = dst_gt[3] + py * dst_gt[5]
    x, y = lcc.forward(lon, lat)
    np.testing.assert_allclose(sx, (x - src_gt[0]) / src_gt[1], atol=1e-9)
    np.testing.assert_allclose(sy, (y - src_gt[3]) / src_gt[5], atol=1e-9)


def test_gcp_polynomial_exact_recovery():
    """GCPs sampled from an order-2 model are recovered exactly (lstsq on
    a consistent system), matching gdal_crs.c behavior on exact inputs."""
    def model(px, py):
        return (10.0 + 2.0 * px - 0.5 * py + 0.01 * px * py
                + 0.002 * px * px - 0.003 * py * py,
                -5.0 + 0.25 * px + 1.5 * py - 0.02 * px * py
                + 0.001 * px * px + 0.004 * py * py)
    gx, gy = np.meshgrid(np.linspace(0, 100, 5), np.linspace(0, 80, 5))
    mx, my = model(gx.ravel(), gy.ravel())
    gcps = np.c_[gx.ravel(), gy.ravel(), mx, my]
    tr = S.GCPTransform(gcps, order=2)
    assert tr.max_fit_error < 1e-6
    qx = RNG.uniform(0, 100, 50); qy = RNG.uniform(0, 80, 50)
    ex, ey = model(qx, qy)
    ax, ay = tr.forward(qx, qy)
    np.testing.assert_allclose(ax, ex, atol=1e-6)
    np.testing.assert_allclose(ay, ey, atol=1e-6)


def test_gcp_order1_is_affine_and_order_errors():
    gcps = [(0, 0, 100, 200), (10, 0, 200, 200), (0, 10, 100, 100),
            (10, 10, 200, 100)]
    tr = S.GCPTransform(gcps, order=1)
    ax, ay = tr.forward(np.array([5.0]), np.array([5.0]))
    np.testing.assert_allclose([ax[0], ay[0]], [150.0, 150.0], atol=1e-9)
    ix, iy = tr.inverse(np.array([150.0]), np.array([150.0]))
    np.testing.assert_allclose([ix[0], iy[0]], [5.0, 5.0], atol=1e-9)
    with pytest.raises(ValueError):
        S.GCPTransform(gcps, order=3)  # too few points


def test_tps_interpolates_control_points_exactly():
    n = 12
    src = RNG.uniform(0, 100, (n, 2))
    dst = src * 1.5 + 10.0 + RNG.uniform(-3, 3, (n, 2))  # warped
    tr = S.TPSTransform(np.c_[src, dst])
    fx, fy = tr.forward(src[:, 0], src[:, 1])
    np.testing.assert_allclose(np.c_[fx, fy], dst, atol=1e-6)
    ix, iy = tr.inverse(dst[:, 0], dst[:, 1])
    np.testing.assert_allclose(np.c_[ix, iy], src, atol=1e-6)
    # smooth between control points: affine-dominated field stays close
    qx, qy = np.array([50.0]), np.array([50.0])
    ax, _ = tr.forward(qx, qy)
    assert 60.0 < ax[0] < 100.0


def test_approx_transform_error_bound_and_fallback():
    lcc = conus_lcc()
    src_gt = (-2500000.0, 5000.0, 0.0, 2000000.0, 0.0, -5000.0)
    dst_gt = (-120.0, 0.05, 0.0, 50.0, 0.0, -0.05)
    exact = S.GenImgProjTransform(src_gt, dst_gt, src_crs=lcc)
    approx = S.ApproxTransform(exact, max_err=0.25, step=16)
    px, py = np.meshgrid(np.arange(256, dtype=float) + 0.5,
                         np.arange(256, dtype=float) + 0.5)
    ex, ey = exact(px, py)
    ax, ay = approx(px, py)
    err = np.hypot(ax - ex, ay - ey)
    assert float(err.max()) <= 0.25
    # tiny inputs bypass the lattice entirely
    small = approx(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    np.testing.assert_allclose(
        np.c_[small], np.c_[exact(np.array([1.0, 2.0]), np.array([3.0, 4.0]))])


def test_sql_twins_match_numpy(tmp_path):
    """The SQL expression generators (oracle twins) agree with the numpy
    projections to sub-micron — same formulas, libm vs numpy ulps only."""
    import duckdb
    con = duckdb.connect()
    lon = RNG.uniform(-120, -70, 200)
    lat = RNG.uniform(25, 50, 200)
    con.execute("CREATE TABLE pts AS SELECT * FROM (VALUES "
                + ",".join(f"({a!r}, {b!r})" for a, b in zip(lon, lat))
                + ") t(lon, lat)")
    lcc = conus_lcc()
    xs, ys = S.sql_lcc_forward(lcc, "lon", "lat")
    got = np.array(con.execute(f"SELECT {xs}, {ys} FROM pts").fetchall())
    ex, ey = lcc.forward(lon, lat)
    np.testing.assert_allclose(got[:, 0], ex, atol=1e-6)
    np.testing.assert_allclose(got[:, 1], ey, atol=1e-6)

    alb = conus_albers()
    xs, ys = S.sql_albers_forward(alb, "lon", "lat")
    got = np.array(con.execute(f"SELECT {xs}, {ys} FROM pts").fetchall())
    ex, ey = alb.forward(lon, lat)
    np.testing.assert_allclose(got[:, 0], ex, atol=1e-6)
    np.testing.assert_allclose(got[:, 1], ey, atol=1e-6)

    # UTM inverse twin: project forward in numpy, invert in SQL
    utm = S.utm_crs(18)
    E, N = utm.forward(lon, lat)
    con.execute("CREATE TABLE en AS SELECT * FROM (VALUES "
                + ",".join(f"({a!r}, {b!r})" for a, b in zip(E, N))
                + ") t(e, n)")
    lx, ly = S.sql_tm_inverse("e", "n", lon0=utm.lon0)
    got = np.array(con.execute(f"SELECT {lx}, {ly} FROM en").fetchall())
    np.testing.assert_allclose(got[:, 0], lon, atol=1e-9)
    np.testing.assert_allclose(got[:, 1], lat, atol=1e-9)


def test_warp_with_approx_transform_matches_exact(spark):
    """Distributed warp through ApproxTransform equals the exact-chain
    warp within the 0.25 px error bound (nearest kernel: identical except
    pixels whose source coord sits within 0.25 px of a pixel edge — on
    this fixture the outputs are identical)."""
    import numpy as np
    from gdal_spark.raster import model as M
    from gdal_spark.raster import resample as RS

    lcc = conus_lcc()
    # source grid anchored on the projected NW corner of the dst window
    ax, ay = lcc.forward(np.array([-74.28, -74.28, -74.024, -74.024]),
                         np.array([40.744, 41.0, 40.744, 41.0]))
    src_gt = (float(ax.min()) - 1000.0, 500.0, 0.0,
              float(ay.max()) + 1000.0, 0.0, -500.0)
    src_meta = M.RasterMeta("s", 96, 96, gt=src_gt, block=32)
    arr = ((np.arange(96 * 96).reshape(96, 96) * 13) % 251).astype(np.uint8)
    tiles = M.from_array(spark, arr, src_meta)
    dst_meta = M.RasterMeta("d", 64, 64,
                            gt=(-74.28, 0.004, 0.0, 41.0, 0.0, -0.004),
                            block=32)
    exact = S.GenImgProjTransform(src_gt, dst_meta.gt, src_crs=lcc)
    approx = S.ApproxTransform(exact, max_err=0.05, step=16)
    out_e = M.to_array(RS.warp(tiles, src_meta, dst_meta, "nearest",
                               src_from_dst=exact), dst_meta)
    out_a = M.to_array(RS.warp(tiles, src_meta, dst_meta, "nearest",
                               src_from_dst=approx), dst_meta)
    diff = (out_e != out_a).mean()
    assert diff < 0.01  # sub-ulp lattice error can flip only edge-sitting pixels
    assert out_e.any()  # the window genuinely overlaps the source


# ---------------------------------------------------------------------------
# RPC transform (gdal/alg/gdal_rpc.cpp analog)
# ---------------------------------------------------------------------------

def _affine_rpc():
    """RPC whose rational polynomials encode an affine + mild cubic
    nonlinearity: samp_n = L + 0.02*L*P, line_n = P - 0.01*L*L (den = 1)."""
    z = [0.0] * 20
    samp_num = list(z); samp_num[1] = 1.0; samp_num[4] = 0.02
    line_num = list(z); line_num[2] = 1.0; line_num[7] = -0.01
    den = list(z); den[0] = 1.0
    return S.RPCModel(
        line_off=512.0, samp_off=512.0, lat_off=40.0, long_off=-74.0,
        height_off=0.0, line_scale=512.0, samp_scale=512.0,
        lat_scale=0.5, long_scale=0.5, height_scale=100.0,
        line_num=tuple(line_num), line_den=tuple(den),
        samp_num=tuple(samp_num), samp_den=tuple(den))


def test_rpc_direct_evaluation_matches_closed_form():
    t = S.RPCTransform(_affine_rpc())
    lon = np.array([-74.0, -73.8, -74.3])
    lat = np.array([40.0, 40.2, 39.9])
    sx, sy = t.inverse(lon, lat)
    L = (lon + 74.0) / 0.5
    P = (lat - 40.0) / 0.5
    np.testing.assert_allclose(sx, (L + 0.02 * L * P) * 512.0 + 512.0,
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(sy, (P - 0.01 * L * L) * 512.0 + 512.0,
                               rtol=0, atol=1e-9)


def test_rpc_inverse_roundtrip():
    t = S.RPCTransform(_affine_rpc())
    px = np.linspace(100.0, 900.0, 9)
    py = np.linspace(50.0, 950.0, 9)
    lon, lat = t.forward(px, py)
    bx, by = t.inverse(lon, lat)
    np.testing.assert_allclose(bx, px, rtol=0, atol=1e-6)
    np.testing.assert_allclose(by, py, rtol=0, atol=1e-6)


def test_rpc_in_genimgproj_chain():
    """dst plain geotransform -> geographic -> RPC src pixel: the composed
    src_from_dst agrees with applying the pieces by hand."""
    rpc = S.RPCTransform(_affine_rpc())
    dst_gt = (-74.3, 0.001, 0.0, 40.3, 0.0, -0.001)
    chain = S.GenImgProjTransform(src_gt=None, dst_gt=dst_gt, src_gcp=rpc)
    px = np.array([10.0, 200.0])
    py = np.array([20.0, 400.0])
    lon = dst_gt[0] + px * dst_gt[1]
    lat = dst_gt[3] + py * dst_gt[5]
    ex, ey = rpc.inverse(lon, lat)
    gx, gy = chain(px, py)
    np.testing.assert_allclose(gx, ex, rtol=0, atol=1e-9)
    np.testing.assert_allclose(gy, ey, rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# geolocation-array transform (gdal/alg/gdalgeoloc.cpp analog)
# ---------------------------------------------------------------------------

def _curved_geoloc(step=4.0):
    """Geoloc arrays on a 17x9 subsampled grid (PIXEL_STEP=LINE_STEP=4)
    from a smooth curved mapping."""
    gy, gx = np.mgrid[0:9, 0:17]
    px = gx * step
    py = gy * step
    lon = -100.0 + 0.01 * px + 1e-5 * py * py
    lat = 35.0 - 0.01 * py + 2e-5 * px * px
    return lon, lat, step


def test_geoloc_forward_exact_at_nodes_and_bilinear_between():
    lon, lat, step = _curved_geoloc()
    t = S.GeolocTransform(lon, lat, pixel_step=step, line_step=step)
    # node: raster pixel (8, 4) -> grid index (2, 1)
    fx, fy = t.forward(np.array([8.0]), np.array([4.0]))
    assert abs(fx[0] - lon[1, 2]) < 1e-12
    assert abs(fy[0] - lat[1, 2]) < 1e-12
    # midpoint between grid nodes = arithmetic mean (bilinear)
    fx, fy = t.forward(np.array([10.0]), np.array([4.0]))
    assert abs(fx[0] - (lon[1, 2] + lon[1, 3]) / 2) < 1e-12
    assert abs(fy[0] - (lat[1, 2] + lat[1, 3]) / 2) < 1e-12


def test_geoloc_inverse_roundtrip():
    lon, lat, step = _curved_geoloc()
    t = S.GeolocTransform(lon, lat, pixel_step=step, line_step=step)
    px = np.linspace(1.0, 60.0, 13)
    py = np.linspace(1.0, 30.0, 13)
    x, y = t.forward(px, py)
    bx, by = t.inverse(x, y)
    np.testing.assert_allclose(bx, px, rtol=0, atol=1e-6)
    np.testing.assert_allclose(by, py, rtol=0, atol=1e-6)


def test_geoloc_validates_array_shape():
    with pytest.raises(ValueError):
        S.GeolocTransform(np.zeros((1, 5)), np.zeros((1, 5)))


def test_crs_from_epsg():
    import numpy as np
    import pytest

    from gdal_spark.functions import srs as S

    assert isinstance(S.crs_from_epsg(4326), S.Geographic)
    assert isinstance(S.crs_from_epsg(3857), S.WebMercator)
    utm31 = S.crs_from_epsg(32631)
    assert utm31.lon0 == 3.0 and utm31.fn == 0.0
    utm33s = S.crs_from_epsg(32733)
    assert utm33s.lon0 == 15.0 and utm33s.fn > 0
    alb = S.crs_from_epsg(5070)
    x, y = alb.forward(np.array([-96.0]), np.array([23.0]))
    assert abs(float(x[0])) < 1e-6 and abs(float(y[0])) < 1e-6  # origin
    # since round 4 the long tail resolves through the bundled EPSG
    # registry tables (functions/epsg.py)
    l93 = S.crs_from_epsg(2154)  # RGF93 / Lambert-93
    base = l93.crs if isinstance(l93, S.DatumShifted) else l93
    assert isinstance(base, S.LambertConformalConic)
    with pytest.raises(ValueError, match="not in the bundled"):
        S.crs_from_epsg(999999)
