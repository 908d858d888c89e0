"""Transverse Mercator / UTM coordinate transforms (any ellipsoid;
WGS84 coefficients precomputed).

Reference analog: the PROJ pipeline GDAL composes into its
GenImgProjTransformer (gdal/alg/gdaltransformer.cpp:974) — PROJ's etmerc
implements the same Krüger series this module carries (order n^6, the
"Transverse Mercator with an accuracy of a few nanometers" formulation;
max error < 1 nm inside a UTM zone, sub-mm out to ~60 deg from the
central meridian). Everything is vectorized numpy over coordinate
arrays, so the transforms plug directly into ``raster.resample.warp``'s
``src_from_dst`` callable — the distributed gdalwarp path reprojects
lon/lat rasters to UTM (and back) with zero per-row Python.

Validation strategy (tests/test_proj.py): exact round-trips, central
meridian maps to the false easting with northing = k0 * meridian arc
(checked against an independent numeric integration of the meridian
integral), scale factor 0.9996 at the central meridian by numerical
differentiation, and east-west antisymmetry.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
UTM_K0 = 0.9996
UTM_FE = 500000.0
UTM_FN_SOUTH = 10000000.0

def kruger_coefficients(f: float):
    """Krüger series coefficients, order n^6 (Karney 2011, eqs. 35/36/
    ...), for an arbitrary ellipsoid given by flattening ``f``. Returns
    ``(abar_over_a, alpha, beta, delta, e2sqrtn)`` where the rectifying
    radius is ``a * abar_over_a``. The WGS84 module constants below are
    this function evaluated at WGS84_F (bit-identical — same expression
    order), so the general path and the precomputed UTM path agree."""
    _n = f / (2.0 - f)
    _n2, _n3, _n4, _n5, _n6 = _n**2, _n**3, _n**4, _n**5, _n**6
    abar_over_a = 1.0 / (1 + _n) * (1 + _n2 / 4 + _n4 / 64 + _n6 / 256)
    alpha = np.array([
        _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180
        - 127 * _n5 / 288 + 7891 * _n6 / 37800,
        13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630
        - 1983433 * _n6 / 1935360,
        61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880
        + 167603 * _n6 / 181440,
        49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
        34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
        212378941 * _n6 / 319334400,
    ])
    beta = np.array([
        _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360
        - 81 * _n5 / 512 + 96199 * _n6 / 604800,
        _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105
        - 1118711 * _n6 / 3870720,
        17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480
        + 5569 * _n6 / 90720,
        4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
        4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
        20648693 * _n6 / 638668800,
    ])
    delta = np.array([
        2 * _n - 2 * _n2 / 3 - 2 * _n3 + 116 * _n4 / 45 + 26 * _n5 / 45
        - 2854 * _n6 / 675,
        7 * _n2 / 3 - 8 * _n3 / 5 - 227 * _n4 / 45 + 2704 * _n5 / 315
        + 2323 * _n6 / 945,
        56 * _n3 / 15 - 136 * _n4 / 35 - 1262 * _n5 / 105 + 73814 * _n6 / 2835,
        4279 * _n4 / 630 - 332 * _n5 / 35 - 399572 * _n6 / 14175,
        4174 * _n5 / 315 - 144838 * _n6 / 6237,
        601676 * _n6 / 22275,
    ])
    e2sqrtn = 2.0 * np.sqrt(_n) / (1.0 + _n)
    return abar_over_a, alpha, beta, delta, e2sqrtn


_ABAR_F, ALPHA, BETA, DELTA, _E2SQRTN = kruger_coefficients(WGS84_F)
# rectifying radius (WGS84)
A_BAR = WGS84_A * _ABAR_F


def _coeffs_for(a: float, f: float):
    if a == WGS84_A and f == WGS84_F:
        return A_BAR, ALPHA, BETA, DELTA, _E2SQRTN
    abar_f, alpha, beta, delta, e2sqrtn = kruger_coefficients(f)
    return a * abar_f, alpha, beta, delta, e2sqrtn


def tm_forward(lat, lon, lon0: float, k0: float = UTM_K0,
               fe: float = UTM_FE, fn: float = 0.0,
               a: float = WGS84_A, f: float = WGS84_F):
    """Geodetic → transverse-Mercator easting/northing (vectorized)."""
    abar, alpha, _beta, _delta, e2sqrtn = _coeffs_for(a, f)
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0)
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - e2sqrtn * np.arctanh(e2sqrtn * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    j = np.arange(1, 7)
    xi = xi_p + (alpha * np.sin(2 * j * xi_p[..., None])
                 * np.cosh(2 * j * eta_p[..., None])).sum(axis=-1)
    eta = eta_p + (alpha * np.cos(2 * j * xi_p[..., None])
                   * np.sinh(2 * j * eta_p[..., None])).sum(axis=-1)
    return fe + k0 * abar * eta, fn + k0 * abar * xi


def tm_inverse(easting, northing, lon0: float, k0: float = UTM_K0,
               fe: float = UTM_FE, fn: float = 0.0,
               a: float = WGS84_A, f: float = WGS84_F):
    """Transverse-Mercator easting/northing → geodetic (vectorized)."""
    abar, _alpha, beta, delta, _e2sqrtn = _coeffs_for(a, f)
    xi = (np.asarray(northing, dtype=np.float64) - fn) / (k0 * abar)
    eta = (np.asarray(easting, dtype=np.float64) - fe) / (k0 * abar)
    j = np.arange(1, 7)
    xi_p = xi - (beta * np.sin(2 * j * xi[..., None])
                 * np.cosh(2 * j * eta[..., None])).sum(axis=-1)
    eta_p = eta - (beta * np.cos(2 * j * xi[..., None])
                   * np.sinh(2 * j * eta[..., None])).sum(axis=-1)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi + (delta * np.sin(2 * j * chi[..., None])).sum(axis=-1)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(phi), lon0 + np.rad2deg(lam)


def utm_zone(lon: float) -> int:
    """UTM zone number for a longitude (1-60)."""
    return int(np.floor((lon + 180.0) / 6.0)) % 60 + 1


def utm_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


def utm_from_latlon(lat, lon, zone: int, north: bool = True):
    fn = 0.0 if north else UTM_FN_SOUTH
    return tm_forward(lat, lon, utm_central_meridian(zone), fn=fn)


def latlon_from_utm(easting, northing, zone: int, north: bool = True):
    fn = 0.0 if north else UTM_FN_SOUTH
    return tm_inverse(easting, northing, utm_central_meridian(zone), fn=fn)


class UtmWarpTransform:
    """Picklable ``src_from_dst`` for :func:`raster.resample.warp`:
    dst pixels on a UTM grid → source pixels on a lon/lat grid (the
    gdalwarp EPSG:4326 → UTM path). Both geotransforms must be
    axis-aligned."""

    def __init__(self, src_gt, dst_gt, zone: int, north: bool = True):
        self.src_gt = tuple(src_gt)
        self.dst_gt = tuple(dst_gt)
        self.zone = zone
        self.north = north

    def __call__(self, px, py):
        d = self.dst_gt
        e = d[0] + np.asarray(px, dtype=np.float64) * d[1]
        n = d[3] + np.asarray(py, dtype=np.float64) * d[5]
        lat, lon = latlon_from_utm(e, n, self.zone, self.north)
        s = self.src_gt
        return (lon - s[0]) / s[1], (lat - s[3]) / s[5]


def meridian_arc_numeric(lat_deg: float, n_steps: int = 200000) -> float:
    """Independent meridian-arc length by composite-Simpson integration of
    M(phi) = a(1-e^2) ∫ (1 - e^2 sin^2)^(-3/2) dphi — the test oracle for
    the series (no shared code with the Krüger path)."""
    e2 = WGS84_F * (2.0 - WGS84_F)
    phi = np.linspace(0.0, np.deg2rad(lat_deg), 2 * n_steps + 1)
    f = (1.0 - e2 * np.sin(phi) ** 2) ** -1.5
    h = phi[1] - phi[0] if len(phi) > 1 else 0.0
    simpson = (f[0] + f[-1] + 4.0 * f[1:-1:2].sum() + 2.0 * f[2:-1:2].sum())
    return WGS84_A * (1.0 - e2) * simpson * h / 3.0
