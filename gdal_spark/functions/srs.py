"""General SRS transform family: projection registry, WKT1 CRS codec,
composed image-to-image transformers, GCP polynomial / thin-plate-spline
fitting, and the approximate lattice transformer.

Reference analogs (semantics only — all math re-derived from Snyder 1987
"Map Projections: A Working Manual" and Karney 2011; no reference code):

- ``GDALCreateGenImgProjTransformer`` (gdal/alg/gdaltransformer.cpp:974,
  1169) composes dst pixel → dst geo → CRS transform → src geo → src
  pixel; :class:`GenImgProjTransform` is that chain as a picklable
  numpy-vectorized ``src_from_dst`` for :func:`raster.resample.warp`.
- PROJ coordinate transforms (gdal/ogr/ogrct.cpp:810): here each
  projected CRS is a closed-form vectorized ``forward``/``inverse`` pair
  (Lambert Conformal Conic 2SP, Albers Equal-Area 2SP, Transverse
  Mercator via the Krüger series in functions/proj.py, Web/spherical
  Mercator, geographic identity).
- GCP polynomial transforms order 1-3 (gdal/alg/gdal_crs.c) →
  :class:`GCPTransform` (numpy least-squares fit, both directions).
- Thin-plate-spline transform (gdal/alg/gdal_tps.cpp) →
  :class:`TPSTransform` (exact interpolation through the GCPs).
- RPC transform (gdal/alg/gdal_rpc.cpp) → :class:`RPCTransform`
  (direct 3rd-degree rational evaluation geo→pixel, vectorized Newton
  pixel→geo at a fixed RPC_HEIGHT).
- Geolocation arrays (gdal/alg/gdalgeoloc.cpp) → :class:`GeolocTransform`
  (bilinear array interpolation forward, backmap-seeded Newton inverse).
- ApproxTransformer (gdal/alg/gdaltransformer.cpp:2625-3010, default
  max error 0.25 px, :3010) → :class:`ApproxTransform`: evaluates the
  exact transform on a coarse lattice, bilinearly interpolates all
  points, verifies the error on a strided sample of the *actual* inputs
  and refines the lattice until the error bound holds.

Everything is vectorized numpy over coordinate arrays — zero per-row
Python — so any of these plug into the distributed warp as
``src_from_dst``. SQL-expression generators (``sql_*``) emit the same
formulas as DuckDB-compatible text with constants embedded as exact
Python double reprs, giving warp queries value-checkable oracles.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np

from gdal_spark.functions import proj as PJ
from gdal_spark.functions import projections as PX
from gdal_spark.functions.projections import (  # noqa: F401 (re-export)
    CassiniSoldner, EquidistantConic, EquidistantCylindrical,
    HotineObliqueMercator, Krovak, LambertConformalConic1SP,
    LambertConformalConic2SPBelgium, LambertConformalConicWest,
    ObliqueStereographic, Polyconic, SwissObliqueMercator,
    TransverseMercatorSouth, UnitScaled)

WGS84 = (6378137.0, 1.0 / 298.257223563)
CLARKE_1866 = (6378206.4, 1.0 - 6356583.8 / 6378206.4)


# ---------------------------------------------------------------------------
# projections (forward: lon/lat deg -> x/y; inverse: x/y -> lon/lat deg)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Geographic:
    """Identity CRS: projected coords are (lon, lat) degrees. The
    ellipsoid fields only matter when the CRS is datum-shifted (a
    :class:`DatumShifted` wrapper references them)."""

    a: float = 6378137.0
    f: float = 1.0 / 298.257223563
    name = "geographic"

    def forward(self, lon, lat):
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)

    def inverse(self, x, y):
        return np.asarray(x, np.float64), np.asarray(y, np.float64)


class WebMercator:
    """Spherical Mercator EPSG:3857 (the gdal2tiles GlobalMercator grid)."""

    name = "webmercator"
    R = 6378137.0

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        x = np.deg2rad(lon) * self.R
        y = np.log(np.tan((90.0 + lat) * math.pi / 360.0)) * self.R
        return x, y

    def inverse(self, x, y):
        lon = np.rad2deg(np.asarray(x, np.float64) / self.R)
        lat = np.rad2deg(2.0 * np.arctan(np.exp(np.asarray(y, np.float64)
                                                / self.R)) - math.pi / 2.0)
        return lon, lat


def _m(phi, e):
    """Snyder 14-15: m = cos phi / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - (e * s) ** 2)


def _t(phi, e):
    """Snyder 15-9: isometric colatitude function."""
    s = np.sin(phi)
    return (np.tan(math.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def _q(phi, e):
    """Snyder 3-12: authalic q."""
    s = np.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - (e * s) ** 2)
                            - np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))


def _phi_from_t(t, e):
    """Snyder 7-9: latitude (rad) from the isometric colatitude function
    t, by fixed-point iteration (converges far past 1e-12 rad in 8
    rounds for geodetic eccentricities)."""
    t = np.asarray(t, np.float64)
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = (math.pi / 2.0
               - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)))
    return phi


def _phi_from_q(q, e):
    """Snyder 3-16: latitude (rad) from authalic q by Newton iteration.
    |q| at/above q(90°) short-circuits to ±90° (the pole), where the
    Newton step's 1/cos(phi) blows up."""
    q = np.asarray(q, np.float64)
    qp = float(_q(np.float64(math.pi / 2.0), e))
    e2 = e * e
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    at_pole = np.abs(q) >= qp * (1.0 - 1e-14)
    safe_q = np.where(at_pole, 0.0, q)
    for _ in range(10):
        s = np.sin(phi)
        one = 1.0 - e2 * s * s
        phi = phi + one * one / (2.0 * np.cos(phi)) * (
            safe_q / (1.0 - e2) - s / one
            + np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))
    return np.where(at_pole, np.sign(q) * (math.pi / 2.0), phi)


@dataclass(frozen=True)
class LambertConformalConic:
    """Lambert Conformal Conic, 2 standard parallels (EPSG method 9802;
    Snyder 1987 eqs 15-1..15-11, ellipsoidal form). Degrees in, meters
    out. All members derive from (lat1, lat2, lat0, lon0, FE, FN, a, f)."""

    lat1: float
    lat2: float
    lat0: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "lcc"

    def _consts(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        p0 = math.radians(self.lat0)
        m1, m2 = float(_m(p1, e)), float(_m(p2, e))
        t0, t1, t2 = float(_t(p0, e)), float(_t(p1, e)), float(_t(p2, e))
        if abs(p1 - p2) < 1e-12:
            n = math.sin(p1)
        else:
            n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        big_f = m1 / (n * t1 ** n)
        rho0 = self.a * big_f * t0 ** n
        return e, n, big_f, rho0

    def forward(self, lon, lat):
        e, n, big_f, rho0 = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * big_f * _t(phi, e) ** n
        theta = n * lam
        return (self.fe + rho * np.sin(theta),
                self.fn + rho0 - rho * np.cos(theta))

    def inverse(self, x, y):
        e, n, big_f, rho0 = self._consts()
        dx = np.asarray(x, np.float64) - self.fe
        dy = rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(n) * np.hypot(dx, dy)
        theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        t = (rho / (self.a * big_f)) ** (1.0 / n)
        # Snyder 7-9: fixed-point iteration for phi from t (converges
        # quadratically fast for e < 0.1; 8 rounds reach 1e-12 rad)
        phi = math.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            s = e * np.sin(phi)
            phi = (math.pi / 2.0
                   - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)))
        return self.lon0 + np.rad2deg(theta / n), np.rad2deg(phi)


@dataclass(frozen=True)
class AlbersEqualArea:
    """Albers Conic Equal-Area, 2 standard parallels (EPSG method 9822;
    Snyder 1987 eqs 14-1..14-21, ellipsoidal form)."""

    lat1: float
    lat2: float
    lat0: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "albers"

    def _consts(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        p0 = math.radians(self.lat0)
        m1, m2 = float(_m(p1, e)), float(_m(p2, e))
        q0, q1, q2 = float(_q(p0, e)), float(_q(p1, e)), float(_q(p2, e))
        if abs(p1 - p2) < 1e-12:
            n = math.sin(p1)
        else:
            n = (m1 * m1 - m2 * m2) / (q2 - q1)
        big_c = m1 * m1 + n * q1
        rho0 = self.a * math.sqrt(big_c - n * q0) / n
        return e, n, big_c, rho0

    def forward(self, lon, lat):
        e, n, big_c, rho0 = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * np.sqrt(big_c - n * _q(phi, e)) / n
        theta = n * lam
        return (self.fe + rho * np.sin(theta),
                self.fn + rho0 - rho * np.cos(theta))

    def inverse(self, x, y):
        e, n, big_c, rho0 = self._consts()
        dx = np.asarray(x, np.float64) - self.fe
        dy = rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.hypot(dx, dy)
        theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        q = (big_c - (rho * n / self.a) ** 2) / n
        # Snyder 3-16 Newton iteration for phi from authalic q
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        e2 = e * e
        for _ in range(10):
            s = np.sin(phi)
            one = 1.0 - e2 * s * s
            phi = phi + one * one / (2.0 * np.cos(phi)) * (
                q / (1.0 - e2) - s / one
                + np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))
        return self.lon0 + np.rad2deg(theta / n), np.rad2deg(phi)


@dataclass(frozen=True)
class TransverseMercator:
    """Transverse Mercator (EPSG 9807) delegating to the Krüger n^6
    series in functions/proj.py (coefficients derived per-ellipsoid;
    WGS84 precomputed). A non-zero ``lat0`` shifts the false northing
    by k0·M(lat0), the EPSG natural-origin convention — this is what
    e.g. the British National Grid (EPSG 27700, Airy 1830, lat0=49)
    uses."""

    lon0: float
    k0: float = PJ.UTM_K0
    fe: float = PJ.UTM_FE
    fn: float = 0.0
    lat0: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "tmerc"

    def _fn_eff(self) -> float:
        if self.lat0 == 0.0:
            return self.fn
        # k0 * meridian arc of lat0 = the northing the series assigns to
        # (lat0, lon0) with fn=0; subtract it so lat0 maps to fn exactly
        _, n0 = PJ.tm_forward(self.lat0, self.lon0, self.lon0, k0=self.k0,
                              fe=0.0, fn=0.0, a=self.a, f=self.f)
        return self.fn - float(n0)

    def forward(self, lon, lat):
        e, n = PJ.tm_forward(lat, lon, self.lon0, k0=self.k0,
                             fe=self.fe, fn=self._fn_eff(),
                             a=self.a, f=self.f)
        return e, n

    def inverse(self, x, y):
        lat, lon = PJ.tm_inverse(x, y, self.lon0, k0=self.k0,
                                 fe=self.fe, fn=self._fn_eff(),
                                 a=self.a, f=self.f)
        # PROJ normalizes output longitudes into (-180, 180] — a UTM
        # zone near the antimeridian (e.g. zone 60) otherwise produces
        # lon > 180 and -wrapdateline never sees the hop
        # (test_ogr2ogr_18)
        lon = np.where(lon > 180.0, lon - 360.0,
                       np.where(lon <= -180.0, lon + 360.0, lon))
        return lon, lat


def utm_crs(zone: int, north: bool = True) -> TransverseMercator:
    return TransverseMercator(lon0=PJ.utm_central_meridian(zone),
                              fn=0.0 if north else PJ.UTM_FN_SOUTH)


@dataclass(frozen=True)
class PolarStereographic:
    """Polar Stereographic (EPSG methods 9810 variant A / 9829 variant
    B; Snyder 1987 eqs 21-33..21-35, 20-14..20-18 ellipsoidal). The
    sign of ``lat_ts`` (GDAL WKT1 ``latitude_of_origin``) picks the
    aspect; |lat_ts| = 90 is variant A where ``k0`` is the central
    scale (UPS: k0=0.994), otherwise the scale is exact at lat_ts and
    ``k0`` stays 1. Covers EPSG 3031/3413/3976 and UPS 5041/5042."""

    lat_ts: float = 90.0
    lon0: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "polar_stereographic"

    @property
    def south(self) -> bool:
        return self.lat_ts < 0.0

    def _consts(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        if abs(self.lat_ts) >= 90.0 - 1e-12:
            # Snyder 21-33: rho = 2 a k0 t / sqrt((1+e)^(1+e)(1-e)^(1-e))
            coef = 2.0 * self.a * self.k0 / math.sqrt(
                (1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        else:
            # Snyder 21-34: rho = a m_c t / t_c (exact scale at lat_ts)
            pc = abs(math.radians(self.lat_ts))
            coef = self.a * self.k0 * float(_m(pc, e)) / float(_t(pc, e))
        return e, coef

    def forward(self, lon, lat):
        e, coef = self._consts()
        lat = np.asarray(lat, np.float64)
        lon = np.asarray(lon, np.float64)
        sgn = -1.0 if self.south else 1.0
        rho = coef * _t(np.deg2rad(sgn * lat), e)
        theta = np.deg2rad(lon - self.lon0)
        return (self.fe + rho * np.sin(theta),
                self.fn - sgn * rho * np.cos(theta))

    def inverse(self, x, y):
        e, coef = self._consts()
        sgn = -1.0 if self.south else 1.0
        dx = np.asarray(x, np.float64) - self.fe
        dy = (np.asarray(y, np.float64) - self.fn) * (-sgn)
        t = np.hypot(dx, dy) / coef
        phi = _phi_from_t(t, e)
        lam = np.arctan2(dx, dy)
        return self.lon0 + np.rad2deg(lam), sgn * np.rad2deg(phi)


@dataclass(frozen=True)
class LambertAzimuthalEqualArea:
    """Lambert Azimuthal Equal-Area (EPSG method 9820; Snyder 1987 eqs
    24-2..24-6 forward, 24-16..24-21 + 3-16 inverse, ellipsoidal oblique
    form; polar aspects per 24-23/24-25). Covers EPSG 3035 (ETRS89-LAEA
    Europe, lat0=52 lon0=10) and the equatorial/polar aspects."""

    lat0: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "laea"

    def _consts(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        qp = float(_q(np.float64(math.pi / 2.0), e))
        rq = self.a * math.sqrt(qp / 2.0)
        p0 = math.radians(self.lat0)
        q1 = float(_q(np.float64(p0), e))
        beta1 = math.asin(min(1.0, max(-1.0, q1 / qp)))
        m1 = float(_m(p0, e))
        d = (self.a * m1) / (rq * math.cos(beta1)) if abs(self.lat0) < 90.0 - 1e-12 else 1.0
        return e, qp, rq, beta1, d

    def _polar(self) -> float:
        """+1 north polar, -1 south polar, 0 oblique/equatorial."""
        if self.lat0 >= 90.0 - 1e-12:
            return 1.0
        if self.lat0 <= -90.0 + 1e-12:
            return -1.0
        return 0.0

    def forward(self, lon, lat):
        e, qp, rq, beta1, d = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        q = _q(phi, e)
        pole = self._polar()
        if pole != 0.0:
            # Snyder 24-23/25: rho = a sqrt(qp -/+ q)
            under = np.maximum(qp - pole * q, 0.0)
            rho = self.a * np.sqrt(under)
            return (self.fe + rho * np.sin(lam),
                    self.fn - pole * rho * np.cos(lam))
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        sb1, cb1 = math.sin(beta1), math.cos(beta1)
        sb, cb = np.sin(beta), np.cos(beta)
        denom = 1.0 + sb1 * sb + cb1 * cb * np.cos(lam)
        b = rq * np.sqrt(2.0 / np.maximum(denom, 1e-300))
        x = b * d * cb * np.sin(lam)
        y = (b / d) * (cb1 * sb - sb1 * cb * np.cos(lam))
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        e, qp, rq, beta1, d = self._consts()
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        pole = self._polar()
        if pole != 0.0:
            rho = np.hypot(dx, dy)
            q = pole * (qp - (rho / self.a) ** 2)
            lam = np.arctan2(dx, -pole * dy)
            phi = _phi_from_q(q, e)
            return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)
        sb1, cb1 = math.sin(beta1), math.cos(beta1)
        rho = np.hypot(dx / d, d * dy)
        with np.errstate(invalid="ignore", divide="ignore"):
            ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
            q = np.where(rho > 0.0,
                         qp * (np.cos(ce) * sb1
                               + d * dy * np.sin(ce) * cb1
                               / np.where(rho > 0.0, rho, 1.0)),
                         qp * sb1)
            lam = np.arctan2(dx * np.sin(ce),
                             d * rho * cb1 * np.cos(ce)
                             - d * d * dy * sb1 * np.sin(ce))
        lam = np.where(rho > 0.0, lam, 0.0)
        phi = _phi_from_q(q, e)
        return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)


@dataclass(frozen=True)
class Mercator:
    """Ellipsoidal Mercator (EPSG method 9804 variant A / 9805 variant
    B where ``lat_ts`` derives the scale as m(lat_ts); Snyder 1987 eqs
    7-6..7-10). EPSG 3395 World Mercator is variant A with k0=1. This
    is the true-ellipsoid Mercator — WebMercator (EPSG 3857) stays the
    separate spherical class above, as in the reference."""

    lat_ts: float = 0.0
    lon0: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "mercator"

    def _consts(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        k = self.k0
        if self.lat_ts != 0.0:
            k = self.k0 * float(_m(math.radians(abs(self.lat_ts)), e))
        return e, self.a * k

    def forward(self, lon, lat):
        e, ak = self._consts()
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        return (self.fe + ak * lam,
                self.fn - ak * np.log(_t(phi, e)))

    def inverse(self, x, y):
        e, ak = self._consts()
        t = np.exp(-(np.asarray(y, np.float64) - self.fn) / ak)
        phi = _phi_from_t(t, e)
        lon = self.lon0 + np.rad2deg((np.asarray(x, np.float64) - self.fe) / ak)
        return lon, np.rad2deg(phi)


@dataclass(frozen=True)
class Sinusoidal:
    """Sinusoidal equal-area (Snyder 1987 eqs 30-8/30-9 ellipsoidal with
    the meridian-arc series 3-21 and its rectifying inverse 3-26; exact
    on the sphere at f=0). The MODIS/VIIRS tile grid is this projection
    on the authalic-radius sphere — :data:`MODIS_SINU` below."""

    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "sinusoidal"

    def _consts(self):
        e2 = self.f * (2.0 - self.f)
        e4, e6 = e2 * e2, e2 * e2 * e2
        c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
        c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
        c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
        c6 = 35.0 * e6 / 3072.0
        sq = math.sqrt(1.0 - e2)
        e1 = (1.0 - sq) / (1.0 + sq)
        return e2, (c0, c2, c4, c6), e1

    def _merid(self, phi):
        _, (c0, c2, c4, c6), _ = self._consts()
        return self.a * (c0 * phi - c2 * np.sin(2.0 * phi)
                         + c4 * np.sin(4.0 * phi) - c6 * np.sin(6.0 * phi))

    def forward(self, lon, lat):
        e2, _, _ = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        s = np.sin(phi)
        x = self.a * lam * np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
        return self.fe + x, self.fn + self._merid(phi)

    def inverse(self, x, y):
        e2, (c0, _, _, _), e1 = self._consts()
        mu = (np.asarray(y, np.float64) - self.fn) / (self.a * c0)
        # Snyder 3-26 rectifying-latitude series
        phi = (mu
               + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
               + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu)
               + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
               + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu))
        s = np.sin(phi)
        cp = np.cos(phi)
        dx = np.asarray(x, np.float64) - self.fe
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = dx * np.sqrt(1.0 - e2 * s * s) / (self.a * cp)
        lam = np.where(np.abs(cp) < 1e-12, 0.0, lam)
        return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)


#: the MODIS/VIIRS sinusoidal grid sphere (authalic radius 6371007.181 m)
MODIS_SINU = Sinusoidal(a=6371007.181, f=0.0)


# ---------------------------------------------------------------------------
# datum transforms: geodetic <-> geocentric + 7-parameter Helmert
# (OGRCoordinateTransformation's TOWGS84 pipeline, gdal/ogr/ogrct.cpp —
# geocentric hub via EPSG methods 9602 (geographic<->geocentric) and
# 9606 (position-vector 7-param); math from EPSG Guidance Note 7-2)
# ---------------------------------------------------------------------------

def geodetic_to_geocentric(lon, lat, h=0.0, ellps=WGS84):
    """(lon°, lat°, h m) → earth-centred cartesian (X, Y, Z) m (EPSG
    9602): X=(ν+h)cosφcosλ, Y=(ν+h)cosφsinλ, Z=(ν(1−e²)+h)sinφ."""
    a, f = ellps
    e2 = f * (2.0 - f)
    lam = np.deg2rad(np.asarray(lon, np.float64))
    phi = np.deg2rad(np.asarray(lat, np.float64))
    h = np.asarray(h, np.float64)
    s, c = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(1.0 - e2 * s * s)
    return ((nu + h) * c * np.cos(lam), (nu + h) * c * np.sin(lam),
            (nu * (1.0 - e2) + h) * s)


def geocentric_to_geodetic(x, y, z, ellps=WGS84):
    """(X, Y, Z) m → (lon°, lat°, h m): Bowring 1976 first guess + 3
    Newton refinements (sub-micrometre for |h| < 10 km)."""
    a, f = ellps
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    p = np.hypot(x, y)
    theta = np.arctan2(z * a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(theta) ** 3,
                     p - e2 * a * np.cos(theta) ** 3)
    for _ in range(3):
        s = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * s * s)
        c = np.cos(phi)
        h = np.where(np.abs(c) > 1e-10, p / np.maximum(np.abs(c), 1e-300) - nu,
                     np.abs(z) / np.maximum(np.abs(s), 1e-300) - nu * (1.0 - e2))
        phi = np.arctan2(z, p * (1.0 - e2 * nu / (nu + h)))
    s, c = np.sin(phi), np.cos(phi)
    nu = a / np.sqrt(1.0 - e2 * s * s)
    h = np.where(np.abs(c) > 1e-10, p / np.maximum(np.abs(c), 1e-300) - nu,
                 np.abs(z) / np.maximum(np.abs(s), 1e-300) - nu * (1.0 - e2))
    return np.rad2deg(np.arctan2(y, x)), np.rad2deg(phi), h


def helmert(x, y, z, params, inverse: bool = False):
    """7-parameter Helmert, position-vector convention (EPSG 9606 — the
    TOWGS84 convention): params = (tx m, ty m, tz m, rx ″, ry ″, rz ″,
    ds ppm). ``inverse=True`` applies the standard EPSG reversal
    (negated-parameter/transposed small-angle form)."""
    tx, ty, tz, rxs, rys, rzs, ds = params
    k = math.pi / (180.0 * 3600.0)
    rx, ry, rz = rxs * k, rys * k, rzs * k
    s = 1.0 + ds * 1e-6
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    if not inverse:
        return (tx + s * (x - rz * y + ry * z),
                ty + s * (rz * x + y - rx * z),
                tz + s * (-ry * x + rx * y + z))
    xp, yp, zp = (x - tx) / s, (y - ty) / s, (z - tz) / s
    return (xp + rz * yp - ry * zp,
            -rz * xp + yp + rx * zp,
            ry * xp - rx * yp + zp)


#: OSGB36 → WGS84 single-solution Helmert (the published OSTN-free
#: 7-parameter approximation, ~3 m accuracy)
OSGB36_TOWGS84 = (446.448, -125.157, 542.06, 0.15, 0.247, 0.8421, -20.4894)


@dataclass(frozen=True)
class DatumShifted:
    """A projected (or geographic) CRS whose datum differs from the
    WGS84 hub. ``towgs84`` is the 7-parameter position-vector transform
    local-datum → WGS84 (the WKT1 TOWGS84 node). ``forward`` takes
    WGS84 lon/lat (the GenImgProjTransform hub coordinates) through the
    geocentric Helmert to the local datum, then projects; ``inverse``
    mirrors. h=0 on the local ellipsoid (the 2D TOWGS84 convention)."""

    crs: object
    towgs84: tuple

    @property
    def name(self) -> str:
        return f"{self.crs.name}+towgs84"

    def _ellps(self):
        return (getattr(self.crs, "a", WGS84[0]),
                getattr(self.crs, "f", WGS84[1]))

    def forward(self, lon, lat):
        gx, gy, gz = geodetic_to_geocentric(lon, lat, 0.0, WGS84)
        gx, gy, gz = helmert(gx, gy, gz, self.towgs84, inverse=True)
        lon2, lat2, _ = geocentric_to_geodetic(gx, gy, gz, self._ellps())
        return self.crs.forward(lon2, lat2)

    def inverse(self, x, y):
        lon, lat = self.crs.inverse(x, y)
        gx, gy, gz = geodetic_to_geocentric(lon, lat, 0.0, self._ellps())
        gx, gy, gz = helmert(gx, gy, gz, self.towgs84)
        lon2, lat2, _ = geocentric_to_geodetic(gx, gy, gz, WGS84)
        return lon2, lat2


# ---------------------------------------------------------------------------
# WKT1 CRS codec (OGRSpatialReference exportToWkt/importFromWkt analog,
# gdal/ogr/ogrspatialreference.cpp:658 — PROJCS/GEOGCS node trees)
# ---------------------------------------------------------------------------

_PROJ_WKT_NAMES = {
    "lcc": "Lambert_Conformal_Conic_2SP",
    "albers": "Albers_Conic_Equal_Area",
    "tmerc": "Transverse_Mercator",
    "polar_stereographic": "Polar_Stereographic",
    "laea": "Lambert_Azimuthal_Equal_Area",
    "mercator": "Mercator_1SP",
    "sinusoidal": "Sinusoidal",
    "lcc1sp": "Lambert_Conformal_Conic_1SP",
    "lcc2sp_belgium": "Lambert_Conformal_Conic_2SP_Belgium",
    "lcc_west": "Lambert_Conformal_Conic_1SP",  # + axis flip, no WKT1 name
    "cassini": "Cassini_Soldner",
    "tmerc_south": "Transverse_Mercator_South_Orientated",
    "sterea": "Oblique_Stereographic",
    "omerc": "Hotine_Oblique_Mercator",
    "somerc": "Swiss_Oblique_Cylindrical",
    "poly": "Polyconic",
    "krovak": "Krovak",
    "eqc": "Equirectangular",
    "eqdc": "Equidistant_Conic",
}


def crs_to_wkt(crs) -> str:
    """Serialize a projected CRS to WKT1 (geographic → GEOGCS only);
    a :class:`DatumShifted` wrapper emits its TOWGS84 node."""
    towtxt = ""
    if isinstance(crs, DatumShifted):
        towtxt = ",TOWGS84[" + ",".join(repr(float(v))
                                        for v in crs.towgs84) + "]"
        crs = crs.crs
    unit_m = 1.0
    if isinstance(crs, PX.UnitScaled):
        unit_m = crs.metres_per_unit
        crs = crs.crs
    a = getattr(crs, "a", WGS84[0])
    f = getattr(crs, "f", WGS84[1])
    rf = 0.0 if f == 0.0 else 1.0 / f  # WKT: inverse flattening 0 = sphere
    geogcs = (f'GEOGCS["GCS_WGS_1984",DATUM["WGS_1984",'
              f'SPHEROID["WGS84",{a!r},{rf!r}]{towtxt}],'
              f'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')
    if isinstance(crs, Geographic):
        return geogcs
    params: list[tuple[str, float]] = []
    if isinstance(crs, (LambertConformalConic, AlbersEqualArea)):
        params = [("standard_parallel_1", crs.lat1),
                  ("standard_parallel_2", crs.lat2),
                  ("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, TransverseMercator):
        params = [("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PolarStereographic):
        params = [("latitude_of_origin", crs.lat_ts),
                  ("central_meridian", crs.lon0),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, LambertAzimuthalEqualArea):
        params = [("latitude_of_center", crs.lat0),
                  ("longitude_of_center", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, Mercator):
        if crs.lat_ts != 0.0:
            params = [("standard_parallel_1", crs.lat_ts),
                      ("central_meridian", crs.lon0),
                      ("false_easting", crs.fe), ("false_northing", crs.fn)]
        else:
            params = [("central_meridian", crs.lon0),
                      ("scale_factor", crs.k0),
                      ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, Sinusoidal):
        params = [("longitude_of_center", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.LambertConformalConic1SP):
        params = [("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.LambertConformalConic2SPBelgium):
        params = [("standard_parallel_1", crs.lat1),
                  ("standard_parallel_2", crs.lat2),
                  ("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, (PX.CassiniSoldner, PX.Polyconic)):
        params = [("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.TransverseMercatorSouth):
        params = [("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.ObliqueStereographic):
        params = [("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.HotineObliqueMercator):
        params = [("latitude_of_center", crs.latc),
                  ("longitude_of_center", crs.lonc),
                  ("azimuth", crs.alphac),
                  ("rectified_grid_angle", crs.gammac),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.SwissObliqueMercator):
        params = [("latitude_of_center", crs.lat0),
                  ("longitude_of_center", crs.lon0),
                  ("scale_factor", crs.k0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.Krovak):
        params = [("latitude_of_center", crs.latc),
                  ("longitude_of_center", crs.lon0),
                  ("azimuth", crs.alphac),
                  ("pseudo_standard_parallel_1", crs.latp),
                  ("scale_factor", crs.kp),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.EquidistantCylindrical):
        params = [("standard_parallel_1", crs.lat1),
                  ("central_meridian", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    elif isinstance(crs, PX.EquidistantConic):
        params = [("standard_parallel_1", crs.lat1),
                  ("standard_parallel_2", crs.lat2),
                  ("latitude_of_origin", crs.lat0),
                  ("central_meridian", crs.lon0),
                  ("false_easting", crs.fe), ("false_northing", crs.fn)]
    else:
        raise ValueError(f"cannot serialize {crs!r}")
    proj_name = _PROJ_WKT_NAMES[crs.name]
    if isinstance(crs, Mercator) and crs.lat_ts != 0.0:
        proj_name = "Mercator_2SP"
    if isinstance(crs, PX.HotineObliqueMercator) and crs.variant_b:
        proj_name = "Hotine_Oblique_Mercator_Azimuth_Center"
    body = ",".join(f'PARAMETER["{k}",{v!r}]' for k, v in params)
    unit = ('UNIT["metre",1]' if unit_m == 1.0
            else f'UNIT["unit",{unit_m!r}]')
    return (f'PROJCS["{crs.name}",{geogcs},'
            f'PROJECTION["{proj_name}"],{body},'
            f'{unit}]')


def _wkt_nodes(wkt: str, kind: str) -> list[list[str]]:
    """All ``kind[...]`` nodes' comma-split (depth-0) argument lists."""
    out = []
    for m in re.finditer(kind + r"\[", wkt):
        depth, start = 1, m.end()
        for i in range(start, len(wkt)):
            if wkt[i] == "[":
                depth += 1
            elif wkt[i] == "]":
                depth -= 1
                if depth == 0:
                    body = wkt[start:i]
                    args, d, cur = [], 0, []
                    for ch in body:
                        if ch == "[":
                            d += 1
                        elif ch == "]":
                            d -= 1
                        if ch == "," and d == 0:
                            args.append("".join(cur)); cur = []
                        else:
                            cur.append(ch)
                    args.append("".join(cur))
                    out.append([a.strip() for a in args])
                    break
    return out


def crs_from_wkt(wkt: str):
    """Parse a WKT1 PROJCS/GEOGCS into a projection object. A TOWGS84
    node with any non-zero parameter wraps the result in
    :class:`DatumShifted` (the datum-aware transform path)."""
    wkt = wkt.strip()
    tows = _wkt_nodes(wkt, "TOWGS84")
    tow = None
    if tows:
        vals = tuple(float(v) for v in tows[0][:7])
        vals = vals + (0.0,) * (7 - len(vals))
        if any(v != 0.0 for v in vals):
            tow = vals
    if wkt.upper().startswith("GEOGCS"):
        sph0 = _wkt_nodes(wkt, "SPHEROID")
        ga, gf = WGS84
        if sph0:
            ga = float(sph0[0][1])
            grf = float(sph0[0][2])
            gf = 0.0 if grf == 0 else 1.0 / grf
        geo = Geographic(a=ga, f=gf)
        return DatumShifted(geo, tow) if tow else geo
    projs = _wkt_nodes(wkt, "PROJECTION")
    if not projs:
        raise ValueError("no PROJECTION node")
    method = projs[0][0].strip('"')
    params = {p[0].strip('"').lower(): float(p[1])
              for p in _wkt_nodes(wkt, "PARAMETER")}
    sph = _wkt_nodes(wkt, "SPHEROID")
    a, f = WGS84
    if sph:
        a = float(sph[0][1])
        rf = float(sph[0][2])
        f = 0.0 if rf == 0 else 1.0 / rf
    g = params.get
    out = _crs_from_method(method, g, a, f, wkt)
    units = _wkt_nodes(wkt, "UNIT")
    if units:  # last UNIT node = the PROJCS linear unit
        try:
            unit_m = float(units[-1][1])
        except (ValueError, IndexError):
            unit_m = 1.0
        if unit_m != 1.0 and not isinstance(out, Geographic):
            out = PX.UnitScaled(out, unit_m)
    return DatumShifted(out, tow) if tow else out


def _crs_from_method(method, g, a, f, wkt):
    if method == "Lambert_Conformal_Conic_2SP":
        return LambertConformalConic(
            lat1=g("standard_parallel_1", 0.0), lat2=g("standard_parallel_2", 0.0),
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Albers_Conic_Equal_Area":
        return AlbersEqualArea(
            lat1=g("standard_parallel_1", 0.0), lat2=g("standard_parallel_2", 0.0),
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Transverse_Mercator":
        return TransverseMercator(
            lon0=g("central_meridian", 0.0), k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0),
            lat0=g("latitude_of_origin", 0.0), a=a, f=f)
    if method == "Polar_Stereographic":
        return PolarStereographic(
            lat_ts=g("latitude_of_origin", 90.0), lon0=g("central_meridian", 0.0),
            k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Lambert_Azimuthal_Equal_Area":
        return LambertAzimuthalEqualArea(
            lat0=g("latitude_of_center", g("latitude_of_origin", 0.0)),
            lon0=g("longitude_of_center", g("central_meridian", 0.0)),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Mercator_2SP":
        return Mercator(
            lat_ts=g("standard_parallel_1", 0.0),
            lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Sinusoidal":
        return Sinusoidal(
            lon0=g("longitude_of_center", g("central_meridian", 0.0)),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Popular_Visualisation_Pseudo_Mercator":
        return WebMercator()
    if method == "Lambert_Conformal_Conic_1SP":
        return PX.LambertConformalConic1SP(
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Lambert_Conformal_Conic_2SP_Belgium":
        return PX.LambertConformalConic2SPBelgium(
            lat1=g("standard_parallel_1", 0.0),
            lat2=g("standard_parallel_2", 0.0),
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Cassini_Soldner":
        return PX.CassiniSoldner(
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Transverse_Mercator_South_Orientated":
        return PX.TransverseMercatorSouth(
            lon0=g("central_meridian", 0.0), k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0),
            lat0=g("latitude_of_origin", 0.0), a=a, f=f)
    if method in ("Oblique_Stereographic", "Double_Stereographic"):
        return PX.ObliqueStereographic(
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method in ("Hotine_Oblique_Mercator",
                  "Hotine_Oblique_Mercator_Azimuth_Center"):
        az = g("azimuth", 0.0)
        return PX.HotineObliqueMercator(
            latc=g("latitude_of_center", 0.0),
            lonc=g("longitude_of_center", 0.0),
            alphac=az, gammac=g("rectified_grid_angle", az),
            k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f,
            variant_b=(method == "Hotine_Oblique_Mercator_Azimuth_Center"))
    if method == "Swiss_Oblique_Cylindrical":
        return PX.SwissObliqueMercator(
            lat0=g("latitude_of_center", g("latitude_of_origin", 0.0)),
            lon0=g("longitude_of_center", g("central_meridian", 0.0)),
            k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Polyconic":
        return PX.Polyconic(
            lat0=g("latitude_of_origin", 0.0), lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Krovak":
        return PX.Krovak(
            latc=g("latitude_of_center", 49.5),
            lon0=g("longitude_of_center", 24.0 + 50.0 / 60.0),
            alphac=g("azimuth", 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0),
            latp=g("pseudo_standard_parallel_1", 78.5),
            kp=g("scale_factor", 0.9999),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method in ("Equirectangular", "Equidistant_Cylindrical"):
        return PX.EquidistantCylindrical(
            lat1=g("standard_parallel_1", g("latitude_of_origin", 0.0)),
            lon0=g("central_meridian", 0.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Equidistant_Conic":
        return PX.EquidistantConic(
            lat1=g("standard_parallel_1", 0.0),
            lat2=g("standard_parallel_2", 0.0),
            lat0=g("latitude_of_origin", g("latitude_of_center", 0.0)),
            lon0=g("central_meridian", g("longitude_of_center", 0.0)),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    if method == "Mercator_1SP":
        # the spherical pseudo-Mercator WKT GDAL writes for EPSG 3857
        # also spells Mercator_1SP — disambiguate on the spheroid /
        # the Pseudo-Mercator PROJCS name
        if f == 0.0 or "Pseudo-Mercator" in wkt:
            return WebMercator()
        return Mercator(
            lon0=g("central_meridian", 0.0), k0=g("scale_factor", 1.0),
            fe=g("false_easting", 0.0), fn=g("false_northing", 0.0), a=a, f=f)
    raise ValueError(f"unsupported projection method {method!r}")


# ---------------------------------------------------------------------------
# composed image transformer (GenImgProjTransformer analog)
# ---------------------------------------------------------------------------

class GenImgProjTransform:
    """Picklable ``src_from_dst`` composing dst pixel → dst geo →
    dst CRS⁻¹ → lon/lat → src CRS → src geo → src pixel
    (gdal/alg/gdaltransformer.cpp:974). Either side may instead be a
    fitted GCP/TPS transform (pixel ↔ geo directly), mirroring
    GDALCreateGenImgProjTransformer's bGCPUseOK path."""

    def __init__(self, src_gt, dst_gt, src_crs=None, dst_crs=None,
                 src_gcp=None, dst_gcp=None):
        self.src_gt = tuple(src_gt) if src_gt is not None else None
        self.dst_gt = tuple(dst_gt) if dst_gt is not None else None
        self.src_crs = src_crs or Geographic()
        self.dst_crs = dst_crs or Geographic()
        self.src_gcp = src_gcp  # pixel<->geo transform overriding src_gt
        self.dst_gcp = dst_gcp  # pixel<->geo transform overriding dst_gt

    @staticmethod
    def _px_to_geo(gt, px, py):
        return (gt[0] + px * gt[1] + py * gt[2],
                gt[3] + px * gt[4] + py * gt[5])

    @staticmethod
    def _geo_to_px(gt, x, y):
        det = gt[1] * gt[5] - gt[2] * gt[4]
        dx, dy = x - gt[0], y - gt[3]
        return (dx * gt[5] - dy * gt[2]) / det, (dy * gt[1] - dx * gt[4]) / det

    def __call__(self, px, py):
        px = np.asarray(px, np.float64) + 0.0
        py = np.asarray(py, np.float64) + 0.0
        if self.dst_gcp is not None:
            x, y = self.dst_gcp.forward(px, py)
        else:
            x, y = self._px_to_geo(self.dst_gt, px, py)
        if not isinstance(self.dst_crs, Geographic) \
                or not isinstance(self.src_crs, Geographic) \
                or self.src_gcp is not None:
            lon, lat = self.dst_crs.inverse(x, y)
            x, y = self.src_crs.forward(lon, lat)
        if self.src_gcp is not None:
            return self.src_gcp.inverse(x, y)
        return self._geo_to_px(self.src_gt, x, y)


# ---------------------------------------------------------------------------
# GCP polynomial transform (gdal/alg/gdal_crs.c analog, orders 1-3)
# ---------------------------------------------------------------------------

def _poly_terms(x, y, order: int) -> np.ndarray:
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x ** 3, y ** 3]
    return np.stack(cols, axis=-1)


class GCPTransform:
    """Least-squares bivariate polynomial (order 1-3) fitted to ground
    control points, both directions — the gdal_crs.c transform. ``gcps``
    is a sequence of (pixel, line, geo_x, geo_y)."""

    def __init__(self, gcps, order: int = 1):
        g = np.asarray(gcps, np.float64)
        need = {1: 3, 2: 6, 3: 10}[order]
        if len(g) < need:
            raise ValueError(f"order {order} needs >= {need} GCPs, got {len(g)}")
        self.order = order
        af = _poly_terms(g[:, 0], g[:, 1], order)
        ai = _poly_terms(g[:, 2], g[:, 3], order)
        self.cx, *_ = np.linalg.lstsq(af, g[:, 2], rcond=None)
        self.cy, *_ = np.linalg.lstsq(af, g[:, 3], rcond=None)
        self.ipx, *_ = np.linalg.lstsq(ai, g[:, 0], rcond=None)
        self.ipy, *_ = np.linalg.lstsq(ai, g[:, 1], rcond=None)
        tf = af @ np.stack([self.cx, self.cy], axis=-1)
        self.max_fit_error = float(np.hypot(tf[:, 0] - g[:, 2],
                                            tf[:, 1] - g[:, 3]).max())

    def forward(self, px, py):
        t = _poly_terms(np.asarray(px, np.float64),
                        np.asarray(py, np.float64), self.order)
        return t @ self.cx, t @ self.cy

    def inverse(self, x, y):
        t = _poly_terms(np.asarray(x, np.float64),
                        np.asarray(y, np.float64), self.order)
        return t @ self.ipx, t @ self.ipy


class TPSTransform:
    """Thin-plate-spline transform through all GCPs exactly
    (gdal/alg/gdal_tps.cpp analog; radial basis U(r) = r^2 log r^2 plus
    an affine part, one dense solve per direction at fit time)."""

    def __init__(self, gcps):
        g = np.asarray(gcps, np.float64)
        if len(g) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self.src = g[:, 0:2].copy()
        self.dst = g[:, 2:4].copy()
        self.wf = self._solve(self.src, self.dst)
        self.wi = self._solve(self.dst, self.src)

    @staticmethod
    def _u(r2):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(r2 > 0.0, r2 * np.log(r2), 0.0)

    @classmethod
    def _solve(cls, src, dst):
        n = len(src)
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
        big = np.zeros((n + 3, n + 3))
        big[:n, :n] = cls._u(d2)
        big[:n, n] = 1.0
        big[:n, n + 1:] = src
        big[n, :n] = 1.0
        big[n + 1:, :n] = src.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        return np.linalg.solve(big, rhs)

    def _apply(self, w, ctrl, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        shape = x.shape
        p = np.stack([x.ravel(), y.ravel()], axis=-1)
        d2 = ((p[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
        n = len(ctrl)
        out = (self._u(d2) @ w[:n] + w[n]
               + p @ w[n + 1:])
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)

    def forward(self, px, py):
        return self._apply(self.wf, self.src, px, py)

    def inverse(self, x, y):
        return self._apply(self.wi, self.dst, x, y)


# ---------------------------------------------------------------------------
# RPC transform (gdal/alg/gdal_rpc.cpp analog)
# ---------------------------------------------------------------------------

def _rpc_terms(L, P, H):
    """The 20 RPC00B cubic terms in coefficient order (the standard
    NITF/GDAL ordering evaluated by RPCEvaluate in gdal/alg/gdal_rpc.cpp):
    1, L, P, H, LP, LH, PH, L2, P2, H2, PLH, L3, LP2, LH2, L2P, P3, PH2,
    L2H, P2H, H3."""
    one = np.ones_like(L)
    return np.stack([
        one, L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
        P * L * H, L ** 3, L * P * P, L * H * H, L * L * P, P ** 3,
        P * H * H, L * L * H, P * P * H, H ** 3], axis=-1)


@dataclass
class RPCModel:
    """RPC00B metadata block (the RPC domain of gdal/alg/gdal_rpc.cpp and
    gdal/gcore's RPC metadata): offsets/scales plus 4x20 coefficients."""
    line_off: float
    samp_off: float
    lat_off: float
    long_off: float
    height_off: float
    line_scale: float
    samp_scale: float
    lat_scale: float
    long_scale: float
    height_scale: float
    line_num: tuple
    line_den: tuple
    samp_num: tuple
    samp_den: tuple


class RPCTransform:
    """Rational-polynomial-coefficient pixel↔geo transform
    (gdal/alg/gdal_rpc.cpp): geo→pixel is the direct 3rd-degree rational
    evaluation; pixel→geo is the iterative inverse (vectorized 2x2 Newton
    with central-difference Jacobian, matching the reference's iterative
    RPCInverseTransformPoint shape). ``height`` is the fixed terrain
    height (gdalwarp -to RPC_HEIGHT, default 0).

    Convention matches :class:`GCPTransform`: ``forward(px, py)`` →
    (lon, lat) and ``inverse(lon, lat)`` → (px, py), so an instance drops
    into :class:`GenImgProjTransform` as ``src_gcp``/``dst_gcp``."""

    def __init__(self, model: RPCModel, height: float = 0.0,
                 max_iter: int = 20, tol: float = 1e-10):
        self.m = model
        self.height = float(height)
        self.max_iter = max_iter
        self.tol = tol

    def inverse(self, lon, lat):
        """geo → pixel: direct RPC evaluation."""
        m = self.m
        L = (np.asarray(lon, np.float64) - m.long_off) / m.long_scale
        P = (np.asarray(lat, np.float64) - m.lat_off) / m.lat_scale
        H = np.full_like(L, (self.height - m.height_off) / m.height_scale)
        t = _rpc_terms(L, P, H)
        line = (t @ np.asarray(m.line_num)) / (t @ np.asarray(m.line_den))
        samp = (t @ np.asarray(m.samp_num)) / (t @ np.asarray(m.samp_den))
        return (samp * m.samp_scale + m.samp_off,
                line * m.line_scale + m.line_off)

    def forward(self, px, py):
        """pixel → geo: vectorized Newton on the direct evaluation,
        seeded at the RPC center (long_off, lat_off)."""
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        m = self.m
        lon = np.full(px.shape, m.long_off, np.float64)
        lat = np.full(px.shape, m.lat_off, np.float64)
        dl = 1e-7 * m.long_scale
        dp = 1e-7 * m.lat_scale
        for _ in range(self.max_iter):
            sx, sy = self.inverse(lon, lat)
            fx, fy = sx - px, sy - py
            sxl, syl = self.inverse(lon + dl, lat)
            sxp, syp = self.inverse(lon, lat + dp)
            j11 = (sxl - sx) / dl   # d samp / d lon
            j21 = (syl - sy) / dl
            j12 = (sxp - sx) / dp   # d samp / d lat
            j22 = (syp - sy) / dp
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            dlon = (fx * j22 - fy * j12) / det
            dlat = (fy * j11 - fx * j21) / det
            lon -= dlon
            lat -= dlat
            if float(np.max(np.abs(dlon), initial=0.0)) < self.tol \
                    and float(np.max(np.abs(dlat), initial=0.0)) < self.tol:
                break
        return lon, lat


# ---------------------------------------------------------------------------
# geolocation-array transform (gdal/alg/gdalgeoloc.cpp analog)
# ---------------------------------------------------------------------------

class GeolocTransform:
    """Geolocation-array pixel↔geo transform (gdal/alg/gdalgeoloc.cpp):
    per-pixel lon/lat arrays, possibly subsampled (PIXEL_STEP/LINE_STEP
    with PIXEL_OFFSET/LINE_OFFSET). ``forward`` bilinearly interpolates
    the arrays at (px, py); ``inverse`` seeds from the nearest geoloc
    node (the reference's backmap, gdalgeoloc.cpp GDALGeoLoc*Backmap)
    and refines with Newton on the bilinear surface.

    Same forward/inverse convention as :class:`GCPTransform`."""

    def __init__(self, lon_arr, lat_arr, pixel_offset: float = 0.0,
                 line_offset: float = 0.0, pixel_step: float = 1.0,
                 line_step: float = 1.0, max_iter: int = 20,
                 tol: float = 1e-10):
        self.lon = np.asarray(lon_arr, np.float64)
        self.lat = np.asarray(lat_arr, np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2 \
                or min(self.lon.shape) < 2:
            raise ValueError("lon/lat arrays must be equal-shape 2-D, >= 2x2")
        self.px_off = float(pixel_offset)
        self.ln_off = float(line_offset)
        self.px_step = float(pixel_step)
        self.ln_step = float(line_step)
        self.max_iter = max_iter
        self.tol = tol

    def _grid_coords(self, px, py):
        """Raster pixel coords → fractional geoloc-array indices
        (gx, gy), clamped to the interpolable interior."""
        gx = (np.asarray(px, np.float64) - self.px_off) / self.px_step
        gy = (np.asarray(py, np.float64) - self.ln_off) / self.ln_step
        h, w = self.lon.shape
        return (np.clip(gx, 0.0, w - 1 - 1e-9),
                np.clip(gy, 0.0, h - 1 - 1e-9))

    def _bilinear(self, gx, gy):
        h, w = self.lon.shape
        ix = np.minimum(gx.astype(np.int64), w - 2)
        iy = np.minimum(gy.astype(np.int64), h - 2)
        tx = gx - ix
        ty = gy - iy

        def bil(a):
            return ((1 - tx) * (1 - ty) * a[iy, ix]
                    + tx * (1 - ty) * a[iy, ix + 1]
                    + (1 - tx) * ty * a[iy + 1, ix]
                    + tx * ty * a[iy + 1, ix + 1])

        return bil(self.lon), bil(self.lat)

    def forward(self, px, py):
        gx, gy = self._grid_coords(px, py)
        return self._bilinear(gx, gy)

    def inverse(self, x, y):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        shape = x.shape
        xf, yf = x.ravel(), y.ravel()
        h, w = self.lon.shape
        # backmap seed: nearest geoloc node per query (chunked argmin)
        flat_lon, flat_lat = self.lon.ravel(), self.lat.ravel()
        seeds = np.empty(xf.size, np.int64)
        chunk = max(1, int(4e6 // max(flat_lon.size, 1)))
        for i in range(0, xf.size, chunk):
            j = min(i + chunk, xf.size)
            d2 = ((xf[i:j, None] - flat_lon[None, :]) ** 2
                  + (yf[i:j, None] - flat_lat[None, :]) ** 2)
            seeds[i:j] = d2.argmin(axis=1)
        gx = (seeds % w).astype(np.float64)
        gy = (seeds // w).astype(np.float64)
        eps = 1e-4
        for _ in range(self.max_iter):
            lx, ly = self._bilinear(np.clip(gx, 0, w - 1 - 1e-9),
                                    np.clip(gy, 0, h - 1 - 1e-9))
            fx, fy = lx - xf, ly - yf
            lxx, lyx = self._bilinear(np.clip(gx + eps, 0, w - 1 - 1e-9),
                                      np.clip(gy, 0, h - 1 - 1e-9))
            lxy, lyy = self._bilinear(np.clip(gx, 0, w - 1 - 1e-9),
                                      np.clip(gy + eps, 0, h - 1 - 1e-9))
            j11 = (lxx - lx) / eps
            j21 = (lyx - ly) / eps
            j12 = (lxy - lx) / eps
            j22 = (lyy - ly) / eps
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            dgx = (fx * j22 - fy * j12) / det
            dgy = (fy * j11 - fx * j21) / det
            gx -= dgx
            gy -= dgy
            if float(np.max(np.abs(dgx), initial=0.0)) < self.tol \
                    and float(np.max(np.abs(dgy), initial=0.0)) < self.tol:
                break
        px = gx * self.px_step + self.px_off
        py = gy * self.ln_step + self.ln_off
        return px.reshape(shape), py.reshape(shape)


# ---------------------------------------------------------------------------
# approximate transformer (gdaltransformer.cpp:2625-3010 analog)
# ---------------------------------------------------------------------------

class ApproxTransform:
    """Wrap an exact ``src_from_dst`` with coarse-lattice bilinear
    interpolation. The exact transform is evaluated on a ``step``-spaced
    lattice over the input bbox plus a strided sample of the actual
    inputs for error control; if the sampled error exceeds ``max_err``
    (GDAL -et, default 0.25 px) the lattice is refined, falling back to
    the exact transform below step 4. Cuts per-block transform cost
    ~step² for expensive chains (Krüger/LCC/TPS)."""

    def __init__(self, exact, max_err: float = 0.25, step: int = 16,
                 min_points: int = 512):
        self.exact = exact
        self.max_err = float(max_err)
        self.step = int(step)
        self.min_points = int(min_points)

    def __call__(self, px, py):
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        if px.size < self.min_points:
            return self.exact(px, py)
        x0 = math.floor(float(px.min())); x1 = math.ceil(float(px.max()))
        y0 = math.floor(float(py.min())); y1 = math.ceil(float(py.max()))
        # strided sample of actual inputs for the error check
        flat_x = px.ravel(); flat_y = py.ravel()
        stride = max(1, flat_x.size // 64)
        sx_chk = flat_x[::stride]; sy_chk = flat_y[::stride]
        ex_chk = None
        step = self.step
        while step >= 4:
            gx = np.arange(x0, x1 + step + 1, step, dtype=np.float64)
            gy = np.arange(y0, y1 + step + 1, step, dtype=np.float64)
            gx2, gy2 = np.meshgrid(gx, gy)
            lx, ly = self.exact(gx2, gy2)
            if not (np.isfinite(lx).all() and np.isfinite(ly).all()):
                return self.exact(px, py)  # outside the smooth domain

            def interp(qx, qy):
                fx = np.clip((qx - x0) / step, 0, len(gx) - 1 - 1e-9)
                fy = np.clip((qy - y0) / step, 0, len(gy) - 1 - 1e-9)
                ix = fx.astype(np.int64); iy = fy.astype(np.int64)
                tx = fx - ix; ty = fy - iy
                def bil(grid):
                    return ((1 - tx) * (1 - ty) * grid[iy, ix]
                            + tx * (1 - ty) * grid[iy, ix + 1]
                            + (1 - tx) * ty * grid[iy + 1, ix]
                            + tx * ty * grid[iy + 1, ix + 1])
                return bil(lx), bil(ly)

            ax_chk, ay_chk = interp(sx_chk, sy_chk)
            if ex_chk is None:
                ex_chk = self.exact(sx_chk, sy_chk)
            err = np.hypot(ax_chk - ex_chk[0], ay_chk - ex_chk[1])
            if float(err.max(initial=0.0)) <= self.max_err:
                ox, oy = interp(flat_x, flat_y)
                return ox.reshape(px.shape), oy.reshape(px.shape)
            step //= 2
        return self.exact(px, py)


# ---------------------------------------------------------------------------
# SQL expression generators (oracle twins; constants embedded as exact
# Python double reprs so both engines evaluate the same formula text)
# ---------------------------------------------------------------------------

def _d(v: float) -> str:
    """Embed a Python double as an explicitly-DOUBLE SQL literal (bare
    decimal literals are DECIMAL in DuckDB and overflow on chained
    multiplication)."""
    return f"({v!r}::DOUBLE)"


def sql_lcc_forward(crs: LambertConformalConic, lon: str, lat: str) -> tuple[str, str]:
    """DuckDB SQL text computing the LCC forward (x, y) of (lon, lat)."""
    e, n, big_f, rho0 = crs._consts()
    af = _d(crs.a * big_f)
    he = _d(e / 2.0)
    er = _d(e)
    d2r = _d(math.pi / 180.0)
    t = (f"(tan({_d(math.pi / 4.0)} - ({lat}) * {_d(math.pi / 360.0)}) / "
         f"pow((1.0 - {er} * sin(({lat}) * {d2r})) / "
         f"(1.0 + {er} * sin(({lat}) * {d2r})), {he}))")
    rho = f"({af} * pow({t}, {_d(n)}))"
    theta = f"({_d(n)} * (({lon}) - {_d(crs.lon0)}) * {d2r})"
    x = f"({_d(crs.fe)} + {rho} * sin({theta}))"
    y = f"({_d(crs.fn)} + {_d(rho0)} - {rho} * cos({theta}))"
    return x, y


def sql_albers_forward(crs: AlbersEqualArea, lon: str, lat: str) -> tuple[str, str]:
    """DuckDB SQL text computing the Albers forward (x, y) of (lon, lat)."""
    e, n, big_c, rho0 = crs._consts()
    er = _d(e)
    d2r = _d(math.pi / 180.0)
    s = f"sin(({lat}) * {d2r})"
    q = (f"({_d(1.0 - e * e)} * ({s} / (1.0 - {_d(e * e)} * {s} * {s}) - "
         f"ln((1.0 - {er} * {s}) / (1.0 + {er} * {s})) / {_d(2.0 * e)}))")
    rho = f"({_d(crs.a)} * sqrt({_d(big_c)} - {_d(n)} * {q}) / {_d(n)})"
    theta = f"({_d(n)} * (({lon}) - {_d(crs.lon0)}) * {d2r})"
    x = f"({_d(crs.fe)} + {rho} * sin({theta}))"
    y = f"({_d(crs.fn)} + {_d(rho0)} - {rho} * cos({theta}))"
    return x, y


def sql_ps_forward(crs: PolarStereographic, lon: str, lat: str) -> tuple[str, str]:
    """DuckDB SQL text computing the Polar Stereographic forward (x, y)
    of (lon, lat) — same constants doubles as :meth:`forward`."""
    e, coef = crs._consts()
    sgn = -1.0 if crs.south else 1.0
    er = _d(e)
    d2r = _d(math.pi / 180.0)
    slat = f"(({lat}) * {_d(sgn)})"
    s = f"sin({slat} * {d2r})"
    t = (f"(tan({_d(math.pi / 4.0)} - {slat} * {_d(math.pi / 360.0)}) / "
         f"pow((1.0 - {er} * {s}) / (1.0 + {er} * {s}), {_d(e / 2.0)}))")
    rho = f"({_d(coef)} * {t})"
    theta = f"((({lon}) - {_d(crs.lon0)}) * {d2r})"
    x = f"({_d(crs.fe)} + {rho} * sin({theta}))"
    y = f"({_d(crs.fn)} - {_d(sgn)} * {rho} * cos({theta}))"
    return x, y


def sql_laea_forward(crs: LambertAzimuthalEqualArea, lon: str, lat: str
                     ) -> tuple[str, str]:
    """DuckDB SQL text for the oblique LAEA forward (Snyder 24-2..24-6)."""
    e, qp, rq, beta1, d = crs._consts()
    if crs._polar() != 0.0:
        raise ValueError("sql_laea_forward: oblique/equatorial aspects only")
    er = _d(e)
    d2r = _d(math.pi / 180.0)
    s = f"sin(({lat}) * {d2r})"
    q = (f"({_d(1.0 - e * e)} * ({s} / (1.0 - {_d(e * e)} * {s} * {s}) - "
         f"ln((1.0 - {er} * {s}) / (1.0 + {er} * {s})) / {_d(2.0 * e)}))")
    beta = f"(asin({q} / {_d(qp)}))"
    lam = f"((({lon}) - {_d(crs.lon0)}) * {d2r})"
    sb1, cb1 = _d(math.sin(beta1)), _d(math.cos(beta1))
    denom = f"(1.0 + {sb1} * sin({beta}) + {cb1} * cos({beta}) * cos({lam}))"
    b = f"({_d(rq)} * sqrt(2.0 / {denom}))"
    x = f"({_d(crs.fe)} + {b} * {_d(d)} * cos({beta}) * sin({lam}))"
    y = (f"({_d(crs.fn)} + ({b} / {_d(d)}) * ({cb1} * sin({beta}) - "
         f"{sb1} * cos({beta}) * cos({lam})))")
    return x, y


def sql_sinu_forward(crs: Sinusoidal, lon: str, lat: str) -> tuple[str, str]:
    """DuckDB SQL text for the sinusoidal forward (Snyder 30-8/3-21)."""
    e2, (c0, c2, c4, c6), _ = crs._consts()
    d2r = _d(math.pi / 180.0)
    phi = f"(({lat}) * {d2r})"
    lam = f"((({lon}) - {_d(crs.lon0)}) * {d2r})"
    s = f"sin({phi})"
    if e2 == 0.0:
        x = f"({_d(crs.fe)} + {_d(crs.a)} * {lam} * cos({phi}))"
        y = f"({_d(crs.fn)} + {_d(crs.a)} * {phi})"
        return x, y
    x = (f"({_d(crs.fe)} + {_d(crs.a)} * {lam} * cos({phi}) / "
         f"sqrt(1.0 - {_d(e2)} * {s} * {s}))")
    y = (f"({_d(crs.fn)} + {_d(crs.a)} * ({_d(c0)} * {phi} "
         f"- {_d(c2)} * sin(2.0 * {phi}) + {_d(c4)} * sin(4.0 * {phi}) "
         f"- {_d(c6)} * sin(6.0 * {phi})))")
    return x, y


def sql_tm_inverse(e_expr: str, n_expr: str, lon0: float,
                   k0: float = PJ.UTM_K0, fe: float = PJ.UTM_FE,
                   fn: float = 0.0) -> tuple[str, str]:
    """DuckDB SQL text for the Krüger-series inverse transverse Mercator:
    (easting, northing) expressions → (lon, lat) expressions. sinh/cosh
    are spelled with exp() (DuckDB has no hyperbolics). Mirrors
    functions/proj.py tm_inverse term by term with the same coefficient
    doubles."""
    ka = _d(k0 * PJ.A_BAR)
    xi = f"((({n_expr}) - {_d(fn)}) / {ka})"
    eta = f"((({e_expr}) - {_d(fe)}) / {ka})"

    def sinh(u):
        return f"((exp({u}) - exp(-({u}))) * 0.5)"

    def cosh(u):
        return f"((exp({u}) + exp(-({u}))) * 0.5)"

    xi_terms = " + ".join(
        f"{_d(float(PJ.BETA[j - 1]))} * sin({2 * j} * {xi}) * "
        f"{cosh(f'{2 * j} * {eta}')}" for j in range(1, 7))
    eta_terms = " + ".join(
        f"{_d(float(PJ.BETA[j - 1]))} * cos({2 * j} * {xi}) * "
        f"{sinh(f'{2 * j} * {eta}')}" for j in range(1, 7))
    xi_p = f"({xi} - ({xi_terms}))"
    eta_p = f"({eta} - ({eta_terms}))"
    chi = f"(asin(sin({xi_p}) / {cosh(eta_p)}))"
    phi_terms = " + ".join(
        f"{_d(float(PJ.DELTA[j - 1]))} * sin({2 * j} * {chi})"
        for j in range(1, 7))
    phi = f"({chi} + {phi_terms})"
    lam = f"(atan2({sinh(eta_p)}, cos({xi_p})))"
    r2d = _d(180.0 / math.pi)
    return f"({_d(lon0)} + {lam} * {r2d})", f"({phi} * {r2d})"


def suggested_warp_output(width: int, height: int, dst_from_src,
                          n_pixel_step: int = 50
                          ) -> tuple[int, int, tuple]:
    """GDALSuggestedWarpOutput2 (gdal/alg/gdaltransformer.cpp:340-750):
    infer the output grid of a warp. Samples the source edge at ~50-px
    steps (20..100 steps per side, :365-368), forward-transforms to output
    georeferenced coords, and takes the bounding box of the valid samples;
    the square output pixel size is the transformed corner-diagonal
    distance over the source pixel diagonal (:697-726), and the size
    rounds with +0.5 (:744-745). Non-finite edge samples fall back to the
    full interior sample grid (the detailed-grid path, :516-552); the
    dichotomic discontinuity search and border-fit retries (:586,:760)
    are unnecessary for the engine's continuous closed-form CRS family.

    Returns (width, height, geotransform) of the suggested output."""
    n_steps = int(min(width, height) / n_pixel_step + 0.5)
    n_steps = max(20, min(100, n_steps))
    r = np.arange(n_steps + 1, dtype=np.float64) / n_steps
    zeros = np.zeros(n_steps + 1)
    px = np.concatenate([r * width, r * width, zeros, zeros + width])
    py = np.concatenate([zeros, zeros + height, r * height, r * height])
    x, y = dst_from_src(px, py)
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    ok = np.isfinite(x) & np.isfinite(y)
    if not ok.all():
        gx, gy = np.meshgrid(r * width, r * height)
        x, y = dst_from_src(gx.ravel(), gy.ravel())
        x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
        ok = np.isfinite(x) & np.isfinite(y)
        if not ok.any():
            raise ValueError("suggested_warp_output: transform failed on "
                             "every sample point")
    xmin = float(x[ok].min()); xmax = float(x[ok].max())
    ymin = float(y[ok].min()); ymax = float(y[ok].max())
    if ok[0] and ok[-1]:   # image-corner diagonal (:706-710)
        dx, dy = float(x[-1] - x[0]), float(y[-1] - y[0])
    else:
        dx, dy = xmax - xmin, ymax - ymin
    pixel_size = math.hypot(dx, dy) / math.hypot(width, height)
    out_w = int((xmax - xmin) / pixel_size + 0.5)
    out_h = int((ymax - ymin) / pixel_size + 0.5)
    gt = (xmin, pixel_size, 0.0, ymax, 0.0, -pixel_size)
    return out_w, out_h, gt


def crs_from_epsg(code: int):
    """``importFromEPSG`` analog (gdal/ogr/ogrspatialreference.cpp
    importFromEPSG + gdal/ogr/ogr_fromepsg.cpp). Since round 4 this is
    **registry-driven**: `functions/epsg.py` builds ~3,920 projected +
    475 geographic CRS from the bundled EPSG Geodetic Parameter Dataset
    tables (gdal_spark/data/epsg/*, the same public EPSG CSV data
    GDAL's importFromEPSG reads), covering 18 projection method
    families. The closed-form fast paths below (WGS84 UTM zones,
    WebMercator aliases, ESRI codes) are kept first: they avoid the
    registry parse and carry the engine's precomputed Krüger
    coefficients."""
    code = int(code)
    if code == 4326:
        return Geographic()
    if code in (3857, 900913, 3785):
        return WebMercator()
    if 32601 <= code <= 32660:
        return utm_crs(code - 32600, north=True)
    if 32701 <= code <= 32760:
        return utm_crs(code - 32700, north=False)
    if code == 5070:  # NAD83 / Conus Albers (EPSG registry parameters)
        return AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23.0,
                               lon0=-96.0, fe=0.0, fn=0.0)
    if code == 102004:  # ESRI:102004 USA Contiguous LCC
        return LambertConformalConic(lat1=33.0, lat2=45.0, lat0=39.0,
                                     lon0=-96.0, fe=0.0, fn=0.0)
    grs80_f = 1.0 / 298.257222101
    if code == 3031:  # WGS84 / Antarctic Polar Stereographic
        return PolarStereographic(lat_ts=-71.0, lon0=0.0)
    if code == 3976:  # WGS84 / NSIDC Sea Ice Polar Stereographic South
        return PolarStereographic(lat_ts=-70.0, lon0=0.0)
    if code == 3413:  # WGS84 / NSIDC Sea Ice Polar Stereographic North
        return PolarStereographic(lat_ts=70.0, lon0=-45.0)
    if code in (5041, 32661):  # WGS84 / UPS North (variant A)
        return PolarStereographic(lat_ts=90.0, lon0=0.0, k0=0.994,
                                  fe=2000000.0, fn=2000000.0)
    if code in (5042, 32761):  # WGS84 / UPS South (variant A)
        return PolarStereographic(lat_ts=-90.0, lon0=0.0, k0=0.994,
                                  fe=2000000.0, fn=2000000.0)
    if code == 3035:  # ETRS89-extended / LAEA Europe (GRS80)
        return LambertAzimuthalEqualArea(lat0=52.0, lon0=10.0,
                                         fe=4321000.0, fn=3210000.0,
                                         f=grs80_f)
    if code == 3395:  # WGS84 / World Mercator (variant A)
        return Mercator()
    if code == 27700:  # OSGB36 / British National Grid (Airy 1830 +
        # the published single-solution TOWGS84 Helmert)
        bng = TransverseMercator(lon0=-2.0, k0=0.9996012717,
                                 fe=400000.0, fn=-100000.0, lat0=49.0,
                                 a=6377563.396, f=1.0 / 299.3249646)
        return DatumShifted(bng, OSGB36_TOWGS84)
    from gdal_spark.functions import epsg as _epsg
    try:
        return _epsg.from_epsg(code)
    except ValueError:
        raise ValueError(
            f"EPSG:{code} not in the bundled EPSG registry tables; "
            "construct the CRS dataclass or pass WKT") from None


# ---------------------------------------------------------------------------
# GCPs -> affine geotransform (GDALGCPsToGeoTransform,
# gdal/gcore/gdal_misc.cpp:1903-2186)
# ---------------------------------------------------------------------------

def _apply_gt(gt, x, y):
    return (gt[0] + gt[1] * x + gt[2] * y, gt[3] + gt[4] * x + gt[5] * y)


def inv_geotransform(gt):
    """GDALInvGeoTransform: invert an affine geotransform (None if
    singular)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0.0:
        return None
    inv_det = 1.0 / det
    g1 = gt[5] * inv_det
    g2 = -gt[2] * inv_det
    g4 = -gt[4] * inv_det
    g5 = gt[1] * inv_det
    return (-gt[0] * g1 - gt[3] * g2, g1, g2,
            -gt[0] * g4 - gt[3] * g5, g4, g5)


def compose_geotransforms(gt1, gt2):
    """GDALComposeGeoTransforms: gt(p) = gt2(gt1(p))."""
    return (gt2[1] * gt1[0] + gt2[2] * gt1[3] + gt2[0],
            gt2[1] * gt1[1] + gt2[2] * gt1[4],
            gt2[1] * gt1[2] + gt2[2] * gt1[5],
            gt2[4] * gt1[0] + gt2[5] * gt1[3] + gt2[3],
            gt2[4] * gt1[1] + gt2[5] * gt1[4],
            gt2[4] * gt1[2] + gt2[5] * gt1[5])


def gcps_to_geotransform(gcps, approx_ok: bool = True):
    """First-order fit of an affine geotransform to GCPs
    (GDALGCPsToGeoTransform, gdal/gcore/gdal_misc.cpp:1903): 2-GCP
    offset+scale special case, exact TL-TR-BR-BL 4-corner special case,
    otherwise a range-normalized least-squares fit; with
    ``approx_ok=False`` the fit is rejected (returns None) if any GCP
    deviates by more than 0.25 pixel. ``gcps`` is a sequence of
    (pixel, line, geo_x, geo_y). Returns a 6-tuple or None."""
    g = [(float(p), float(l), float(x), float(y)) for p, l, x, y in gcps]
    n = len(g)
    if n < 2:
        return None
    if n == 2:
        (p0, l0, x0, y0), (p1, l1, x1, y1) = g
        if p1 == p0 or l1 == l0:
            return None
        a1 = (x1 - x0) / (p1 - p0)
        a5 = (y1 - y0) / (l1 - l0)
        return (x0 - p0 * a1, a1, 0.0, y0 - l0 * a5, 0.0, a5)
    if (n == 4
            and g[0][1] == g[1][1] and g[2][1] == g[3][1]
            and g[0][0] == g[3][0] and g[1][0] == g[2][0]
            and g[0][1] != g[2][1] and g[0][0] != g[1][0]
            and g[0][3] == g[1][3] and g[2][3] == g[3][3]
            and g[0][2] == g[3][2] and g[1][2] == g[2][2]
            and g[0][3] != g[2][3] and g[0][2] != g[1][2]):
        a1 = (g[1][2] - g[0][2]) / (g[1][0] - g[0][0])
        a5 = (g[2][3] - g[1][3]) / (g[2][1] - g[1][1])
        return (g[0][2] - g[0][0] * a1, a1, 0.0,
                g[0][3] - g[0][1] * a5, 0.0, a5)
    arr = np.asarray(g)
    min_p, max_p = arr[:, 0].min(), arr[:, 0].max()
    min_l, max_l = arr[:, 1].min(), arr[:, 1].max()
    min_x, max_x = arr[:, 2].min(), arr[:, 2].max()
    min_y, max_y = arr[:, 3].min(), arr[:, 3].max()
    eps = 1.0e-12
    if (abs(max_p - min_p) < eps or abs(max_l - min_l) < eps
            or abs(max_x - min_x) < eps or abs(max_y - min_y) < eps):
        return None
    pl_norm = (-min_p / (max_p - min_p), 1.0 / (max_p - min_p), 0.0,
               -min_l / (max_l - min_l), 0.0, 1.0 / (max_l - min_l))
    geo_norm = (-min_x / (max_x - min_x), 1.0 / (max_x - min_x), 0.0,
                -min_y / (max_y - min_y), 0.0, 1.0 / (max_y - min_y))
    px, ln = _apply_gt(pl_norm, arr[:, 0], arr[:, 1])
    gx, gy = _apply_gt(geo_norm, arr[:, 2], arr[:, 3])
    sx, sy = px.sum(), ln.sum()
    sxy, sxx, syy = (px * ln).sum(), (px * px).sum(), (ln * ln).sum()
    s_lon, s_lonx, s_lony = gx.sum(), (gx * px).sum(), (gx * ln).sum()
    s_lat, s_latx, s_laty = gy.sum(), (gy * px).sum(), (gy * ln).sum()
    divisor = (n * (sxx * syy - sxy * sxy) + 2 * sx * sy * sxy
               - sy * sy * sxx - sx * sx * syy)
    if divisor == 0.0:
        return None
    gtn = (
        (s_lon * (sxx * syy - sxy * sxy) + s_lonx * (sy * sxy - sx * syy)
         + s_lony * (sx * sxy - sy * sxx)) / divisor,
        (s_lon * (sy * sxy - sx * syy) + s_lonx * (n * syy - sy * sy)
         + s_lony * (sx * sy - sxy * n)) / divisor,
        (s_lon * (sx * sxy - sy * sxx) + s_lonx * (sx * sy - n * sxy)
         + s_lony * (n * sxx - sx * sx)) / divisor,
        (s_lat * (sxx * syy - sxy * sxy) + s_latx * (sy * sxy - sx * syy)
         + s_laty * (sx * sxy - sy * sxx)) / divisor,
        (s_lat * (sy * sxy - sx * syy) + s_latx * (n * syy - sy * sy)
         + s_laty * (sx * sy - sxy * n)) / divisor,
        (s_lat * (sx * sxy - sy * sxx) + s_latx * (sx * sy - n * sxy)
         + s_laty * (n * sxx - sx * sx)) / divisor,
    )
    inv_geo = inv_geotransform(geo_norm)
    if inv_geo is None:
        return None
    gt = compose_geotransforms(compose_geotransforms(pl_norm, gtn), inv_geo)
    if not approx_ok:
        px_size = 0.5 * (abs(gt[1]) + abs(gt[2]) + abs(gt[4]) + abs(gt[5]))
        ex, ey = _apply_gt(gt, arr[:, 0], arr[:, 1])
        if (np.abs(ex - arr[:, 2]) > 0.25 * px_size).any() \
                or (np.abs(ey - arr[:, 3]) > 0.25 * px_size).any():
            return None
    return gt


def sql_omerc_forward(crs, lon: str, lat: str) -> tuple[str, str]:
    """DuckDB/Spark SQL text for the Hotine Oblique Mercator forward
    (EPSG 9812/9815; same constant doubles as
    :meth:`projections.HotineObliqueMercator.forward`). Domain-limited:
    no longitude wrap guard — callers feed points near the projection
    centre, as the oracle queries do."""
    e, A, B, H, gamma0, lam0, uc, sign = crs._consts()
    d2r = _d(math.pi / 180.0)
    er = _d(e)
    s = f"sin(({lat}) * {d2r})"
    t = (f"(tan({_d(math.pi / 4.0)} - ({lat}) * {_d(math.pi / 360.0)}) / "
         f"pow((1.0 - {er} * {s}) / (1.0 + {er} * {s}), {_d(e / 2.0)}))")
    q = f"({_d(H)} / pow({t}, {_d(B)}))"
    big_s = f"(({q} - 1.0 / {q}) / 2.0)"
    big_t = f"(({q} + 1.0 / {q}) / 2.0)"
    dlam = f"((({lon}) * {d2r}) - {_d(lam0)})"
    big_v = f"sin({_d(B)} * {dlam})"
    cg0, sg0 = _d(math.cos(gamma0)), _d(math.sin(gamma0))
    big_u = f"((-{big_v} * {cg0} + {big_s} * {sg0}) / {big_t})"
    v = f"({_d(A)} * ln((1.0 - {big_u}) / (1.0 + {big_u})) / {_d(2.0 * B)})"
    u = (f"({_d(A)} * atan2({big_s} * {cg0} + {big_v} * {sg0}, "
         f"cos({_d(B)} * {dlam})) / {_d(B)})")
    if crs.variant_b:
        u = f"({u} - {_d(abs(uc) * sign)})"
    g = math.radians(crs.gammac)
    cg, sg = _d(math.cos(g)), _d(math.sin(g))
    x = f"({_d(crs.fe)} + {v} * {cg} + {u} * {sg})"
    y = f"({_d(crs.fn)} + {u} * {cg} - {v} * {sg})"
    return x, y
