"""EPSG projection-method long tail: the map-projection families the
round-3 engine lacked, closing the ``importFromEPSG`` gap
(gdal/ogr/ogrspatialreference.cpp importFromEPSG +
gdal/ogr/ogr_fromepsg.cpp read the same EPSG registry facts; the
transform math in GDAL is delegated to PROJ — here each method is a
closed-form vectorized ``forward``/``inverse`` pair re-derived from
Snyder 1987 "Map Projections: A Working Manual" and the public EPSG
Guidance Note 7-2 formulas; no reference code).

Methods (EPSG method codes):

- 9801 Lambert Conic Conformal 1SP  → :class:`LambertConformalConic1SP`
- 9803 LCC 2SP Belgium              → :class:`LambertConformalConic2SPBelgium`
- 9806 Cassini-Soldner              → :class:`CassiniSoldner`
- 9808 TM South Orientated          → :class:`TransverseMercatorSouth`
- 9809 Oblique (double) Stereographic → :class:`ObliqueStereographic`
- 9812/9815 Hotine Oblique Mercator (variants A/B) → :class:`HotineObliqueMercator`
- 9814 Swiss Oblique Cylindrical (Rosenmund) → :class:`SwissObliqueMercator`
- 9818 American Polyconic           → :class:`Polyconic`
- 9819/1041 Krovak (+ East-North)   → :class:`Krovak`
- 9823/9842/1028/1029 Equidistant Cylindrical / Plate Carrée → :class:`EquidistantCylindrical`
- Equidistant Conic (Snyder ch. 16) → :class:`EquidistantConic`
- 9826 LCC West Orientated          → :class:`LambertConformalConicWest`

Everything is degrees-in / CRS-units-out, vectorized numpy over
coordinate arrays, picklable frozen dataclasses — the same contract as
``functions/srs.py`` so every class plugs into GenImgProjTransform /
the distributed warp unchanged.

Validation (tests/test_projections.py): EPSG Guidance Note 7-2 worked
examples (Jamaica LCC-1SP, Timbalai HOM-B, RD-New double stereographic,
Trinidad Cassini in Clarke links, Krovak S-JTSK), origin exactness,
forward∘inverse round-trips at 1e-9 deg, and *independent* oracles —
numeric meridian-arc integration and numeric conformality/scale checks
— so the expectations do not share code with the implementation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

WGS84 = (6378137.0, 1.0 / 298.257223563)


# ---------------------------------------------------------------------------
# shared helpers (Snyder auxiliary functions; duplicated minimally from
# srs.py to avoid an import cycle — srs.py imports this module)
# ---------------------------------------------------------------------------

def _t(phi, e):
    """Snyder 15-9 isometric colatitude function."""
    s = np.sin(phi)
    return (np.tan(math.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def _m(phi, e):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - (e * s) ** 2)


def _phi_from_t(t, e):
    t = np.asarray(t, np.float64)
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = (math.pi / 2.0
               - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)))
    return phi


def meridian_arc(phi, a: float, e2: float):
    """Meridian arc length M(phi) from the equator (Snyder 3-21)."""
    phi = np.asarray(phi, np.float64)
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
                - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0
                   + 45.0 * e6 / 1024.0) * np.sin(2.0 * phi)
                + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4.0 * phi)
                - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi))


def footpoint_latitude(M, a: float, e2: float):
    """Inverse meridian arc: latitude whose M(phi) equals ``M``
    (Snyder 3-26 rectifying-latitude series + 2 Newton refinements for
    sub-nanometre closure on any geodetic ellipsoid)."""
    M = np.asarray(M, np.float64)
    e4, e6 = e2 * e2, e2 * e2 * e2
    mu = M / (a * (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0))
    sqrt1me2 = math.sqrt(1.0 - e2)
    e1 = (1.0 - sqrt1me2) / (1.0 + sqrt1me2)
    e1_2, e1_3, e1_4 = e1 * e1, e1 ** 3, e1 ** 4
    phi = (mu
           + (3.0 * e1 / 2.0 - 27.0 * e1_3 / 32.0) * np.sin(2.0 * mu)
           + (21.0 * e1_2 / 16.0 - 55.0 * e1_4 / 32.0) * np.sin(4.0 * mu)
           + (151.0 * e1_3 / 96.0) * np.sin(6.0 * mu)
           + (1097.0 * e1_4 / 512.0) * np.sin(8.0 * mu))
    for _ in range(2):  # Newton: dM/dphi = a(1-e2)/(1-e2 sin^2)^{3/2}
        s = np.sin(phi)
        dm = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
        phi = phi + (M - meridian_arc(phi, a, e2)) / dm
    return phi


def _e_of(f: float) -> float:
    return math.sqrt(f * (2.0 - f))


def _iso_lat(phi, e):
    """Ellipsoidal isometric latitude psi."""
    s = np.sin(phi)
    return (np.log(np.tan(math.pi / 4.0 + phi / 2.0))
            - (e / 2.0) * np.log((1.0 + e * s) / (1.0 - e * s)))


def _phi_from_iso(psi, e):
    """Latitude from isometric latitude (fixed point, 12 rounds)."""
    return _phi_from_t(np.exp(-np.asarray(psi, np.float64)), e)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic 1SP (EPSG 9801) / Belgium (9803) / West (9826)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LambertConformalConic1SP:
    """LCC with one standard parallel + scale factor (EPSG 9801;
    Snyder 15-1..15-11 with n = sin(lat0) and the k0 multiplier)."""

    lat0: float
    lon0: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "lcc1sp"

    def _consts(self):
        e = _e_of(self.f)
        p0 = math.radians(self.lat0)
        n = math.sin(p0)
        t0 = float(_t(np.float64(p0), e))
        m0 = float(_m(np.float64(p0), e))
        big_f = m0 / (n * t0 ** n)
        rho0 = self.a * big_f * t0 ** n * self.k0
        return e, n, big_f, rho0

    def forward(self, lon, lat):
        e, n, big_f, rho0 = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * big_f * _t(phi, e) ** n * self.k0
        theta = n * lam
        return (self.fe + rho * np.sin(theta),
                self.fn + rho0 - rho * np.cos(theta))

    def inverse(self, x, y):
        e, n, big_f, rho0 = self._consts()
        dx = np.asarray(x, np.float64) - self.fe
        dy = rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(n) * np.hypot(dx, dy)
        theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        t = (rho / (self.a * big_f * self.k0)) ** (1.0 / n)
        phi = _phi_from_t(t, e)
        return self.lon0 + np.rad2deg(theta / n), np.rad2deg(phi)


@dataclass(frozen=True)
class LambertConformalConic2SPBelgium:
    """LCC 2SP (Belgium) — EPSG 9803: the 2-standard-parallel cone with
    theta reduced by 29.2985" (Belge Lambert 72)."""

    lat1: float
    lat2: float
    lat0: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "lcc2sp_belgium"

    _BELGE = math.radians(29.2985 / 3600.0)

    def _consts(self):
        e = _e_of(self.f)
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        p0 = math.radians(self.lat0)
        m1, m2 = float(_m(np.float64(p1), e)), float(_m(np.float64(p2), e))
        t0 = float(_t(np.float64(p0), e))
        t1, t2 = float(_t(np.float64(p1), e)), float(_t(np.float64(p2), e))
        n = ((math.log(m1) - math.log(m2))
             / (math.log(t1) - math.log(t2)))
        big_f = m1 / (n * t1 ** n)
        rho0 = self.a * big_f * t0 ** n
        return e, n, big_f, rho0

    def forward(self, lon, lat):
        e, n, big_f, rho0 = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * big_f * _t(phi, e) ** n
        theta = n * lam - self._BELGE
        return (self.fe + rho * np.sin(theta),
                self.fn + rho0 - rho * np.cos(theta))

    def inverse(self, x, y):
        e, n, big_f, rho0 = self._consts()
        dx = np.asarray(x, np.float64) - self.fe
        dy = rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(n) * np.hypot(dx, dy)
        theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy) + self._BELGE
        t = (rho / (self.a * big_f)) ** (1.0 / n)
        phi = _phi_from_t(t, e)
        return self.lon0 + np.rad2deg(theta / n), np.rad2deg(phi)


@dataclass(frozen=True)
class LambertConformalConicWest:
    """LCC 1SP West Orientated (EPSG 9826): easting axis positive west
    — W = FE − (E_natural − FE) relative to the 9801 chart."""

    lat0: float
    lon0: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "lcc_west"

    def _base(self):
        return LambertConformalConic1SP(self.lat0, self.lon0, self.k0,
                                        0.0, self.fn, self.a, self.f)

    def forward(self, lon, lat):
        x, y = self._base().forward(lon, lat)
        return self.fe - x, y

    def inverse(self, x, y):
        return self._base().inverse(self.fe - np.asarray(x, np.float64), y)


# ---------------------------------------------------------------------------
# Cassini-Soldner (EPSG 9806; Snyder 13-7..13-13)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CassiniSoldner:
    lat0: float
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "cassini"

    def forward(self, lon, lat):
        e2 = self.f * (2.0 - self.f)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        s, c = np.sin(phi), np.cos(phi)
        nu = self.a / np.sqrt(1.0 - e2 * s * s)
        big_a = lam * c
        big_t = np.tan(phi) ** 2
        big_c = e2 * c * c / (1.0 - e2)
        a2 = big_a * big_a
        big_m = meridian_arc(phi, self.a, e2)
        m0 = float(meridian_arc(np.float64(math.radians(self.lat0)),
                                self.a, e2))
        x = nu * (big_a - big_t * big_a * a2 / 6.0
                  - (8.0 - big_t + 8.0 * big_c) * big_t * a2 * a2 * big_a
                  / 120.0)
        y = (big_m - m0
             + nu * np.tan(phi) * (a2 / 2.0
                                   + (5.0 - big_t + 6.0 * big_c)
                                   * a2 * a2 / 24.0))
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        e2 = self.f * (2.0 - self.f)
        x = np.asarray(x, np.float64) - self.fe
        y = np.asarray(y, np.float64) - self.fn
        m0 = float(meridian_arc(np.float64(math.radians(self.lat0)),
                                self.a, e2))
        phi1 = footpoint_latitude(m0 + y, self.a, e2)
        s1 = np.sin(phi1)
        t1 = np.tan(phi1) ** 2
        nu1 = self.a / np.sqrt(1.0 - e2 * s1 * s1)
        rho1 = self.a * (1.0 - e2) / (1.0 - e2 * s1 * s1) ** 1.5
        big_d = x / nu1
        d2 = big_d * big_d
        phi = phi1 - (nu1 * np.tan(phi1) / rho1) * (
            d2 / 2.0 - (1.0 + 3.0 * t1) * d2 * d2 / 24.0)
        lam = (big_d - t1 * big_d * d2 / 3.0
               + (1.0 + 3.0 * t1) * t1 * big_d * d2 * d2 / 15.0) / np.cos(phi1)
        return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# Transverse Mercator South Orientated (EPSG 9808)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TransverseMercatorSouth:
    """South-orientated Gauss-Conform (EPSG 9808, South African Lo
    belts): coordinates are (westing, southing) — the natural TM chart
    with both axes negated about the false origin."""

    lon0: float
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    lat0: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "tmerc_south"

    def _base(self):
        from gdal_spark.functions.srs import TransverseMercator
        return TransverseMercator(lon0=self.lon0, k0=self.k0, fe=0.0,
                                  fn=0.0, lat0=self.lat0, a=self.a, f=self.f)

    def forward(self, lon, lat):
        e, n = self._base().forward(lon, lat)
        return self.fe - e, self.fn - n

    def inverse(self, x, y):
        return self._base().inverse(self.fe - np.asarray(x, np.float64),
                                    self.fn - np.asarray(y, np.float64))


# ---------------------------------------------------------------------------
# Oblique (double) Stereographic (EPSG 9809; RD New etc.)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ObliqueStereographic:
    """Double stereographic: conformal sphere at the origin latitude,
    then spherical oblique stereographic (EPSG Guidance Note 7-2
    formulas, Gauss-Schreiber conformal sphere)."""

    lat0: float
    lon0: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "sterea"

    def _consts(self):
        e = _e_of(self.f)
        e2 = e * e
        p0 = math.radians(self.lat0)
        s0, c0 = math.sin(p0), math.cos(p0)
        rho0 = self.a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
        nu0 = self.a / math.sqrt(1.0 - e2 * s0 * s0)
        big_r = math.sqrt(rho0 * nu0)           # Gaussian sphere radius
        n = math.sqrt(1.0 + e2 * c0 ** 4 / (1.0 - e2))
        s1 = (1.0 + s0) / (1.0 - s0)
        s2 = (1.0 - e * s0) / (1.0 + e * s0)
        w1 = (s1 * s2 ** e) ** n
        sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
        c = ((n + s0) * (1.0 - sin_chi0)) / ((n - s0) * (1.0 + sin_chi0))
        w2 = c * w1
        chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
        return e, big_r, n, c, chi0

    def _sphere(self, lon, lat):
        """(lon°, lat°) → conformal-sphere (chi, Lambda) radians."""
        e, big_r, n, c, chi0 = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam0 = math.radians(self.lon0)
        lam = np.deg2rad(np.asarray(lon, np.float64))
        big_l = n * (lam - lam0) + lam0
        s = np.sin(phi)
        sa = (1.0 + s) / (1.0 - s)
        sb = (1.0 - e * s) / (1.0 + e * s)
        w = c * (sa * sb ** e) ** n
        chi = np.arcsin((w - 1.0) / (w + 1.0))
        return chi, big_l

    def forward(self, lon, lat):
        e, big_r, n, c, chi0 = self._consts()
        chi, big_l = self._sphere(lon, lat)
        lam0 = math.radians(self.lon0)
        dl = big_l - lam0
        b = (1.0 + np.sin(chi) * math.sin(chi0)
             + np.cos(chi) * math.cos(chi0) * np.cos(dl))
        k = 2.0 * big_r * self.k0 / b
        x = k * np.cos(chi) * np.sin(dl)
        y = k * (np.sin(chi) * math.cos(chi0)
                 - np.cos(chi) * math.sin(chi0) * np.cos(dl))
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        e, big_r, n, c, chi0 = self._consts()
        xp = np.asarray(x, np.float64) - self.fe
        yp = np.asarray(y, np.float64) - self.fn
        lam0 = math.radians(self.lon0)
        # invert the spherical oblique stereographic (exact closed form:
        # plane → sphere via the tangent half-angle rho)
        rho = np.hypot(xp, yp)
        ce = 2.0 * np.arctan2(rho, 2.0 * big_r * self.k0)
        sce, cce = np.sin(ce), np.cos(ce)
        safe = np.where(rho == 0.0, 1.0, rho)
        chi = np.where(
            rho == 0.0, chi0,
            np.arcsin(np.clip(cce * math.sin(chi0)
                              + yp * sce * math.cos(chi0) / safe,
                              -1.0, 1.0)))
        dl = np.arctan2(xp * sce,
                        safe * math.cos(chi0) * cce
                        - yp * math.sin(chi0) * sce)
        dl = np.where(rho == 0.0, 0.0, dl)
        big_l = dl + lam0
        lam = (big_l - lam0) / n + lam0
        # conformal-sphere chi → ellipsoid phi: psi from chi, then solve
        psi = (np.log((1.0 + np.sin(chi))
                      / (c * (1.0 - np.sin(chi)))) / (2.0 * n))
        phi = _phi_from_iso(psi, e)
        return np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# Hotine Oblique Mercator, variants A (9812) and B (9815)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HotineObliqueMercator:
    """Hotine Oblique Mercator (EPSG 9812 variant A / 9815 variant B;
    Snyder 9-6..9-39 via the EPSG Guidance Note 7-2 parameterization).
    ``latc/lonc`` = projection centre, ``alphac`` = azimuth of the
    initial line at the centre, ``gammac`` = rectified-grid angle,
    ``k0`` = scale on the initial line. Variant B (``variant_b=True``)
    anchors FE/FN at the projection centre (Ec/Nc) and offsets u by uc."""

    latc: float
    lonc: float
    alphac: float
    gammac: float
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    variant_b: bool = False
    name = "omerc"

    def _consts(self):
        e = _e_of(self.f)
        e2 = e * e
        pc = math.radians(self.latc)
        sc, cc = math.sin(pc), math.cos(pc)
        big_b = math.sqrt(1.0 + e2 * cc ** 4 / (1.0 - e2))
        big_a = (self.a * big_b * self.k0 * math.sqrt(1.0 - e2)
                 / (1.0 - e2 * sc * sc))
        t0 = float(_t(np.float64(pc), e))
        big_d = (big_b * math.sqrt(1.0 - e2)
                 / (cc * math.sqrt(1.0 - e2 * sc * sc)))
        d2 = max(big_d * big_d, 1.0)
        sign = 1.0 if self.latc >= 0.0 else -1.0
        big_f = big_d + math.sqrt(d2 - 1.0) * sign
        big_h = big_f * t0 ** big_b
        big_g = (big_f - 1.0 / big_f) / 2.0
        alpha = math.radians(self.alphac)
        gamma0 = math.asin(math.sin(alpha) / big_d)
        lam0 = (math.radians(self.lonc)
                - math.asin(big_g * math.tan(gamma0)) / big_b)
        if abs(self.alphac - 90.0) < 1e-12:
            uc = big_a * (math.radians(self.lonc) - lam0)
        else:
            uc = ((big_a / big_b)
                  * math.atan2(math.sqrt(d2 - 1.0), math.cos(alpha)) * sign)
        return e, big_a, big_b, big_h, gamma0, lam0, uc, sign

    def _uv(self, lon, lat):
        e, A, B, H, gamma0, lam0, uc, sign = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64))
        t = _t(phi, e)
        big_q = H / t ** B
        big_s = (big_q - 1.0 / big_q) / 2.0
        big_t = (big_q + 1.0 / big_q) / 2.0
        dlam = lam - lam0
        dlam = np.where(dlam > math.pi, dlam - 2.0 * math.pi, dlam)
        dlam = np.where(dlam < -math.pi, dlam + 2.0 * math.pi, dlam)
        big_v = np.sin(B * dlam)
        big_u = ((-big_v * math.cos(gamma0) + big_s * math.sin(gamma0))
                 / big_t)
        v = A * np.log((1.0 - big_u) / (1.0 + big_u)) / (2.0 * B)
        u = (A * np.arctan2(big_s * math.cos(gamma0)
                            + big_v * math.sin(gamma0),
                            np.cos(B * dlam)) / B)
        if self.variant_b:
            u = u - abs(uc) * sign
        return u, v

    def forward(self, lon, lat):
        u, v = self._uv(lon, lat)
        g = math.radians(self.gammac)
        return (self.fe + v * math.cos(g) + u * math.sin(g),
                self.fn + u * math.cos(g) - v * math.sin(g))

    def inverse(self, x, y):
        e, A, B, H, gamma0, lam0, uc, sign = self._consts()
        g = math.radians(self.gammac)
        xp = np.asarray(x, np.float64) - self.fe
        yp = np.asarray(y, np.float64) - self.fn
        v = xp * math.cos(g) - yp * math.sin(g)
        u = yp * math.cos(g) + xp * math.sin(g)
        if self.variant_b:
            u = u + abs(uc) * sign
        big_q = np.exp(-B * v / A)
        big_s = (big_q - 1.0 / big_q) / 2.0
        big_t = (big_q + 1.0 / big_q) / 2.0
        big_v = np.sin(B * u / A)
        big_u = ((big_v * math.cos(gamma0) + big_s * math.sin(gamma0))
                 / big_t)
        t = (H / np.sqrt((1.0 + big_u) / (1.0 - big_u))) ** (1.0 / B)
        phi = _phi_from_t(t, e)
        lam = lam0 - np.arctan2(big_s * math.cos(gamma0)
                                - big_v * math.sin(gamma0),
                                np.cos(B * u / A)) / B
        return np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# Swiss Oblique Cylindrical / Rosenmund (EPSG 9814)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SwissObliqueMercator:
    """Rosenmund oblique cylindrical (EPSG 9814; CH1903 / LV03 and
    CH1903+ / LV95): ellipsoid → Gaussian sphere at lat0 → rotate the
    sphere so the origin sits on the equator → spherical Mercator.
    Formulas per the public swisstopo projection note / EPSG GN7-2."""

    lat0: float
    lon0: float
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "somerc"

    def _consts(self):
        e = _e_of(self.f)
        e2 = e * e
        p0 = math.radians(self.lat0)
        s0 = math.sin(p0)
        big_r = (self.k0 * self.a * math.sqrt(1.0 - e2)
                 / (1.0 - e2 * s0 * s0))
        alpha = math.sqrt(1.0 + e2 * math.cos(p0) ** 4 / (1.0 - e2))
        b0 = math.asin(s0 / alpha)
        psi0 = float(_iso_lat(np.float64(p0), e))
        big_k = math.log(math.tan(math.pi / 4.0 + b0 / 2.0)) - alpha * psi0
        return e, big_r, alpha, b0, big_k

    def forward(self, lon, lat):
        e, R, alpha, b0, K = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        s_iso = alpha * _iso_lat(phi, e) + K
        b = 2.0 * (np.arctan(np.exp(s_iso)) - math.pi / 4.0)
        big_i = alpha * lam
        sb, cb = np.sin(b), np.cos(b)
        sb0, cb0 = math.sin(b0), math.cos(b0)
        # rotate the Gaussian sphere: pole moved so (b0, 0) → (0, 0)
        sbb = cb0 * sb - sb0 * cb * np.cos(big_i)
        bbar = np.arcsin(np.clip(sbb, -1.0, 1.0))
        ibar = np.arctan2(cb * np.sin(big_i),
                          cb0 * cb * np.cos(big_i) + sb0 * sb)
        return (self.fe + R * ibar,
                self.fn + R * np.log(np.tan(math.pi / 4.0 + bbar / 2.0)))

    def inverse(self, x, y):
        e, R, alpha, b0, K = self._consts()
        ibar = (np.asarray(x, np.float64) - self.fe) / R
        bbar = 2.0 * (np.arctan(np.exp((np.asarray(y, np.float64)
                                        - self.fn) / R)) - math.pi / 4.0)
        sb0, cb0 = math.sin(b0), math.cos(b0)
        sb = sb0 * np.cos(bbar) * np.cos(ibar) + cb0 * np.sin(bbar)
        b = np.arcsin(np.clip(sb, -1.0, 1.0))
        big_i = np.arctan2(np.cos(bbar) * np.sin(ibar),
                           cb0 * np.cos(bbar) * np.cos(ibar)
                           - sb0 * np.sin(bbar))
        lam = big_i / alpha
        psi = (np.log(np.tan(math.pi / 4.0 + b / 2.0)) - K) / alpha
        phi = _phi_from_iso(psi, e)
        return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# American Polyconic (EPSG 9818; Snyder 18-12..18-18)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Polyconic:
    lat0: float
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "poly"

    def forward(self, lon, lat):
        e2 = self.f * (2.0 - self.f)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        m0 = float(meridian_arc(np.float64(math.radians(self.lat0)),
                                self.a, e2))
        s = np.sin(phi)
        nu = self.a / np.sqrt(1.0 - e2 * s * s)
        big_e = lam * s
        with np.errstate(divide="ignore", invalid="ignore"):
            cot = np.cos(phi) / s
            x = nu * cot * np.sin(big_e)
            y = (meridian_arc(phi, self.a, e2) - m0
                 + nu * cot * (1.0 - np.cos(big_e)))
        eq = np.abs(phi) < 1e-12
        x = np.where(eq, self.a * lam, x)
        y = np.where(eq, -m0, y)
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        e2 = self.f * (2.0 - self.f)
        xp = np.asarray(x, np.float64) - self.fe
        yp = np.asarray(y, np.float64) - self.fn
        m0 = float(meridian_arc(np.float64(math.radians(self.lat0)),
                                self.a, e2))
        big_a = (m0 + yp) / self.a
        big_b = xp * xp / (self.a * self.a) + big_a * big_a
        # Snyder 18-18 iteration
        phi = big_a.copy() if hasattr(big_a, "copy") else np.asarray(big_a)
        phi = np.asarray(phi, np.float64)
        for _ in range(30):
            s = np.sin(phi)
            big_c = np.sqrt(1.0 - e2 * s * s) * np.tan(phi)
            ma = meridian_arc(phi, self.a, e2) / self.a
            mn = (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0
                  - 5.0 * e2 ** 3 / 256.0) \
                - 2.0 * (3.0 * e2 / 8.0 + 3.0 * e2 * e2 / 32.0
                         + 45.0 * e2 ** 3 / 1024.0) * np.cos(2.0 * phi) \
                + 4.0 * (15.0 * e2 * e2 / 256.0
                         + 45.0 * e2 ** 3 / 1024.0) * np.cos(4.0 * phi) \
                - 6.0 * (35.0 * e2 ** 3 / 3072.0) * np.cos(6.0 * phi)
            num = (big_a * (big_c * ma + 1.0) - ma
                   - 0.5 * (ma * ma + big_b) * big_c)
            den = (e2 * np.sin(2.0 * phi) * (ma * ma + big_b
                                             - 2.0 * big_a * ma)
                   / (4.0 * big_c)
                   + (big_a - ma) * (big_c * mn - 2.0 / np.sin(2.0 * phi))
                   - mn)
            step = num / den
            phi = phi - step
        s = np.sin(phi)
        lam = (np.arcsin(np.clip(xp * np.tan(phi)
                                 * np.sqrt(1.0 - e2 * s * s) / self.a,
                                 -1.0, 1.0)) / np.maximum(np.abs(s), 1e-300)
               * np.sign(s))
        eq = np.abs(yp + m0) < 1e-9 * self.a
        lam = np.where(eq, xp / self.a, lam)
        phi = np.where(eq, 0.0, phi)
        return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# Krovak (EPSG 9819; East-North variant 1041 = negated axes)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Krovak:
    """Krovak oblique conformal conic (S-JTSK). ``latc`` = latitude of
    projection centre (49°30'N), ``lon0`` = longitude of origin in
    *Greenwich* degrees (the EPSG parameter is Ferro-based; the registry
    loader folds the prime meridian in), ``alphac`` = co-latitude of the
    cone axis (30°17'17.3031"), ``latp`` = pseudo standard parallel
    (78°30'N), ``kp`` = scale on it (0.9999). Native axes are
    (X southing, Y westing); ``east_north=True`` (EPSG 1041, e.g.
    EPSG:5514) emits (E, N) = (−Y, −X)."""

    latc: float = 49.5
    lon0: float = 24.0 + 50.0 / 60.0
    alphac: float = 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0
    latp: float = 78.5
    kp: float = 0.9999
    fe: float = 0.0
    fn: float = 0.0
    a: float = 6377397.155
    f: float = 1.0 / 299.15281
    east_north: bool = True
    name = "krovak"

    def _consts(self):
        e = _e_of(self.f)
        e2 = e * e
        pc = math.radians(self.latc)
        sc, cc = math.sin(pc), math.cos(pc)
        big_a = self.a * math.sqrt(1.0 - e2) / (1.0 - e2 * sc * sc)
        big_b = math.sqrt(1.0 + e2 * cc ** 4 / (1.0 - e2))
        gamma0 = math.asin(sc / big_b)
        t0 = (math.tan(math.pi / 4.0 + gamma0 / 2.0)
              * ((1.0 + e * sc) / (1.0 - e * sc)) ** (e * big_b / 2.0)
              / math.tan(math.pi / 4.0 + pc / 2.0) ** big_b)
        n = math.sin(math.radians(self.latp))
        r0 = self.kp * big_a / math.tan(math.radians(self.latp))
        return e, big_a, big_b, gamma0, t0, n, r0

    def forward(self, lon, lat):
        e, A, B, gamma0, t0, n, r0 = self._consts()
        alpha = math.radians(self.alphac)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64))
        lam0 = math.radians(self.lon0)
        s = np.sin(phi)
        big_u = 2.0 * (np.arctan(
            t0 * np.tan(phi / 2.0 + math.pi / 4.0) ** B
            * ((1.0 - e * s) / (1.0 + e * s)) ** (e * B / 2.0))
            - math.pi / 4.0)
        big_v = B * (lam0 - lam)
        cu, su = np.cos(big_u), np.sin(big_u)
        big_t = np.arcsin(np.clip(math.cos(alpha) * su
                                  + math.sin(alpha) * cu * np.cos(big_v),
                                  -1.0, 1.0))
        big_d = np.arcsin(np.clip(cu * np.sin(big_v) / np.cos(big_t),
                                  -1.0, 1.0))
        theta = n * big_d
        r = (r0 * math.tan(math.pi / 4.0 + math.radians(self.latp) / 2.0)
             ** n / np.tan(big_t / 2.0 + math.pi / 4.0) ** n)
        x_south = r * np.cos(theta) + self.fn
        y_west = r * np.sin(theta) + self.fe
        if self.east_north:
            return -y_west, -x_south
        return x_south, y_west

    def inverse(self, x, y):
        e, A, B, gamma0, t0, n, r0 = self._consts()
        alpha = math.radians(self.alphac)
        if self.east_north:
            x_south = -np.asarray(y, np.float64)
            y_west = -np.asarray(x, np.float64)
        else:
            x_south = np.asarray(x, np.float64)
            y_west = np.asarray(y, np.float64)
        x_south = x_south - self.fn
        y_west = y_west - self.fe
        r = np.hypot(x_south, y_west)
        theta = np.arctan2(y_west, x_south)
        big_d = theta / n
        big_t = 2.0 * (np.arctan(
            (r0 / r) ** (1.0 / n)
            * math.tan(math.pi / 4.0 + math.radians(self.latp) / 2.0))
            - math.pi / 4.0)
        big_u = np.arcsin(np.clip(math.cos(alpha) * np.sin(big_t)
                                  - math.sin(alpha) * np.cos(big_t)
                                  * np.cos(big_d), -1.0, 1.0))
        big_v = np.arcsin(np.clip(np.cos(big_t) * np.sin(big_d)
                                  / np.cos(big_u), -1.0, 1.0))
        lam0 = math.radians(self.lon0)
        lam = lam0 - big_v / B
        # iterate phi from U
        phi = big_u.copy()
        for _ in range(12):
            s = e * np.sin(phi)
            phi = 2.0 * (np.arctan(
                t0 ** (-1.0 / B)
                * np.tan(big_u / 2.0 + math.pi / 4.0) ** (1.0 / B)
                * ((1.0 + s) / (1.0 - s)) ** (e / 2.0)) - math.pi / 4.0)
        return np.rad2deg(lam), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# Equidistant Cylindrical (EPSG 1028/1029/9842/9823) and Equidistant Conic
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EquidistantCylindrical:
    """Equidistant Cylindrical / Plate Carrée (EPSG 1028 ellipsoidal,
    1029/9823 spherical): E = nu1*cos(lat1)*dlon, N = M(lat)."""

    lat1: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "eqc"

    def _nu1c(self) -> float:
        e2 = self.f * (2.0 - self.f)
        p1 = math.radians(self.lat1)
        return (self.a * math.cos(p1)
                / math.sqrt(1.0 - e2 * math.sin(p1) ** 2))

    def forward(self, lon, lat):
        e2 = self.f * (2.0 - self.f)
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        return (self.fe + self._nu1c() * lam,
                self.fn + meridian_arc(phi, self.a, e2))

    def inverse(self, x, y):
        e2 = self.f * (2.0 - self.f)
        lam = (np.asarray(x, np.float64) - self.fe) / self._nu1c()
        phi = footpoint_latitude(np.asarray(y, np.float64) - self.fn,
                                 self.a, e2)
        return self.lon0 + np.rad2deg(lam), np.rad2deg(phi)


@dataclass(frozen=True)
class EquidistantConic:
    """Equidistant (simple) Conic, 2 standard parallels (Snyder ch. 16
    eqs 16-1..16-13, ellipsoidal)."""

    lat1: float
    lat2: float
    lat0: float = 0.0
    lon0: float = 0.0
    fe: float = 0.0
    fn: float = 0.0
    a: float = WGS84[0]
    f: float = WGS84[1]
    name = "eqdc"

    def _consts(self):
        e = _e_of(self.f)
        e2 = e * e
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        p0 = math.radians(self.lat0)
        m1, m2 = float(_m(np.float64(p1), e)), float(_m(np.float64(p2), e))
        big_m1 = float(meridian_arc(np.float64(p1), self.a, e2))
        big_m2 = float(meridian_arc(np.float64(p2), self.a, e2))
        big_m0 = float(meridian_arc(np.float64(p0), self.a, e2))
        if abs(p1 - p2) < 1e-12:
            n = math.sin(p1)
        else:
            n = self.a * (m1 - m2) / (big_m2 - big_m1)
        big_g = m1 / n + big_m1 / self.a
        rho0 = self.a * big_g - big_m0
        return e2, n, big_g, rho0

    def forward(self, lon, lat):
        e2, n, big_g, rho0 = self._consts()
        phi = np.deg2rad(np.asarray(lat, np.float64))
        lam = np.deg2rad(np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * big_g - meridian_arc(phi, self.a, e2)
        theta = n * lam
        return (self.fe + rho * np.sin(theta),
                self.fn + rho0 - rho * np.cos(theta))

    def inverse(self, x, y):
        e2, n, big_g, rho0 = self._consts()
        dx = np.asarray(x, np.float64) - self.fe
        dy = rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(n) * np.hypot(dx, dy)
        theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        big_m = self.a * big_g - rho
        phi = footpoint_latitude(big_m, self.a, e2)
        return self.lon0 + np.rad2deg(theta / n), np.rad2deg(phi)


# ---------------------------------------------------------------------------
# unit-scaled wrapper (feet / links / chain CRS: math in metres, chart
# coordinates in the CRS unit)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UnitScaled:
    """Wraps a metre-based projection so the chart coordinates are in
    the CRS's linear unit (EPSG UOM factor ``metres_per_unit``), as
    GDAL's importFromEPSG does for foot/link-based CRS."""

    crs: object
    metres_per_unit: float

    @property
    def name(self) -> str:
        return f"{self.crs.name}*{self.metres_per_unit:g}"

    @property
    def a(self):
        return getattr(self.crs, "a", WGS84[0])

    @property
    def f(self):
        return getattr(self.crs, "f", WGS84[1])

    def forward(self, lon, lat):
        x, y = self.crs.forward(lon, lat)
        return x / self.metres_per_unit, y / self.metres_per_unit

    def inverse(self, x, y):
        return self.crs.inverse(
            np.asarray(x, np.float64) * self.metres_per_unit,
            np.asarray(y, np.float64) * self.metres_per_unit)
