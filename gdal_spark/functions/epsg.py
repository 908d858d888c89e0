"""Data-driven ``importFromEPSG``: build projection objects from the
EPSG Geodetic Parameter Dataset tables under ``gdal_spark/data/epsg/``
(extracted by ``scripts/gen_epsg_registry.py``).

Reference analog: GDAL's importFromEPSG
(gdal/ogr/ogrspatialreference.cpp + gdal/ogr/ogr_fromepsg.cpp) reads
the same EPSG-distributed CSV tables (gdal/data/pcs.csv, gcs.csv,
ellipsoid.csv, prime_meridian.csv, unit_of_measure.csv) and assembles a
CRS definition; here the assembly targets the engine's closed-form
vectorized projection classes instead of a WKT tree.

Conventions:

- All geographic coordinates in the engine are **Greenwich** degrees;
  non-Greenwich prime meridians (Ferro, Paris, ...) are folded into the
  projection's longitude parameters at build time (the 2065 S-JTSK
  Ferro case), exactly the effect of GDAL's PRIMEM node.
- Chart coordinates are in the CRS's linear unit (feet, links, ...) via
  :class:`~gdal_spark.functions.projections.UnitScaled`, matching
  GDAL's UNIT node semantics.
- gcs.csv's bundled datum shift (methods 9603 geocentric translation /
  9606 position vector / 9607 coordinate frame — 9607 rotations are
  negated into 9606 form, as ogr_fromepsg.cpp does) wraps the CRS in
  ``DatumShifted`` so transforms route through WGS84.

Coverage: every non-deprecated projected CRS whose method is one of the
18 implemented projection families (~98% of the registry's 3,982
non-deprecated projected codes) plus all 475 geographic codes.
"""

from __future__ import annotations

import csv
import functools
import gzip
import math
import os

_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data",
                     "epsg")


def _read(name):
    with gzip.open(os.path.join(_DATA, name), "rt", newline="",
                   encoding="utf-8") as f:
        return list(csv.DictReader(f))


@functools.lru_cache(maxsize=1)
def _tables():
    uom = {r["uom_code"]: r for r in _read("unit_of_measure.csv.gz")}
    ell = {r["ellipsoid_code"]: r for r in _read("ellipsoid.csv.gz")}
    pm = {r["prime_meridian_code"]: r
          for r in _read("prime_meridian.csv.gz")}
    gcs = {r["COORD_REF_SYS_CODE"]: r for r in _read("gcs.csv.gz")}
    pcs = {r["COORD_REF_SYS_CODE"]: r for r in _read("pcs.csv.gz")}
    return uom, ell, pm, gcs, pcs


def parse_sexagesimal_dms(text: str) -> float:
    """EPSG UOM 9110 sexagesimal DMS: DDD.MMSSsss as a *string*
    (46.5707966 = 46°57'07.966"). Parsed textually — float math would
    corrupt the packed digits."""
    text = text.strip()
    neg = text.startswith("-")
    text = text.lstrip("+-")
    if "." in text:
        d, frac = text.split(".", 1)
    else:
        d, frac = text, ""
    frac = (frac + "0000")[: max(4, len(frac))]
    mm = int(frac[:2] or 0)
    ss = float(frac[2:4] or 0) + (float("0." + frac[4:]) if frac[4:] else 0.0)
    val = (int(d) if d else 0) + mm / 60.0 + ss / 3600.0
    return -val if neg else val


def angle_deg(value: str, uom_code: str) -> float:
    """EPSG angular value → degrees."""
    if not value:
        return 0.0
    uom, *_ = _tables()
    if uom_code == "9110":
        return parse_sexagesimal_dms(value)
    u = uom.get(uom_code)
    if u is None or u["unit_of_meas_type"] != "angle":
        raise ValueError(f"unknown angular UOM {uom_code}")
    rad = float(value) * float(u["factor_b"]) / float(u["factor_c"])
    return math.degrees(rad)


def length_factor(uom_code: str) -> float:
    """Metres per one unit of the given EPSG length UOM."""
    uom, *_ = _tables()
    u = uom.get(uom_code)
    if u is None or u["unit_of_meas_type"] != "length":
        raise ValueError(f"unknown length UOM {uom_code}")
    return float(u["factor_b"]) / float(u["factor_c"])


def scale_value(value: str, uom_code: str) -> float:
    if not value:
        return 1.0
    uom, *_ = _tables()
    u = uom.get(uom_code)
    if u is None:
        raise ValueError(f"unknown UOM {uom_code}")
    return float(value) * float(u["factor_b"]) / float(u["factor_c"])


def _ellipsoid(code: str):
    """→ (a_metres, flattening)."""
    uom, ell, *_ = _tables()
    e = ell[code]
    a = float(e["semi_major_axis"]) * length_factor(e["uom_code"])
    if e["inv_flattening"]:
        f = 1.0 / float(e["inv_flattening"])
    else:
        b = float(e["semi_minor_axis"]) * length_factor(e["uom_code"])
        f = 1.0 - b / a
    return a, f


def _pm_degrees(code: str) -> float:
    uom, ell, pm, *_ = _tables()
    p = pm[code]
    return angle_deg(p["greenwich_longitude"], p["uom_code"])


def _gcs_info(code: str):
    """→ (a, f, pm_deg, towgs84-or-None) for a geographic CRS code."""
    uom, ell, pm, gcs, pcs = _tables()
    g = gcs.get(str(code))
    if g is None:
        raise ValueError(f"EPSG geographic CRS {code} not in registry")
    a, f = _ellipsoid(g["ELLIPSOID_CODE"])
    pm_deg = _pm_degrees(g["PRIME_MERIDIAN_CODE"])
    tow = None
    if g["DX"]:
        dx, dy, dz = (float(g[k]) for k in ("DX", "DY", "DZ"))
        rx = float(g["RX"]) if g["RX"] else 0.0
        ry = float(g["RY"]) if g["RY"] else 0.0
        rz = float(g["RZ"]) if g["RZ"] else 0.0
        ds = float(g["DS"]) if g["DS"] else 0.0
        if g["COORD_OP_METHOD_CODE"] == "9607":
            # coordinate frame rotation → position vector (negate
            # rotations), the ogr_fromepsg.cpp OGR_FETCH path
            rx, ry, rz = -rx, -ry, -rz
        if any((dx, dy, dz, rx, ry, rz, ds)):
            tow = (dx, dy, dz, rx, ry, rz, ds)
    return a, f, pm_deg, tow


def _params(row):
    """pcs row → {param_code: (raw_value, uom_code)}."""
    out = {}
    for i in range(1, 8):
        c = row.get(f"PARAMETER_CODE_{i}", "")
        if c:
            out[c] = (row[f"PARAMETER_VALUE_{i}"],
                      row[f"PARAMETER_UOM_{i}"])
    return out


class _P:
    """Typed accessors over one pcs row's parameter dict."""

    def __init__(self, params, pm_deg, unit_m):
        self.p = params
        self.pm = pm_deg
        self.unit_m = unit_m  # metres per CRS unit (for FE/FN defaults)

    def ang(self, code, default=0.0):
        if code not in self.p:
            return default
        v, u = self.p[code]
        return angle_deg(v, u)

    def lon(self, code, default=0.0):
        """Longitude parameter, folded to Greenwich."""
        if code not in self.p:
            return default
        return self.ang(code) + self.pm

    def length_m(self, code, default=0.0):
        if code not in self.p:
            return default
        v, u = self.p[code]
        return float(v) * length_factor(u)

    def scale(self, code, default=1.0):
        if code not in self.p:
            return default
        v, u = self.p[code]
        return scale_value(v, u)


def build_projected(code: int):
    """Build a projection object for one EPSG projected-CRS code."""
    from gdal_spark.functions import projections as PX
    from gdal_spark.functions import srs as S

    uom, ell, pm, gcs, pcs = _tables()
    row = pcs.get(str(int(code)))
    if row is None:
        raise ValueError(f"EPSG:{code} not a registry projected CRS")
    a, f, pm_deg, tow = _gcs_info(row["SOURCE_GEOGCRS_CODE"])
    unit_m = length_factor(row["UOM_CODE"])
    method = row["COORD_OP_METHOD_CODE"]
    P = _P(_params(row), pm_deg, unit_m)

    if method == "9807":  # Transverse Mercator
        crs = S.TransverseMercator(
            lon0=P.lon("8802"), k0=P.scale("8805"),
            fe=P.length_m("8806"), fn=P.length_m("8807"),
            lat0=P.ang("8801"), a=a, f=f)
    elif method == "9802":  # LCC 2SP
        crs = S.LambertConformalConic(
            lat1=P.ang("8823"), lat2=P.ang("8824"), lat0=P.ang("8821"),
            lon0=P.lon("8822"), fe=P.length_m("8826"),
            fn=P.length_m("8827"), a=a, f=f)
    elif method == "9801":  # LCC 1SP
        crs = PX.LambertConformalConic1SP(
            lat0=P.ang("8801", P.ang("8821")),
            lon0=P.lon("8802", P.lon("8822", 0.0)),
            k0=P.scale("8805"),
            fe=P.length_m("8806", P.length_m("8826")),
            fn=P.length_m("8807", P.length_m("8827")),
            a=a, f=f)
    elif method == "9803":  # LCC 2SP Belgium
        crs = PX.LambertConformalConic2SPBelgium(
            lat1=P.ang("8823"), lat2=P.ang("8824"), lat0=P.ang("8821"),
            lon0=P.lon("8822"), fe=P.length_m("8826"),
            fn=P.length_m("8827"), a=a, f=f)
    elif method == "9826":  # LCC 1SP West Orientated
        crs = PX.LambertConformalConicWest(
            lat0=P.ang("8801"), lon0=P.lon("8802"), k0=P.scale("8805"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method == "9822":  # Albers
        crs = S.AlbersEqualArea(
            lat1=P.ang("8823"), lat2=P.ang("8824"), lat0=P.ang("8821"),
            lon0=P.lon("8822"), fe=P.length_m("8826"),
            fn=P.length_m("8827"), a=a, f=f)
    elif method == "9806":  # Cassini-Soldner
        crs = PX.CassiniSoldner(
            lat0=P.ang("8801"), lon0=P.lon("8802"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method == "9808":  # TM South Orientated
        crs = PX.TransverseMercatorSouth(
            lon0=P.lon("8802"), k0=P.scale("8805"),
            fe=P.length_m("8806"), fn=P.length_m("8807"),
            lat0=P.ang("8801"), a=a, f=f)
    elif method == "9809":  # Oblique (double) Stereographic
        crs = PX.ObliqueStereographic(
            lat0=P.ang("8801"), lon0=P.lon("8802"), k0=P.scale("8805"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method == "9810":  # Polar Stereographic variant A
        crs = S.PolarStereographic(
            lat_ts=P.ang("8801"), lon0=P.lon("8802"), k0=P.scale("8805"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method == "9829":  # Polar Stereographic variant B
        crs = S.PolarStereographic(
            lat_ts=P.ang("8832"), lon0=P.lon("8833"), k0=1.0,
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method in ("9812", "9815"):  # Hotine Oblique Mercator A/B
        az = P.ang("8813")
        crs = PX.HotineObliqueMercator(
            latc=P.ang("8811"), lonc=P.lon("8812"), alphac=az,
            gammac=P.ang("8814", az), k0=P.scale("8815"),
            fe=P.length_m("8806", P.length_m("8816")),
            fn=P.length_m("8807", P.length_m("8817")),
            a=a, f=f, variant_b=(method == "9815"))
    elif method == "9814":  # Swiss Oblique Cylindrical
        crs = PX.SwissObliqueMercator(
            lat0=P.ang("8811"), lon0=P.lon("8812"), k0=P.scale("8815"),
            fe=P.length_m("8806", P.length_m("8816")),
            fn=P.length_m("8807", P.length_m("8817")), a=a, f=f)
    elif method == "9818":  # American Polyconic
        crs = PX.Polyconic(
            lat0=P.ang("8801"), lon0=P.lon("8802"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method in ("9819", "1041"):  # Krovak (+East-North)
        crs = PX.Krovak(
            latc=P.ang("8811"), lon0=P.lon("8833"),
            alphac=P.ang("1036", P.ang("8813")),
            latp=P.ang("8818"), kp=P.scale("8819"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f,
            east_north=(method == "1041"))
    elif method == "9804":  # Mercator variant A
        crs = S.Mercator(
            lon0=P.lon("8802"), k0=P.scale("8805"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method == "9805":  # Mercator variant B
        crs = S.Mercator(
            lat_ts=P.ang("8823"), lon0=P.lon("8802"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method == "1024":  # Popular Visualisation Pseudo-Mercator
        crs = S.WebMercator()
    elif method == "9820":  # Lambert Azimuthal Equal Area
        crs = S.LambertAzimuthalEqualArea(
            lat0=P.ang("8801"), lon0=P.lon("8802"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    elif method in ("1028", "1029", "9842", "9823"):  # Equidistant Cyl
        crs = PX.EquidistantCylindrical(
            lat1=P.ang("8823", P.ang("8801")), lon0=P.lon("8802"),
            fe=P.length_m("8806"), fn=P.length_m("8807"), a=a, f=f)
    else:
        raise ValueError(
            f"EPSG:{code} uses projection method {method}, outside the "
            "implemented family")

    if unit_m != 1.0:
        crs = PX.UnitScaled(crs, unit_m)
    if tow is not None:
        crs = S.DatumShifted(crs, tow)
    return crs


def build_geographic(code: int):
    from gdal_spark.functions import srs as S
    a, f, pm_deg, tow = _gcs_info(str(int(code)))
    geo = S.Geographic(a=a, f=f)
    return S.DatumShifted(geo, tow) if tow is not None else geo


def from_epsg(code: int):
    """Registry-driven CRS lookup: projected first, then geographic."""
    uom, ell, pm, gcs, pcs = _tables()
    c = str(int(code))
    if c in pcs:
        return build_projected(code)
    if c in gcs:
        return build_geographic(code)
    raise ValueError(f"EPSG:{code} not in the bundled registry tables")


def supported_projected_codes():
    """All projected codes buildable by :func:`build_projected`
    (non-deprecated rows with an implemented method)."""
    _, _, _, _, pcs = _tables()
    methods = {"9807", "9802", "9801", "9803", "9826", "9822", "9806",
               "9808", "9809", "9810", "9829", "9812", "9815", "9814",
               "9818", "9819", "1041", "9804", "9805", "1024", "9820",
               "1028", "1029", "9842", "9823"}
    return sorted(int(c) for c, r in pcs.items()
                  if r["DEPRECATED"] == "0"
                  and r["COORD_OP_METHOD_CODE"] in methods)
