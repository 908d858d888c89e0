#!/usr/bin/env python3
"""Extract the EPSG registry tables the engine's ``importFromEPSG``
analog needs (projected + geographic CRS definitions, ellipsoids,
prime meridians, units) into compact gzipped CSVs under
``gdal_spark/data/epsg/``.

Source: the EPSG-distributed CSV tables bundled with the reference
(/root/reference/gdal/data/*.csv — the same files GDAL's own
importFromEPSG reads, see gdal/ogr/ogr_fromepsg.cpp). The content is
public EPSG Geodetic Parameter Dataset *data* (parameter values of
published coordinate reference systems), not code.

Run from the repo root:  python scripts/gen_epsg_registry.py
"""

from __future__ import annotations

import csv
import gzip
import os

SRC = os.environ.get("GDAL_DATA_SRC", "/root/reference/gdal/data")
DST = os.path.join(os.path.dirname(__file__), "..", "gdal_spark", "data",
                   "epsg")


def copy_cols(src_name, dst_name, cols, key=None):
    os.makedirs(DST, exist_ok=True)
    with open(os.path.join(SRC, src_name), newline="",
              encoding="utf-8", errors="replace") as f:
        rows = list(csv.DictReader(f))
    out = os.path.join(DST, dst_name)
    with gzip.open(out, "wt", newline="", encoding="utf-8") as g:
        w = csv.writer(g)
        w.writerow(cols)
        n = 0
        for r in rows:
            if key and not r.get(key, "").strip():
                continue
            w.writerow([r.get(c, "") for c in cols])
            n += 1
    print(f"{dst_name}: {n} rows")


def main():
    pcs_cols = (["COORD_REF_SYS_CODE", "COORD_REF_SYS_NAME", "UOM_CODE",
                 "SOURCE_GEOGCRS_CODE", "COORD_OP_METHOD_CODE",
                 "DEPRECATED"]
                + [f"PARAMETER_{k}_{i}" for i in range(1, 8)
                   for k in ("CODE", "VALUE", "UOM")])
    copy_cols("pcs.csv", "pcs.csv.gz", pcs_cols)
    gcs_cols = ["COORD_REF_SYS_CODE", "COORD_REF_SYS_NAME", "DATUM_CODE",
                "DATUM_NAME", "ELLIPSOID_CODE", "PRIME_MERIDIAN_CODE",
                "DEPRECATED", "COORD_OP_METHOD_CODE",
                "DX", "DY", "DZ", "RX", "RY", "RZ", "DS"]
    copy_cols("gcs.csv", "gcs.csv.gz", gcs_cols)
    copy_cols("ellipsoid.csv", "ellipsoid.csv.gz",
              ["ellipsoid_code", "ellipsoid_name", "semi_major_axis",
               "uom_code", "inv_flattening", "semi_minor_axis"])
    copy_cols("prime_meridian.csv", "prime_meridian.csv.gz",
              ["prime_meridian_code", "prime_meridian_name",
               "greenwich_longitude", "uom_code"])
    copy_cols("unit_of_measure.csv", "unit_of_measure.csv.gz",
              ["uom_code", "unit_of_meas_name", "unit_of_meas_type",
               "target_uom_code", "factor_b", "factor_c"])


if __name__ == "__main__":
    main()
