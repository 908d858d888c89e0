"""RADARSAT-2 product reader — gdal/frmts/rs2/rs2dataset.cpp.

Reference semantics:
- A product is a ``product.xml`` whose ``imageAttributes`` carry the
  raster geometry (``rasterAttributes``: dataType Mag/Complex,
  bitsPerSample, numberOfSamplesPerLine/numberOfLines) and one
  ``fullResolutionImageData`` element per polarization, each naming a
  GeoTIFF holding that band (rs2dataset.cpp:808-860). Type mapping:
  Complex+16 -> CInt16, Mag+8 -> Byte, Mag+16 -> UInt16 (:820-832).
- Calibrated subdatasets ``RADARSAT_2_CALIB:{BETA0,SIGMA0,GAMMA,
  UNCALIB}:product.xml`` (:700-760) pick the ``lookupTable`` whose
  incidenceAngleCorrection matches (Beta Nought / Sigma Nought /
  Gamma), read its ``<offset>`` and per-pixel ``<gains>`` list
  (RS2CalibRasterBand::ReadLUT :319-340), and emit Float32
  ``(DN² + offset) / gain[x]`` for detected products, or CFloat32
  ``(re/gain[x], im/gain[x])`` for complex ones (IReadBlock :419-516).
- Geolocation grid tie points become GCPs; source/processing attributes
  become metadata (:862-1000).

Spark shape: each band's GeoTIFF loads through the distributed GeoTIFF
scan (one task per file, block rows); calibration is a per-tile Arrow
map with the (tiny) gains table broadcast, indexed by absolute pixel x
= bx*block + j. Nothing pixel-sized touches the driver.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.raster.model import BLOCK, TILE_SCHEMA, RasterMeta

CALIBRATIONS = ("UNCALIB", "BETA0", "SIGMA0", "GAMMA")
_LUT_NAMES = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
              "GAMMA": "Gamma"}


def _strip(tag: str) -> str:
    return tag.split("}", 1)[-1]


def _find(el, *names):
    cur = [el]
    for nm in names:
        nxt = []
        for e in cur:
            nxt.extend(c for c in e if _strip(c.tag) == nm)
        cur = nxt
    return cur


def _text(el, *names, default=None):
    found = _find(el, *names)
    return found[0].text if found else default


def parse_rs2(path: str) -> dict:
    """Parse product.xml into a plain info dict."""
    if path.upper().startswith("RADARSAT_2_CALIB:"):
        _, calib, path = path.split(":", 2)
        calib = calib.upper()
    else:
        calib = None
    if os.path.isdir(path):
        path = os.path.join(path, "product.xml")
    root = ET.parse(path).getroot()
    ia = _find(root, "imageAttributes")[0]
    ra = _find(ia, "rasterAttributes")[0]
    dtype = (_text(ra, "dataType") or "Mag").strip()
    bits = int(_text(ra, "bitsPerSample") or 8)
    width = int(_text(ra, "numberOfSamplesPerLine"))
    height = int(_text(ra, "numberOfLines"))
    if dtype.lower() == "complex" and bits == 16:
        pixel_type = "cint16"
    elif bits == 16:
        pixel_type = "uint16"
    elif bits == 8:
        pixel_type = "uint8"
    else:
        raise ValueError(
            f"{path}: unsupported RS2 dataType/bits {dtype}/{bits}")
    base = os.path.dirname(path)
    bands = [(e.get("pole", "").upper(), os.path.join(base, e.text.strip()))
             for e in _find(ia, "fullResolutionImageData")]
    luts = {}
    for e in _find(ia, "lookupTable"):
        name = e.get("incidenceAngleCorrection", "")
        for key, nm in _LUT_NAMES.items():
            if name == nm:
                luts[key] = os.path.join(base, e.text.strip())
    gcps = []
    for tp in _find(ia, "geographicInformation", "geolocationGrid",
                    "imageTiePoint"):
        line = float(_text(tp, "imageCoordinate", "line") or 0)
        pixel = float(_text(tp, "imageCoordinate", "pixel") or 0)
        lat = float(_text(tp, "geodeticCoordinate", "latitude") or 0)
        lon = float(_text(tp, "geodeticCoordinate", "longitude") or 0)
        gcps.append((pixel, line, lon, lat))
    sa = _find(root, "sourceAttributes")
    md = {}
    if sa:
        for k in ("satellite", "sensor", "beamModeMnemonic",
                  "rawDataStartTime"):
            v = _text(sa[0], k)
            if v:
                md[k.upper()] = v
    pt = _text(root, "imageGenerationParameters",
               "generalProcessingInformation", "productType")
    if pt:
        md["PRODUCT_TYPE"] = pt
    return {"path": path, "calib": calib, "width": width, "height": height,
            "pixel_type": pixel_type, "bands": bands, "luts": luts,
            "gcps": gcps, "metadata": md}


def read_lut(path: str) -> tuple[float, np.ndarray]:
    root = ET.parse(path).getroot()
    offset = float(_text(root, "offset") or 0.0)
    gains = np.array([float(v) for v in
                      (_text(root, "gains") or "").split()], dtype="f4")
    return offset, gains


def read_rs2(spark: SparkSession, path: str, calib: str | None = None,
             block: int = BLOCK) -> tuple[DataFrame, RasterMeta, dict]:
    """Read an RS2 product (or a RADARSAT_2_CALIB: subdataset path).
    Bands are indexed in fullResolutionImageData order (one per pole)."""
    from gdal_spark.raster import formats as RF

    info = parse_rs2(path)
    calib = (calib or info["calib"] or "UNCALIB").upper()
    if calib not in CALIBRATIONS:
        raise ValueError(f"unknown RS2 calibration {calib!r}")
    if calib != "UNCALIB" and calib not in info["luts"]:
        raise ValueError(f"product has no {calib} lookup table")
    out_dtype = info["pixel_type"]
    if calib != "UNCALIB":
        out_dtype = "complex64" if info["pixel_type"] == "cint16" \
            else "float32"
    meta = RasterMeta("rs2", info["width"], info["height"],
                      dtype=out_dtype, block=block)

    tiles = None
    for b, (_pole, bf) in enumerate(info["bands"]):
        t = RF.read_geotiff(spark, bf, block=block)
        t = t.withColumn("band", F_lit_int(b)).withColumn(
            "raster_id", F_lit_str("rs2"))
        tiles = t if tiles is None else tiles.unionByName(t)

    if calib == "UNCALIB":
        return tiles, meta, info

    offset, gains = read_lut(info["luts"][calib])
    src_dtype = info["pixel_type"]
    sc = spark.sparkContext
    bc = sc.broadcast((offset, gains))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        off, g = bc.value
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                x0 = r.bx * block
                gg = g[x0:x0 + r.w].astype("f4")
                if len(gg) < r.w:       # short LUT: pad with 1s
                    gg = np.concatenate(
                        [gg, np.ones(r.w - len(gg), "f4")])
                if src_dtype == "cint16":
                    a = np.frombuffer(r.data, "<i2").astype("f4") \
                        .reshape(r.h, r.w * 2)
                    c = (a[:, 0::2] / gg + 1j * (a[:, 1::2] / gg)) \
                        .astype("c8")
                    buf = c.tobytes()
                else:
                    a = np.frombuffer(
                        r.data, src_dtype).reshape(r.h, r.w)
                    dn = a.astype("f4")
                    buf = ((dn * dn + off) / gg).astype("f4").tobytes()
                out.append((r.raster_id, r.band, r.bx, r.by,
                            r.w, r.h, buf))
            yield pd.DataFrame(out, columns=[f.name for f in TILE_SCHEMA])

    return tiles.mapInPandas(run, schema=TILE_SCHEMA), meta, info


def F_lit_int(v: int):
    from pyspark.sql import functions as F
    return F.lit(int(v)).cast("int")


def F_lit_str(v: str):
    from pyspark.sql import functions as F
    return F.lit(v)
