"""TerraSAR-X / TanDEM-X product reader — gdal/frmts/tsx/tsxdataset.cpp.

Reference semantics:
- Identify (:257): basename starts with ``TSX1_SAR``/``TDX1_SAR`` and
  the file begins ``<level1Product`` (directory form appends
  ``<dirname>.xml``).
- Open (:429-): ``productComponents`` lists components located by
  ``file.location.path`` + ``file.location.filename`` (:71-73);
  ``imageData`` components with a ``polLayer`` (HH/HV/VH/VV) become
  bands in document order — GeoTIFF band files open through the normal
  raster path; ``type=GEOREF`` names the geolocation-grid XML;
  ``type=MAPPING_GRID`` is kept as metadata.
- ``productInfo.imageDataInfo``: ``imageDataType`` COMPLEX -> CInt16
  else UInt16 (:504,589); ``imageRaster`` rows/cols/spacings/looks
  (:509-528); ``productVariantInfo.productVariant`` (SSC/MGD/EEC/GEC).
- sceneInfo metadata (:490-502) and GCPs: from the GEOREF XML grid
  (getGCPsFromGEOREF_XML — ``geolocationGrid.gridPoint`` col/row/lon/
  lat, count from ``numberOfGridPoints.total``), else (SSC only) the
  five ``sceneCenterCoord``/``sceneCornerCoord`` points with
  ``sceneAverageHeight`` as Z (:644-700).
- 4 bands -> MATRIX_REPRESENTATION=SCATTERING (:637-640).

Spark shape: band GeoTIFFs load through the distributed GeoTIFF scan
(block rows, one task per file); the XML headers are metadata-sized.
SSC COSAR payloads are not decoded (no fixture, proprietary burst
format) — a clear error marks the boundary.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.raster.model import BLOCK, RasterMeta


def _strip(tag: str) -> str:
    return tag.split("}", 1)[-1]


def _find(el, *names):
    cur = [el]
    for nm in names:
        cur = [c for e in cur for c in e if _strip(c.tag) == nm]
    return cur


def _text(el, *names, default=None):
    found = _find(el, *names)
    return found[0].text if found and found[0].text is not None else default


def identify_tsx(path: str) -> bool:
    if os.path.isdir(path):
        xml = os.path.join(path, os.path.basename(path) + ".xml")
        base = os.path.basename(xml)
        return (base.startswith("TSX1_SAR") or base.startswith("TDX1_SAR")) \
            and os.path.exists(xml)
    base = os.path.basename(path)
    if not (base.startswith("TSX1_SAR") or base.startswith("TDX1_SAR")):
        return False
    with open(path, "rb") as f:
        return f.read(14) == b"<level1Product"


def parse_tsx(path: str) -> dict:
    if os.path.isdir(path):
        path = os.path.join(path, os.path.basename(path) + ".xml")
    root = ET.parse(path).getroot()
    base = os.path.dirname(path)
    comps = _find(root, "productComponents")[0]
    pinfo = _find(root, "productInfo")[0]

    md = {}
    si = _find(pinfo, "sceneInfo")
    if si:
        md["SCENE_CENTRE_TIME"] = _text(si[0], "sceneCenterCoord", "azimuthTimeUTC")
        md["SCENE_ID"] = _text(si[0], "sceneID")
    mi = _find(pinfo, "missionInfo")
    if mi:
        for src, dst in (("orbitCycle", "ORBIT_CYCLE"),
                         ("absOrbit", "ABSOLUTE_ORBIT"),
                         ("orbitDirection", "ORBIT_DIRECTION")):
            v = _text(mi[0], src)
            if v:
                md[dst] = v
    ai = _find(pinfo, "acquisitionInfo")
    if ai:
        v = _text(ai[0], "imagingMode")
        if v:
            md["IMAGING_MODE"] = v
    variant = _text(pinfo, "productVariantInfo", "productVariant",
                    default="unknown")
    md["PRODUCT_VARIANT"] = variant
    data_type = (_text(pinfo, "imageDataInfo", "imageDataType",
                       default="unknown") or "unknown").strip()
    idi = _find(pinfo, "imageDataInfo", "imageRaster")
    rows = int(_text(idi[0], "numberOfRows") or 0) if idi else 0
    cols = int(_text(idi[0], "numberOfColumns") or 0) if idi else 0
    if idi:
        for src, dst in (("rowSpacing", "ROW_SPACING"),
                         ("columnSpacing", "COL_SPACING"),
                         ("azimuthLooks", "AZIMUTH_LOOKS"),
                         ("rangeLooks", "RANGE_LOOKS")):
            v = _text(idi[0], src)
            if v:
                md[dst] = v

    bands, georef, mapping = [], None, None
    for comp in comps:
        loc = _find(comp, "file", "location")
        if not loc:
            continue
        p = (_text(loc[0], "path", default="") or "").strip()
        fn = (_text(loc[0], "filename", default="") or "").strip()
        full = os.path.join(base, p, fn) if p else os.path.join(base, fn)
        ctype = (_text(comp, "type") or " ").strip()
        pol = (_text(comp, "polLayer") or " ").strip()
        if ctype == "MAPPING_GRID":
            mapping = full
        elif ctype == "GEOREF":
            georef = full
        elif _strip(comp.tag).startswith("imageData") and pol:
            bands.append((pol.upper(), full))
    if mapping:
        md["MAPPING_GRID"] = mapping
    if len(bands) == 4:
        md["MATRIX_REPRESENTATION"] = "SCATTERING"

    # GCPs: GEOREF grid first; SSC corner/centre fallback
    gcps, gcp_source = [], None
    if georef and os.path.exists(georef):
        g = ET.parse(georef).getroot()
        grid = _find(g, "geolocationGrid")
        if grid:
            for gp in _find(grid[0], "gridPoint"):
                col = _text(gp, "col")
                row = _text(gp, "row")
                lon = _text(gp, "lon")
                lat = _text(gp, "lat")
                if None in (col, row, lon, lat):
                    continue
                gcps.append((float(col), float(row),
                             float(lon), float(lat), 0.0))
            if gcps:
                gcp_source = "GEOREF"
    if not gcps and variant.startswith("SSC") and si:
        avg_h = float(_text(si[0], "sceneAverageHeight") or 0.0)
        for nd in si[0]:
            if _strip(nd.tag) not in ("sceneCenterCoord",
                                      "sceneCornerCoord"):
                continue
            gcps.append((float(_text(nd, "refColumn") or 0.0),
                         float(_text(nd, "refRow") or 0.0),
                         float(_text(nd, "lon") or 0.0),
                         float(_text(nd, "lat") or 0.0), avg_h))
        if gcps:
            gcp_source = "SCENE_COORDS"
    return {"path": path, "rows": rows, "cols": cols,
            "data_type": data_type, "variant": variant, "bands": bands,
            "georef": georef, "metadata": md, "gcps": gcps,
            "gcp_source": gcp_source,
            "pixel_type": ("cint16" if data_type.upper().startswith("COMPLEX")
                           else "uint16")}


def read_tsx(spark: SparkSession, path: str, block: int = BLOCK
             ) -> tuple[DataFrame, RasterMeta, dict]:
    """Bands in product-component order (one per polarization)."""
    from pyspark.sql import functions as F

    from gdal_spark.raster import formats as RF

    info = parse_tsx(path)
    if not info["bands"]:
        raise ValueError(f"{path}: TSX product has no imageData components")
    first = info["bands"][0][1]
    if first.lower().endswith(".cos"):
        raise NotImplementedError(
            "TSX SSC products store bands as COSAR bursts; COSAR decode "
            "is not implemented (no reference fixture)")
    bm = RF.geotiff_meta(first, block=block)
    meta = RasterMeta("tsx", info["cols"] or bm.width,
                      info["rows"] or bm.height, gt=bm.gt,
                      dtype=bm.dtype, block=block)
    tiles = None
    for b, (_pol, bf) in enumerate(info["bands"]):
        t = (RF.read_geotiff(spark, bf, block=block)
             .withColumn("band", F.lit(b).cast("int"))
             .withColumn("raster_id", F.lit("tsx")))
        tiles = t if tiles is None else tiles.unionByName(t)
    return tiles, meta, info
