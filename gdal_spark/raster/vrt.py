"""VRT: GDAL's XML-declared lazy raster composition, mapped onto the
engine's native lazy form — the DataFrame plan.

The reference's VRT driver (gdal/frmts/vrt/vrtdataset.h:362-848)
describes a dataset as unevaluated sources over other datasets — the
closest thing GDAL has to a logical plan (SURVEY.md §1.1). Here a .vrt
parses directly INTO a logical plan: each SimpleSource/ComplexSource
becomes a block-pruned warp of the source GeoTIFF onto the VRT grid
(clipped to its DstRect via the cutline mask), sources compose with the
last-on-top nodata-aware mosaic overlay, and nothing materializes until
an action — exactly the VRT contract, with Catalyst as the evaluator.

Supported surface (the gdalbuildvrt output shape): VRTDataset size +
GeoTransform, VRTRasterBand dataType/NoDataValue, SimpleSource and
ComplexSource (ScaleRatio/ScaleOffset, vrtsources.cpp ComplexSource
scaling) with SourceFilename (relativeToVRT), SourceBand, SrcRect and
DstRect windows. Source files are the engine's raster formats (.tif,
.asc). Nested VRT sources, KernelFilteredSource and pixel functions are
out of scope here — pixel functions exist as ``raster.algebra``
DataFrame transforms, which is the idiomatic Spark spelling.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, replace

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.raster import formats as RF
from gdal_spark.raster import resample as RS
from gdal_spark.raster.algebra import map_pixels
from gdal_spark.raster.model import RasterMeta
from gdal_spark.raster.mosaic import mosaic

_DT_MAP = {"Byte": "uint8", "UInt16": "uint16", "Int16": "int16",
           "UInt32": "uint32", "Int32": "int32",
           "Float32": "float32", "Float64": "float64"}
_DT_BACK = {v: k for k, v in _DT_MAP.items()}


@dataclass(frozen=True)
class _RectAffine:
    """Picklable VRT-pixel → source-pixel map of one Simple/ComplexSource:
    src = src_off + (dst - dst_off) * src_size/dst_size (the
    vrtsources.cpp window mapping)."""
    sx_off: float
    sy_off: float
    dx_off: float
    dy_off: float
    rx: float
    ry: float

    def __call__(self, px, py):
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        return (self.sx_off + (px - self.dx_off) * self.rx,
                self.sy_off + (py - self.dy_off) * self.ry)


def _rect(el, default) -> tuple[float, float, float, float]:
    if el is None:
        return default
    return (float(el.get("xOff", 0)), float(el.get("yOff", 0)),
            float(el.get("xSize")), float(el.get("ySize")))


_RESAMPLE_ALG = {
    "NearestNeighbour": "nearest", "Bilinear": "bilinear", "Cubic": "cubic",
    "CubicSpline": "cubicspline", "Lanczos": "lanczos", "Average": "average",
    "Mode": "mode", "Maximum": "max", "Minimum": "min", "Median": "med",
    "Quartile1": "q1", "Quartile3": "q3",
}


def _read_warped_vrt(spark: SparkSession, root, path: str, block: int
                     ) -> tuple[DataFrame, RasterMeta]:
    """VRTWarpedDataset (gdal/frmts/vrt/vrtwarped.cpp): the serialized
    GDALWarpOptions become one lazy warp node — ResampleAlg maps to the
    engine's kernel and the GenImgProjTransformer's Src/Dst geotransforms
    drive the default affine ``src_from_dst``."""
    W = int(root.get("rasterXSize"))
    H = int(root.get("rasterYSize"))
    gt = tuple(float(v) for v in root.find("GeoTransform").text.split(","))
    stem = os.path.splitext(os.path.basename(path))[0]
    base = os.path.dirname(os.path.abspath(path))
    band_el = root.find("VRTRasterBand")
    dtype = _DT_MAP.get(band_el.get("dataType", "Byte"), "uint8")
    opts = root.find("GDALWarpOptions")
    method = _RESAMPLE_ALG[opts.findtext("ResampleAlg", "NearestNeighbour")]
    fn_el = opts.find("SourceDataset")
    fn = fn_el.text.strip()
    if fn_el.get("relativeToVRT", "0") == "1":
        fn = os.path.normpath(os.path.join(base, fn))
    src_meta = RF.geotiff_meta(fn, block=block)
    src_tiles = RF.read_geotiff(spark, fn, block=block)
    gip = opts.find(".//GenImgProjTransformer")
    if gip is not None and gip.find("SrcGeoTransform") is not None:
        src_gt = tuple(float(v) for v in
                       gip.findtext("SrcGeoTransform").split(","))
        src_meta = replace(src_meta, gt=src_gt)
    dst_meta = RasterMeta(stem, W, H, gt=gt, dtype=dtype, block=block)
    nd = opts.findtext(".//DstNoDataReal")
    if nd is not None:
        dst_meta = replace(dst_meta, nodata=float(nd))
    src_cutline = None
    cut_wkt = opts.findtext("Cutline")
    if cut_wkt is not None:
        # GDALWarpOptions cutlines are serialized in *source pixel/line*
        # coordinates (gdal/alg/gdalwarper.cpp GDALSerializeWarpOptions)
        from gdal_spark.functions.geometry import wkb_from_wkt
        src_cutline = wkb_from_wkt(cut_wkt.strip())
    blend = float(opts.findtext("CutlineBlendDist", "0"))
    return RS.warp(src_tiles, src_meta, dst_meta, method=method,
                   src_cutline=src_cutline, cutline_blend=blend), dst_meta


def _lut_apply(a: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """VRTComplexSource::LookupValue (vrtsources.cpp:1731): lower_bound
    into the breakpoint inputs, clamp outside the table, exact hits take
    the breakpoint output (this is what makes duplicated inputs encode a
    step), otherwise linear interpolation.  Vectorized over the block;
    the float result rounds into the band type as GDALCopyWords does."""
    v = a.astype(np.float64)
    i = np.searchsorted(xs, v.ravel(), side="left")
    out = np.empty(v.size, dtype=np.float64)
    lo = i == 0
    hi = i == len(xs)
    out[lo] = ys[0]
    out[hi] = ys[-1]
    mid = ~(lo | hi)
    im = i[mid]
    vm = v.ravel()[mid]
    interp = ys[im - 1] + (vm - xs[im - 1]) * (
        (ys[im] - ys[im - 1]) / (xs[im] - xs[im - 1]))
    out[mid] = np.where(xs[im] == vm, ys[im], interp)
    return np.floor(out.reshape(v.shape) + 0.5)


def _kernel_filter(tiles: DataFrame, meta: RasterMeta, out_id: str,
                   coefs: np.ndarray, normalized: bool,
                   nodata: float | None) -> DataFrame:
    """VRTKernelFilteredSource::FilterData (vrtfilters.cpp:453) as a
    halo-exchange stencil: raster borders replicate the edge values out
    (vrtfilters.cpp:310 'we replicate the edge valid values out'),
    nodata centers pass through, nodata neighbors drop out of the sum
    (and of the kernel sum when normalized)."""
    from gdal_spark.raster.dem import stencil_apply
    k = coefs.shape[0]
    halo = k // 2

    def fn(pad: np.ndarray, gt) -> np.ndarray:
        pad = pad.copy()
        # replicate into never-filled (raster border) halo cells:
        # left/right per row first, then whole top/bottom rows — the
        # reference's fill order, which seeds the corners correctly
        for j in range(halo - 1, -1, -1):
            pad[:, j] = np.where(np.isnan(pad[:, j]), pad[:, j + 1],
                                 pad[:, j])
            pad[:, -1 - j] = np.where(np.isnan(pad[:, -1 - j]),
                                      pad[:, -2 - j], pad[:, -1 - j])
        for j in range(halo - 1, -1, -1):
            pad[j, :] = np.where(np.isnan(pad[j, :]), pad[j + 1, :],
                                 pad[j, :])
            pad[-1 - j, :] = np.where(np.isnan(pad[-1 - j, :]),
                                      pad[-2 - j, :], pad[-1 - j, :])
        h, w = pad.shape[0] - 2 * halo, pad.shape[1] - 2 * halo
        ssum = np.zeros((h, w))
        ksum = np.zeros((h, w))
        for dy in range(k):
            for dx in range(k):
                win = pad[dy:dy + h, dx:dx + w]
                valid = np.ones((h, w), dtype=bool) if nodata is None \
                    else win != nodata
                ssum += np.where(valid, win * coefs[dy, dx], 0.0)
                ksum += np.where(valid, coefs[dy, dx], 0.0)
        if normalized:
            out = np.divide(ssum, ksum, out=np.zeros_like(ssum),
                            where=ksum != 0)
        else:
            out = ssum
        center = pad[halo:halo + h, halo:halo + w]
        if nodata is not None:
            out = np.where(center == nodata, nodata, out)
        return out

    out, _ = stencil_apply(tiles, meta, out_id, fn, halo=halo,
                           out_dtype=meta.dtype, edges="replicate",
                           dst_nodata=nodata if nodata is not None
                           else -9999.0, planes=False)
    return out


def _load_root(path: str) -> tuple[ET.Element, str, str]:
    """Accept a .vrt path or inline ``<VRTDataset>`` XML (GDALOpen takes
    both spellings)."""
    if path.lstrip().startswith("<"):
        return ET.fromstring(path), os.getcwd(), "vrt"
    root = ET.parse(path).getroot()
    return (root, os.path.dirname(os.path.abspath(path)),
            os.path.splitext(os.path.basename(path))[0])


def read_vrt(spark: SparkSession, path: str, block: int = 256
             ) -> tuple[DataFrame, RasterMeta]:
    """Parse a .vrt (path or inline XML) into a lazy tile-row plan +
    RasterMeta."""
    root, base, stem = _load_root(path)
    if root.get("subClass") == "VRTWarpedDataset":
        return _read_warped_vrt(spark, root, path, block)
    return _compose_bands(spark, root, root.findall("VRTRasterBand"),
                          base, stem, block)


def read_vrt_mask(spark: SparkSession, path: str, block: int = 256
                  ) -> tuple[DataFrame, RasterMeta]:
    """The VRT ``<MaskBand>`` (vrtmask autotest; GetMaskBand over a
    dataset-level or per-band mask): composed exactly like a band from
    its own sources."""
    root, base, stem = _load_root(path)
    mb = root.find("MaskBand")
    if mb is None:
        b = root.find("VRTRasterBand")
        mb = b.find("MaskBand") if b is not None else None
    if mb is None:
        raise ValueError("VRT has no MaskBand")
    return _compose_bands(spark, root, [mb.find("VRTRasterBand")],
                          base, stem + "_mask", block)


def read_vrt_overviews(spark: SparkSession, path: str, block: int = 256
                       ) -> list[tuple[DataFrame, RasterMeta]]:
    """VRT ``<Overview>`` elements (vrtovr autotest): each names another
    raster (file + band) that stands in as a precomputed overview level
    — returned in declaration order, as GetOverview(i) would."""
    root, base, _ = _load_root(path)
    out = []
    for band_el in root.findall("VRTRasterBand"):
        for ov in band_el.findall("Overview"):
            fn_el = ov.find("SourceFilename")
            fn = fn_el.text.strip()
            if fn_el.get("relativeToVRT", "0") == "1":
                fn = os.path.join(base, fn)
            sb = int(ov.findtext("SourceBand", "1")) - 1
            meta = RF.geotiff_meta(fn, block=block)
            tiles = RF.read_geotiff(spark, fn, block=block) \
                      .filter(F.col("band") == sb)
            out.append((tiles, meta))
    return out


def _compose_bands(spark: SparkSession, root: ET.Element,
                   band_els: list[ET.Element], base: str, stem: str,
                   block: int) -> tuple[DataFrame, RasterMeta]:
    W = int(root.get("rasterXSize"))
    H = int(root.get("rasterYSize"))
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    gt_el = root.find("GeoTransform")
    if gt_el is not None:
        gt = tuple(float(v) for v in gt_el.text.split(","))

    inputs: list[tuple[DataFrame, RasterMeta]] = []
    vrt_dtype, vrt_nodata = "uint8", None
    for bi, band_el in enumerate(band_els):
        vrt_dtype = _DT_MAP.get(band_el.get("dataType", "Byte"), "uint8")
        # both historical spellings appear in the reference's fixtures
        # (gcore/data/byte.vrt writes "NodataValue")
        nd_el = band_el.find("NoDataValue")
        if nd_el is None:
            nd_el = band_el.find("NodataValue")
        if nd_el is not None:
            vrt_nodata = float(nd_el.text)
        vrt_meta = RasterMeta(stem, W, H, gt=gt, dtype=vrt_dtype,
                              nodata=vrt_nodata, block=block)
        for src_el in list(band_el):
            if src_el.tag not in ("SimpleSource", "ComplexSource",
                                  "KernelFilteredSource"):
                continue
            fn_el = src_el.find("SourceFilename")
            fn = fn_el.text.strip()
            if fn_el.get("relativeToVRT", "0") == "1":
                fn = os.path.join(base, fn)
            elif not os.path.isabs(fn):
                # relative to cwd (CPLProjectRelativeFilename fallback),
                # made absolute so the scan is cwd-independent; accept
                # VRT-dir-anchored spellings for fixture portability
                for cand in (os.path.abspath(fn), os.path.join(base, fn),
                             os.path.join(os.path.dirname(base), fn)):
                    if os.path.exists(cand):
                        fn = cand
                        break
            sb_text = src_el.findtext("SourceBand", "1").strip()
            if fn.lower().endswith(".asc"):
                src_tiles, src_meta = RF.read_aaigrid(
                    spark, fn, raster_id=os.path.basename(fn), block=block)
            else:
                src_meta = RF.geotiff_meta(fn, block=block)
                src_tiles = RF.read_geotiff(spark, fn, block=block)
            if sb_text.lower().startswith("mask"):
                # "mask,N": the mask band of source band N
                # (vrtsources.cpp XMLInit SourceBand parsing)
                from gdal_spark.raster.mask import mask_band
                n = int(sb_text.split(",")[1]) if "," in sb_text else 1
                src_tiles, src_meta = mask_band(src_tiles, src_meta,
                                                band=n - 1)
                sb = 0
            else:
                sb = int(sb_text) - 1
            src_tiles = src_tiles.filter(F.col("band") == sb)
            srect = _rect(src_el.find("SrcRect"),
                          (0, 0, src_meta.width, src_meta.height))
            drect = _rect(src_el.find("DstRect"), (0, 0, W, H))
            tr = _RectAffine(srect[0], srect[1], drect[0], drect[1],
                             srect[2] / drect[2], srect[3] / drect[3])
            # clip to DstRect: cutline rectangle in VRT georeferenced
            # coords (pixel-center containment = the source window rule)
            x0 = gt[0] + drect[0] * gt[1]
            x1 = gt[0] + (drect[0] + drect[2]) * gt[1]
            y0 = gt[3] + (drect[1] + drect[3]) * gt[5]
            y1 = gt[3] + drect[1] * gt[5]
            cut = G.encode_polygon([np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])
            warped = RS.warp(src_tiles, src_meta,
                             replace(vrt_meta, raster_id=f"{stem}_s"),
                             method="nearest", src_from_dst=tr, cutline=cut)
            warped = warped.withColumn("band", F.lit(bi))
            ratio = float(src_el.findtext("ScaleRatio", "1"))
            offset = float(src_el.findtext("ScaleOffset", "0"))
            if src_el.tag == "ComplexSource" and (ratio != 1 or offset != 0):
                warped, _ = map_pixels(
                    warped, vrt_meta, f"{stem}_s",
                    lambda a, _r=ratio, _o=offset: a * _r + _o)
            lut = src_el.findtext("LUT")
            if src_el.tag == "ComplexSource" and lut and lut.strip():
                pairs = [p.split(":") for p in lut.strip().split(",")]
                xs = np.array([float(p[0]) for p in pairs])
                ys = np.array([float(p[1]) for p in pairs])
                warped, _ = map_pixels(
                    warped, vrt_meta, f"{stem}_s",
                    lambda a, _x=xs, _y=ys: _lut_apply(a, _x, _y))
            kern_el = src_el.find("Kernel")
            if src_el.tag == "KernelFilteredSource" and kern_el is not None:
                ksize = int(kern_el.findtext("Size", "0"))
                if ksize:
                    coefs = np.array(
                        [float(v) for v in
                         kern_el.findtext("Coefs", "").split()]
                    ).reshape(ksize, ksize)
                    normalized = (kern_el.get("normalized") or "0") in (
                        "1", "TRUE", "true", "ON")
                    warped = _kernel_filter(
                        warped, vrt_meta, f"{stem}_s", coefs, normalized,
                        vrt_nodata)
            inputs.append((warped, vrt_meta))
    if not inputs:
        raise ValueError("VRT has no sources")
    return mosaic(inputs, stem, nodata=vrt_nodata)


def build_vrt(paths: list[str], out_path: str, block: int = 256) -> RasterMeta:
    """gdalbuildvrt (gdal/apps/gdalbuildvrt.cpp): compute the union grid
    of the input GeoTIFFs from their headers only (no pixel I/O), and
    write a .vrt whose band composes one SimpleSource per input in
    argument order (last on top). All inputs must share pixel size and
    dtype, as gdalbuildvrt requires without -resolution."""
    metas = [RF.geotiff_meta(p, block=block) for p in paths]
    ps_x, ps_y = metas[0].gt[1], metas[0].gt[5]
    dtype = metas[0].dtype
    for m in metas[1:]:
        if (m.gt[1], m.gt[5]) != (ps_x, ps_y) or m.dtype != dtype:
            raise ValueError("buildvrt inputs must share pixel size/dtype")
    x0 = min(m.gt[0] for m in metas)
    y1 = max(m.gt[3] for m in metas)
    x1 = max(m.gt[0] + m.width * m.gt[1] for m in metas)
    y0 = min(m.gt[3] + m.height * m.gt[5] for m in metas)
    W = int(round((x1 - x0) / ps_x))
    H = int(round((y0 - y1) / ps_y))
    gt = (x0, ps_x, 0.0, y1, 0.0, ps_y)
    nodata = next((m.nodata for m in metas if m.nodata is not None), None)

    vrt = ET.Element("VRTDataset", rasterXSize=str(W), rasterYSize=str(H))
    ET.SubElement(vrt, "GeoTransform").text = ", ".join(
        repr(v) for v in gt)
    band = ET.SubElement(vrt, "VRTRasterBand",
                         dataType=_DT_BACK[dtype], band="1")
    if nodata is not None:
        ET.SubElement(band, "NoDataValue").text = f"{nodata:g}"
    out_dir = os.path.dirname(os.path.abspath(out_path))
    for p, m in zip(paths, metas):
        src = ET.SubElement(band, "SimpleSource")
        rel = os.path.relpath(os.path.abspath(p), out_dir)
        fn = ET.SubElement(src, "SourceFilename", relativeToVRT="1")
        fn.text = rel
        ET.SubElement(src, "SourceBand").text = "1"
        ET.SubElement(src, "SrcRect", xOff="0", yOff="0",
                      xSize=str(m.width), ySize=str(m.height))
        dx = (m.gt[0] - x0) / ps_x
        dy = (m.gt[3] - y1) / ps_y
        ET.SubElement(src, "DstRect", xOff=repr(dx), yOff=repr(dy),
                      xSize=str(m.width), ySize=str(m.height))
    ET.ElementTree(vrt).write(out_path)
    stem = os.path.splitext(os.path.basename(out_path))[0]
    return RasterMeta(stem, W, H, gt=gt, dtype=dtype, nodata=nodata,
                      block=block)
