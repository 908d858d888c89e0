"""gdal/apps utilities re-expressed as Spark pipelines.

``ogr2ogr`` (gdal/apps/ogr2ogr.cpp): read any vector format → attribute
filter (``-where``) / OGR SQL (``-sql``) / rectangle spatial filter
(``-spat``) / CRS reprojection (``-s_srs``/``-t_srs``) / field selection
(``-select``) → write any vector format. Every stage is a DataFrame
transformation — one declarative plan end-to-end; Catalyst pushes the
attribute filter into the scan, the spatial filter is the reference's
staged envelope test (ogrlayer.cpp:1344-1450), and reprojection runs
batch-vectorized over Arrow (the ogr2ogr.cpp:784-796 composed-CT analog).

``gdal_translate`` (gdal/apps/gdal_translate.cpp): band select (``-b``),
pixel/georeferenced windowing (``-srcwin``/``-projwin``), output sizing
(``-outsize``, via the warp gather with the requested resampler), dtype
conversion (``-ot``) and linear value rescale (``-scale``, the
GDALTranslate scale-params path) over the tile-row raster model. The
window/resize is a ``warp`` with an affine transform — block-pruned, one
shuffle; cast/rescale is a narrow map stage.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator
from dataclasses import replace

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.functions import srs as SRS
from gdal_spark.ogrsql import OGRSQLEngine, attribute_filter
from gdal_spark.raster import resample as RS
from gdal_spark.raster.algebra import map_pixels
from gdal_spark.raster.model import RasterMeta
from gdal_spark.sources import formats as FMT


# ---------------------------------------------------------------------------
# vector format dispatch (driver probing, GDALOpenEx analog — by extension
# rather than magic bytes: our formats are self-describing paths)
# ---------------------------------------------------------------------------

def _vector_ext(path: str) -> str:
    base = path.rstrip("/").lower()
    for ext in (".geojsonl", ".geojsons", ".topojson", ".geojson", ".json", ".csv",
                ".shp", ".gpkg", ".parquet", ".kml", ".gpx", ".mif", ".gml",
                ".dxf", ".dbf", ".vrt", ".gmt", ".dgn", ".sqlite", ".db"):
        if base.endswith(ext):
            return ext
    return ""


def read_vector(spark: SparkSession, src, layer: str | None = None,
                **opts) -> DataFrame:
    """Open any supported vector source (DataFrame passthrough, GeoJSON
    document/sequence, CSV+WKT, Shapefile, GeoPackage, Parquet)."""
    if isinstance(src, DataFrame):
        return src
    ext = _vector_ext(src)
    if ext in (".geojsonl", ".geojsons"):
        return FMT.read_geojson_seq(spark, src)
    if ext in (".geojson", ".json", ".topojson"):
        # content sniff (ogrgeojsondriver.cpp GeoJSONGetSourceType):
        # TopoJSON and ESRI FeatureService JSON route to their readers
        head = open(src, "rb").read(4096).decode("utf-8", "replace") \
            if isinstance(src, str) and os.path.exists(src) else ""
        if '"Topology"' in head or ext == ".topojson":
            from gdal_spark.sources.jsonvariants import read_topojson
            return read_topojson(spark, src, layer or "TopoJSON")
        if '"esriGeometry' in head or '"objectIdFieldName"' in head:
            from gdal_spark.sources.jsonvariants import read_esrijson
            return read_esrijson(spark, src)
        return FMT.read_geojson(spark, src)
    if ext == ".csv":
        return FMT.read_csv_features(spark, src, **opts)
    if ext == ".shp":
        return FMT.read_shapefile(spark, src)
    if ext == ".gpkg":
        if layer is None:
            raise ValueError("GeoPackage read requires layer=")
        return FMT.read_gpkg(spark, src, layer)
    if ext == ".kml":
        return FMT.read_kml(spark, src, layer)
    if ext == ".gpx":
        return FMT.read_gpx(spark, src, layer or "waypoints")
    if ext == ".mif":
        return FMT.read_mif(spark, src)
    if ext == ".gml":
        return FMT.read_gml(spark, src)
    if ext == ".dxf":
        from gdal_spark.sources.dxf import read_dxf
        return read_dxf(spark, src)
    if ext == ".dbf":
        return FMT.read_shapefile(spark, src)
    if ext == ".gmt":
        return FMT.read_gmt(spark, src)
    if ext == ".dgn":
        from gdal_spark.sources.dgn import read_dgn
        return read_dgn(spark, src)
    if ext in (".sqlite", ".db"):
        from gdal_spark.sources.spatialite import read_sqlite
        return read_sqlite(spark, src, layer)
    if ext == ".vrt" or (isinstance(src, str)
                         and src.lstrip().startswith("<OGRVRTDataSource")):
        from gdal_spark.sources.vrt_vector import read_vrt_vector
        return read_vrt_vector(spark, src, layer)
    if ext == ".parquet" or os.path.isdir(src):
        return spark.read.parquet(src)
    raise ValueError(f"unrecognized vector source {src!r}")


def write_vector(df: DataFrame, dst: str, layer: str = "layer",
                 geometry_col: str = "geometry") -> None:
    ext = _vector_ext(dst)
    if ext in (".geojsonl", ".geojsons", ".geojson", ".json"):
        FMT.write_geojson_seq(df, dst, geometry_col)
    elif ext == ".csv":
        FMT.write_csv_features(df, dst, geometry_col)
    elif ext == ".shp":
        FMT.write_shapefile(df, os.path.dirname(dst) or dst,
                            geometry_col).collect()
    elif ext == ".gpkg":
        FMT.write_gpkg(df, dst, layer, geometry_col)
    elif ext == ".kml":
        FMT.write_kml(df, dst, geometry_col=geometry_col)
    elif ext == ".gpx":
        FMT.write_gpx(df, dst, geometry_col=geometry_col)
    elif ext == ".dxf":
        from gdal_spark.sources.dxf import write_dxf
        write_dxf(df, dst)
    elif ext == ".gmt":
        FMT.write_gmt(df, dst, geometry_col)
    elif ext == ".parquet":
        df.write.mode("overwrite").parquet(dst)
    else:
        raise ValueError(f"unrecognized vector sink {dst!r}")


# ---------------------------------------------------------------------------
# spatial filter + reprojection stages
# ---------------------------------------------------------------------------

def spatial_filter(df: DataFrame, rect: tuple[float, float, float, float],
                   geometry_col: str = "geometry") -> Column:
    """``SetSpatialFilter`` with a rectangle (ogrlayer.cpp:1103): the
    staged test — NULL geometries rejected, then envelope-intersects
    (FilterGeometry's envelope stages, :1344-1383; for a rectangle filter
    the envelope test IS the exact test for points and the accept test
    for bbox-overlapping features, matching -spat semantics)."""
    xmin, ymin, xmax, ymax = (float(v) for v in rect)

    def env_hit(wkb: pd.Series) -> pd.Series:
        out = np.zeros(len(wkb), dtype=bool)
        for i, b in enumerate(wkb):
            if b is None:
                continue
            ex0, ey0, ex1, ey1 = FMT._wkb_bbox(bytes(b))
            out[i] = ex0 <= xmax and ex1 >= xmin and ey0 <= ymax and ey1 >= ymin
        return pd.Series(out)

    return F.pandas_udf(env_hit, "boolean")(F.col(geometry_col))


def _walk_coords(obj, fn):
    """Apply fn(ndarray Nx2)->ndarray to every coordinate array of a
    GeoJSON geometry dict."""
    kind = obj["type"]
    c = obj["coordinates"]
    if kind == "Point":
        out = fn(np.asarray([c], dtype=np.float64))[0]
        return {"type": kind, "coordinates": [float(out[0]), float(out[1])]}
    if kind in ("LineString", "MultiPoint"):
        return {"type": kind,
                "coordinates": fn(np.asarray(c, np.float64)).tolist()}
    if kind in ("Polygon", "MultiLineString"):
        return {"type": kind,
                "coordinates": [fn(np.asarray(r, np.float64)).tolist()
                                for r in c]}
    return {"type": kind,
            "coordinates": [[fn(np.asarray(r, np.float64)).tolist()
                             for r in rings] for rings in c]}


def transform_geometry(df: DataFrame, t_srs, s_srs=None,
                       geometry_col: str = "geometry") -> DataFrame:
    """Reproject the geometry column s_srs → t_srs (default source:
    geographic lon/lat). CRS objects are the engine's closed-form
    projections (functions/srs.py) or WKT via ``crs_from_wkt`` — the
    composed coordinate transformation of ogr2ogr.cpp:784-796, run as
    numpy over whole Arrow batches."""
    s = _crs(s_srs)
    t = _crs(t_srs)
    gi = df.schema.fieldNames().index(geometry_col)

    def tx(arr: np.ndarray) -> np.ndarray:
        lon, lat = s.inverse(arr[:, 0], arr[:, 1])
        x, y = t.forward(lon, lat)
        return np.column_stack([x, y])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for w in pdf.iloc[:, gi]:
                if w is None:
                    out.append(None)
                    continue
                d = FMT.geojson_geom_from_wkb(bytes(w))
                out.append(bytearray(FMT.wkb_from_geojson_geom(
                    _walk_coords(d, tx))))
            pdf = pdf.copy()
            pdf[geometry_col] = out
            yield pdf

    return df.mapInPandas(run, df.schema)


# ---------------------------------------------------------------------------
# ogr2ogr
# ---------------------------------------------------------------------------

def _as_clip_wkb(v) -> bytes | None:
    """-clipsrc/-clipdst operand: rect tuple, WKT string, or WKB bytes
    → polygon WKB (rects become their ring, matching the app's
    xmin ymin xmax ymax spelling, ogr2ogr.cpp:1330-1344)."""
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        from gdal_spark.functions.geometry import wkb_from_wkt
        return wkb_from_wkt(v)
    xmin, ymin, xmax, ymax = (float(f) for f in v)
    from gdal_spark.functions.geometry import encode_polygon
    return encode_polygon([np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax],
         [xmin, ymin]])])


def _geom_map(df: DataFrame, geometry_col: str, fn,
              drop_empty: bool = False) -> DataFrame:
    """One Arrow pass applying ``fn(wkb) -> wkb | None`` per feature;
    with ``drop_empty`` rows mapping to None are dropped (the clip
    stages' drop-if-empty contract, ogr2ogr.cpp:3888-3893)."""
    gi = df.schema.fieldNames().index(geometry_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, keep = [], []
            for i, w in enumerate(pdf.iloc[:, gi]):
                r = fn(bytes(w)) if w is not None else None
                if r is None and drop_empty:
                    continue
                out.append(bytearray(r) if r is not None else None)
                keep.append(i)
            pdf = pdf.iloc[keep].copy()
            pdf[geometry_col] = out
            yield pdf

    return df.mapInPandas(run, df.schema)


def _geom_explode(df: DataFrame, geometry_col: str) -> DataFrame:
    """-explodecollections: one output row per container member, other
    columns duplicated (ogr2ogr.cpp:2987/:3843)."""
    from gdal_spark.functions import geomops as GO
    gi = df.schema.fieldNames().index(geometry_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx, out = [], []
            for i, w in enumerate(pdf.iloc[:, gi]):
                if w is None:
                    idx.append(i)
                    out.append(None)
                    continue
                for m in GO.explode_wkb(bytes(w)):
                    idx.append(i)
                    out.append(bytearray(m))
            pdf = pdf.iloc[idx].copy()
            pdf[geometry_col] = out
            yield pdf

    return df.mapInPandas(run, df.schema)


def ogr2ogr(spark: SparkSession, src, dst: str | None = None, *,
            layer: str | None = None, layer_name: str | None = None,
            sql: str | None = None, where: str | None = None,
            select: list[str] | None = None,
            spat: tuple[float, float, float, float] | None = None,
            clipsrc=None, clipdst=None,
            segmentize: float | None = None, simplify: float | None = None,
            explodecollections: bool = False, wrapdateline: bool = False,
            nlt: str | None = None, preserve_fid: bool = False,
            dim: int | str | None = None,
            s_srs=None, t_srs=None,
            geometry_col: str = "geometry",
            reader_opts: dict | None = None) -> DataFrame:
    """The ogr2ogr pipeline. Stage order mirrors the app's per-feature
    translate loop (ogr2ogr.cpp:3843-3964): open → -sql OR (-where +
    -spat) → -explodecollections → -segmentize|-simplify → -clipsrc →
    reproject (-wrapdateline) → -clipdst → -nlt → -select → write.
    ``clipsrc``/``clipdst`` accept a rect tuple, WKT, or polygon WKB;
    clipped-empty features are dropped, as the app does. Returns the
    final DataFrame (also when ``dst`` is given, after writing)."""
    from gdal_spark.functions import geomops as GO
    if segmentize is not None and simplify is not None:
        raise ValueError(
            "-segmentize and -simplify are mutually exclusive (one geomop)")
    if preserve_fid and explodecollections:
        raise ValueError("cannot use -preserve_fid and -explodecollections "
                         "at the same time")
    if dim not in (None, 2, "2", "XY", "xy"):
        raise ValueError("engine geometries are 2-D; -dim supports only 2/XY")
    df = read_vector(spark, src, layer=layer, **(reader_opts or {}))
    if sql is not None:
        eng = OGRSQLEngine(spark)
        name = layer_name or (layer if layer else "src")
        eng.register(name, df, geometry_col)
        df = eng.execute_sql(sql)
    else:
        if where is not None:
            df = df.filter(attribute_filter(df, where, geometry_col))
        if spat is not None:
            df = df.filter(spatial_filter(df, spat, geometry_col))
    if explodecollections:
        df = _geom_explode(df, geometry_col)
    if segmentize is not None:
        df = _geom_map(df, geometry_col,
                       lambda w, d=float(segmentize): GO.wkb_segmentize(w, d))
    elif simplify is not None:
        df = _geom_map(df, geometry_col,
                       lambda w, d=float(simplify): GO.wkb_simplify(w, d))
    if isinstance(clipsrc, str) and clipsrc == "spat_extent":
        # -clipsrc spat_extent: the -spat rectangle becomes the clip
        # geometry (ogr2ogr.cpp:1586-1590, test_ogr2ogr_19)
        if spat is None:
            raise ValueError("-clipsrc spat_extent requires -spat")
        clipsrc = tuple(spat)
    clipsrc_wkb = _as_clip_wkb(clipsrc)
    if clipsrc_wkb is not None:
        df = _geom_map(
            df, geometry_col,
            lambda w, c=clipsrc_wkb: GO.wkb_clip_to_polygon(w, c),
            drop_empty=True)
    if t_srs is not None:
        df = transform_geometry(df, t_srs, s_srs, geometry_col)
    if wrapdateline:
        df = _geom_map(df, geometry_col, GO.wkb_wrapdateline)
    if clipdst is not None:
        if (isinstance(clipdst, (tuple, list))
                and not isinstance(clipdst[0], (tuple, list))):
            df = clip_to_rect(df, clipdst, geometry_col)
        else:
            df = _geom_map(
                df, geometry_col,
                lambda w, c=_as_clip_wkb(clipdst): GO.wkb_clip_to_polygon(
                    w, c),
                drop_empty=True)
    if nlt is not None:
        df = _geom_map(df, geometry_col,
                       lambda w, t=nlt: GO.wkb_force_to(w, t))
    if select is not None:
        keep = list(select)
        if geometry_col in df.columns and geometry_col not in keep:
            keep.append(geometry_col)
        df = df.select(*keep)
    if dst is not None:
        write_vector(df, dst, layer=layer_name or "layer",
                     geometry_col=geometry_col)
    return df


# ---------------------------------------------------------------------------
# gdal_translate
# ---------------------------------------------------------------------------

def gdal_translate(tiles: DataFrame, meta: RasterMeta, out_id: str, *,
                   bands: list[int] | None = None,
                   srcwin: tuple[int, int, int, int] | None = None,
                   projwin: tuple[float, float, float, float] | None = None,
                   outsize: tuple[int, int] | None = None,
                   resample: str = "nearest",
                   ot: str | None = None,
                   scale: tuple[float, float, float, float] | None = None,
                   ) -> tuple[DataFrame, RasterMeta]:
    """gdal_translate over tile rows. ``projwin`` is (ulx, uly, lrx, lry)
    in georeferenced coords (converted to a pixel window through the
    inverse geotransform, as GDALTranslate does); ``scale`` is
    (src_min, src_max, dst_min, dst_max) linear rescale with clipping.
    Subset/resize executes as an affine warp (block-pruned source join);
    no-op geometry requests degrade to pure narrow stages."""
    if bands is not None:
        tiles = tiles.filter(F.col("band").isin([int(b) for b in bands]))
    g = meta.gt
    if projwin is not None:
        if srcwin is not None:
            raise ValueError("give srcwin or projwin, not both")
        ulx, uly, lrx, lry = projwin
        x0 = (ulx - g[0]) / g[1]
        y0 = (uly - g[3]) / g[5]
        x1 = (lrx - g[0]) / g[1]
        y1 = (lry - g[3]) / g[5]
        srcwin = (int(math.floor(x0 + 0.001)), int(math.floor(y0 + 0.001)),
                  int(math.ceil(x1 - x0 - 0.001)),
                  int(math.ceil(y1 - y0 - 0.001)))
    if srcwin is None:
        srcwin = (0, 0, meta.width, meta.height)
    xoff, yoff, xsize, ysize = srcwin
    ow, oh = outsize if outsize is not None else (xsize, ysize)
    odtype = ot or meta.dtype
    out_gt = (g[0] + xoff * g[1], g[1] * xsize / ow, 0.0,
              g[3] + yoff * g[5], 0.0, g[5] * ysize / oh)
    dst_meta = replace(meta, raster_id=out_id, width=ow, height=oh,
                       gt=out_gt, dtype=odtype)
    needs_px = scale is not None or odtype != meta.dtype
    geom_noop = (xoff, yoff, xsize, ysize, ow, oh) == (
        0, 0, meta.width, meta.height, meta.width, meta.height)
    if geom_noop:
        out, cur_dtype = tiles, meta.dtype
        if not needs_px:
            return tiles.withColumn("raster_id", F.lit(out_id)), dst_meta
    else:
        # scale/cast follow the GDALTranslate order (rescale THEN cast):
        # warp into float64 when pixel ops follow, narrow at the map stage
        warp_meta = replace(dst_meta,
                            dtype="float64" if needs_px else odtype)
        out = RS.warp(tiles, meta, warp_meta, method=resample)
        cur_dtype = warp_meta.dtype
    if needs_px:
        smin, smax, dmin, dmax = scale if scale is not None else (0, 1, 0, 1)

        def fn(arr: np.ndarray) -> np.ndarray:
            a = arr.astype(np.float64)
            if scale is not None:
                a = (a - smin) / (smax - smin) * (dmax - dmin) + dmin
                a = np.clip(a, min(dmin, dmax), max(dmin, dmax))
            if np.issubdtype(np.dtype(odtype), np.integer):
                info = np.iinfo(odtype)
                a = np.clip(np.round(a), info.min, info.max)
            return a

        out, _m = map_pixels(out, replace(dst_meta, dtype=cur_dtype),
                             out_id, fn, out_dtype=odtype)
    return out, dst_meta


# ---------------------------------------------------------------------------
# gdalwarp
# ---------------------------------------------------------------------------

def _crs(v):
    if v is None:
        return SRS.Geographic()
    if isinstance(v, int):
        return SRS.crs_from_epsg(v)
    if isinstance(v, str):
        if v.upper().startswith("EPSG:"):
            return SRS.crs_from_epsg(int(v.split(":")[1]))
        return SRS.crs_from_wkt(v)
    return v


def gdalwarp(tiles: DataFrame, src_meta: RasterMeta, out_id: str, *,
             s_srs=None, t_srs=None, r: str = "nearest",
             te: tuple[float, float, float, float] | None = None,
             tr: tuple[float, float] | None = None,
             ts: tuple[int, int] | None = None,
             ot: str | None = None, et: float = 0.25,
             cutline: bytes | None = None,
             src_nodata: float | None = None,
             dst_nodata: float | None = None,
             tap: bool = False,
             crop_to_cutline: bool = False,
             dstalpha: bool = False, nbands: int = 1,
             srcalpha: int | None = None,
             ) -> tuple[DataFrame, RasterMeta]:
    """The gdalwarp app (gdal/apps/gdalwarp.cpp): full reprojection
    pipeline. Output grid inference follows the app exactly — without
    ``-te``/``-tr``/``-ts`` the grid comes from ``suggested_warp_output``
    (GDALSuggestedWarpOutput2); ``te`` overrides the extent, ``tr`` the
    resolution, ``ts`` the size. The runtime transform is the composed
    GenImgProjTransform chain (gdaltransformer.cpp:974) wrapped in the
    coarse-lattice ApproxTransform at ``-et`` error (default 0.25 px,
    gdaltransformer.cpp:3010); set ``et=0`` for the exact chain.
    ``tap`` = -tap (target aligned pixels: requires ``tr``, snaps the
    extent outward to multiples of the resolution, gdalwarp.cpp); a
    truthy ``crop_to_cutline`` = -crop_to_cutline (the cutline polygon's
    envelope becomes the extent — pass the -te role to the cutline).
    ``dstalpha`` = -dstalpha: append an alpha band (index ``nbands``) of
    255·validity density (GDALWarpDstAlphaMasker, gdalwarper.cpp:573).
    ``srcalpha`` = -srcalpha with the alpha band's index: that band
    becomes per-pixel source density (GDALWarpSrcAlphaMasker) instead of
    being warped as data.
    Execution is the engine's block-pruned distributed warp gather."""
    if tap and tr is None:
        raise ValueError("-tap requires -tr (gdalwarp app contract)")
    if crop_to_cutline:
        if cutline is None:
            raise ValueError("-crop_to_cutline requires -cutline")
        if te is not None:
            raise ValueError("-crop_to_cutline conflicts with -te")
        from gdal_spark.functions.geometry import geometry_envelope
        te = geometry_envelope(cutline)  # (xmin, ymin, xmax, ymax)
    s, t = _crs(s_srs), _crs(t_srs)
    g = src_meta.gt

    def dst_from_src(px, py):
        x = g[0] + np.asarray(px, np.float64) * g[1] + np.asarray(py, np.float64) * g[2]
        y = g[3] + np.asarray(px, np.float64) * g[4] + np.asarray(py, np.float64) * g[5]
        lon, lat = s.inverse(x, y)
        return t.forward(lon, lat)

    suggested = None
    if te is None or (tr is None and ts is None):
        suggested = SRS.suggested_warp_output(src_meta.width,
                                              src_meta.height, dst_from_src)
    if te is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in te)
    else:
        sw, sh, sgt = suggested
        xmin, xmax = sgt[0], sgt[0] + sw * sgt[1]
        ymax, ymin = sgt[3], sgt[3] + sh * sgt[5]
    if tr is not None:
        xres, yres = (float(v) for v in tr)
        if tap:
            # gdalwarp -tap: snap the extent outward onto the res grid
            xmin = math.floor(xmin / xres) * xres
            xmax = math.ceil(xmax / xres) * xres
            ymin = math.floor(ymin / yres) * yres
            ymax = math.ceil(ymax / yres) * yres
        width = max(1, int((xmax - xmin) / xres + 0.5))
        height = max(1, int((ymax - ymin) / yres + 0.5))
    elif ts is not None:
        width, height = int(ts[0]), int(ts[1])
        xres = (xmax - xmin) / width
        yres = (ymax - ymin) / height
    else:
        sw, sh, sgt = suggested
        if te is None:
            width, height, xres, yres = sw, sh, sgt[1], -sgt[5]
        else:
            xres = yres = sgt[1]
            width = max(1, int((xmax - xmin) / xres + 0.5))
            height = max(1, int((ymax - ymin) / yres + 0.5))
    dst_gt = (xmin, xres, 0.0, ymax, 0.0, -yres)
    dst_meta = replace(src_meta, raster_id=out_id, width=width,
                       height=height, gt=dst_gt, dtype=ot or src_meta.dtype,
                       nodata=dst_nodata if dst_nodata is not None
                       else src_meta.nodata)
    exact = SRS.GenImgProjTransform(src_meta.gt, dst_gt,
                                    src_crs=s, dst_crs=t)
    src_from_dst = SRS.ApproxTransform(exact, max_err=et) if et else exact
    out = RS.warp(tiles, src_meta, dst_meta, method=r,
                  src_from_dst=src_from_dst, cutline=cutline,
                  src_nodata=src_nodata,
                  dst_alpha=int(nbands) if dstalpha else None,
                  src_alpha=srcalpha)
    return out, dst_meta


# ---------------------------------------------------------------------------
# raster path plumbing + gdalinfo + gdaltindex
# ---------------------------------------------------------------------------

def open_raster(spark: SparkSession, src, meta: RasterMeta | None = None,
                block: int = 256):
    """GDALOpen for the raster apps: a (tiles, meta) pair passes through,
    a .tif path opens via the GeoTIFF driver (header read on the driver,
    pixels distributed), a .asc via AAIGrid."""
    from gdal_spark.raster import formats as RFMT

    if isinstance(src, DataFrame):
        if meta is None:
            raise ValueError("DataFrame source needs meta=")
        return src, meta
    if isinstance(src, tuple):
        return src
    low = src.lower()
    if low.endswith((".tif", ".tiff")):
        m = RFMT.geotiff_meta(src, block=block)
        return RFMT.read_geotiff(spark, src, block=block), m
    if low.endswith(".asc"):
        return RFMT.read_aaigrid(spark, src, block=block)
    if low.endswith(".vrt"):
        from gdal_spark.raster import vrt as VRT
        return VRT.read_vrt(spark, src, block=block)
    if low.endswith(".xyz"):
        return RFMT.read_xyz(spark, src, block=block)
    if low.endswith(".bt"):
        return RFMT.read_bt(spark, src, block=block)
    if low.endswith(".hgt"):
        return RFMT.read_srtmhgt(spark, src, block=block)
    if low.endswith(".nc") or low.startswith("netcdf:"):
        from gdal_spark.raster import netcdf as NCDF
        if low.startswith("netcdf:"):
            rest = src[7:]
            path, _, var = rest.rpartition(":")
            if not path:  # NETCDF:file with no variable
                path, var = rest, None
            path = path.strip('"')
            return NCDF.read_netcdf(spark, path, var or None, block=block)
        return NCDF.read_netcdf(spark, src, block=block)
    if low.endswith((".grb", ".grib", ".grib2", ".grb2")):
        from gdal_spark.raster import grib as GRB
        return GRB.read_grib(spark, src, block=block)
    if low.endswith(".hdf") or low.startswith("hdf4_sds:"):
        from gdal_spark.raster import hdf4 as H4F
        if low.startswith("hdf4_sds:"):
            # HDF4_SDS:SUBTYPE:"file":index (hdf4dataset.cpp naming)
            parts = src.split(":")
            path = parts[2].strip('"')
            h4 = H4F.H4File(open(path, "rb").read())
            name = h4.sds[int(parts[3])].name
            return H4F.read_hdf4(spark, path, name, block=block)
        return H4F.read_hdf4(spark, src, block=block)
    if low.endswith((".h5", ".hdf5")) or low.startswith("hdf5:"):
        from gdal_spark.raster import hdf5 as H5F
        if low.startswith("hdf5:"):
            rest = src[5:]
            path, _, dset = rest.partition("://")
            path = path.strip('"')
            return H5F.read_hdf5(spark, path, dset or None, block=block)
        return H5F.read_hdf5(spark, src, block=block)
    if low.endswith((".bil", ".flt", ".img", ".dat")):
        # sidecar sniff: an ENVI-magic .hdr routes to the ENVI driver,
        # a keyword .hdr to EHdr (GDALIdentify order for raw rasters)
        import os
        stem = os.path.splitext(src)[0]
        for hdr in (stem + ".hdr", src + ".hdr"):
            if os.path.exists(hdr):
                first = open(hdr).read(4)
                if first.upper().startswith("ENVI"):
                    return RFMT.read_envi(spark, src, block=block)
                return RFMT.read_ehdr(spark, src, block=block)
    # round-5 SAR family: subdataset prefixes and name rules first
    if low.startswith("radarsat_2_calib:") or low.endswith("product.xml"):
        from gdal_spark.raster import rs2 as RS2D
        t, m, _info = RS2D.read_rs2(spark, src, block=block)
        return t, m
    from gdal_spark.raster.tsx import identify_tsx
    if _ospath_exists(src) and identify_tsx(src):
        from gdal_spark.raster import tsx as TSXD
        t, m, _info = TSXD.read_tsx(spark, src, block=block)
        return t, m
    # content sniff (GDALIdentify order): GRIB and netCDF carry magics,
    # including NDFD '****'-framed GRIB (.bin)
    import os as _os2
    if _os2.path.exists(src):
        with open(src, "rb") as fh:
            head = fh.read(512)
        if head[:3] == b"CDF":
            from gdal_spark.raster import netcdf as NCDF
            return NCDF.read_netcdf(spark, src, block=block)
        if b"GRIB" in head[:256]:
            from gdal_spark.raster import grib as GRB
            return GRB.read_grib(spark, src, block=block)
        if head[:8].startswith(b"PRODUCT="):           # Envisat MPH
            from gdal_spark.raster import envisat as ENVD
            t, m, _env = ENVD.read_envisat(spark, src, block=block)
            return t, m
        if len(head) >= 8 and (
                head[4:8] == b"\x3f\xc0\x12\x12"):      # CEOS image FDR
            from gdal_spark.raster import ceos as CEOSD
            t, m, _img = CEOSD.read_ceos(spark, src, block=block)
            return t, m
    raise ValueError(f"unrecognized raster source {src!r}")


def _ospath_exists(p) -> bool:
    import os as _os3
    return isinstance(p, str) and _os3.path.exists(p)


def write_raster(tiles: DataFrame, meta: RasterMeta, dst: str) -> None:
    from gdal_spark.raster import formats as RFMT
    from gdal_spark.raster.model import to_array

    low = dst.lower()
    if low.endswith((".tif", ".tiff")):
        RFMT.write_geotiff(tiles, meta, dst)
    elif low.endswith(".asc"):
        RFMT.write_aaigrid(to_array(tiles, meta), meta, dst)
    elif low.endswith(".nc"):
        from gdal_spark.raster import netcdf as NCDF
        NCDF.write_netcdf(tiles, meta, dst, nodata=meta.nodata)
    elif low.endswith(".mbtiles"):
        from gdal_spark.raster import mbtiles as MBT
        MBT.write_mbtiles(tiles, meta, dst)
    elif low.endswith(".parquet"):
        tiles.write.mode("overwrite").parquet(dst)
    else:
        raise ValueError(f"unrecognized raster sink {dst!r}")


def translate_path(spark: SparkSession, src: str, dst: str,
                   **opts) -> RasterMeta:
    """gdal_translate with file paths on both ends."""
    import os as _os

    tiles, meta = open_raster(spark, src)
    out_id = _os.path.splitext(_os.path.basename(dst))[0]
    out, om = gdal_translate(tiles, meta, out_id, **opts)
    write_raster(out, om, dst)
    return om


def warp_path(spark: SparkSession, src: str, dst: str,
              **opts) -> RasterMeta:
    """gdalwarp with file paths on both ends."""
    import os as _os

    tiles, meta = open_raster(spark, src)
    out_id = _os.path.splitext(_os.path.basename(dst))[0]
    out, om = gdalwarp(tiles, meta, out_id, **opts)
    write_raster(out, om, dst)
    return om


def gdalinfo(spark: SparkSession, src, meta: RasterMeta | None = None,
             stats: bool = False, checksum: bool = False) -> dict:
    """gdalinfo (gdal/apps/gdalinfo.c): size, geotransform, corner
    coordinates, dtype, nodata — header-only unless ``stats``/``checksum``
    ask for the distributed passes."""
    tiles, m = open_raster(spark, src, meta)
    info = {
        "size": [m.width, m.height],
        "geotransform": list(m.gt),
        "dtype": m.dtype,
        "nodata": m.nodata,
        "block": [m.block, m.block],
        "corners": {
            "upperLeft": list(m.pixel_to_geo(0, 0)),
            "lowerLeft": list(m.pixel_to_geo(0, m.height)),
            "upperRight": list(m.pixel_to_geo(m.width, 0)),
            "lowerRight": list(m.pixel_to_geo(m.width, m.height)),
            "center": list(m.pixel_to_geo(m.width / 2, m.height / 2)),
        },
    }
    from gdal_spark.raster.mask import GMF_ALL_VALID, GMF_NODATA, mask_flags
    mf = mask_flags(m)
    info["mask_flags"] = ["ALL_VALID"] if mf == GMF_ALL_VALID else (
        ["NODATA"] if mf == GMF_NODATA else [])
    if stats:
        from gdal_spark.raster.stats import compute_statistics
        rows = compute_statistics(tiles, m).collect()
        info["stats"] = {int(r["band"]): {
            "min": r["min"], "max": r["max"],
            "mean": r["mean"], "stddev": r["stddev"]} for r in rows}
    if checksum:
        from gdal_spark.raster.checksum import checksum as _ck
        rows = _ck(tiles, m).collect()
        info["checksum"] = {int(r["band"]): int(r["checksum"]) for r in rows}
    return info


def gdaltindex(spark: SparkSession, paths: list[str]) -> DataFrame:
    """gdaltindex (gdal/apps/gdaltindex.c:311): footprint manifest of
    raster files — one polygon row per file, from HEADERS only (no pixel
    I/O). The result is the engine's partition-pruning index: join query
    bboxes against it to open only intersecting files."""
    from gdal_spark.raster import formats as RFMT

    rows = []
    for p in paths:
        m = RFMT.geotiff_meta(p)
        x0, y1 = m.gt[0], m.gt[3]
        x1 = x0 + m.width * m.gt[1]
        y0 = y1 + m.height * m.gt[5]
        wkb = G.encode_polygon([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])
        rows.append((p, float(min(x0, x1)), float(min(y0, y1)),
                     float(max(x0, x1)), float(max(y0, y1)),
                     bytearray(wkb)))
    return spark.createDataFrame(
        rows, "location string, xmin double, ymin double, "
              "xmax double, ymax double, geometry binary")


# ---------------------------------------------------------------------------
# -clipdst: true geometry clipping to a rectangle (ogr2ogr.cpp -clipdst;
# geometry ops per type: S-H polygon clip, Liang-Barsky polyline clip)
# ---------------------------------------------------------------------------

def _clip_polyline_rect(coords: np.ndarray, rect) -> list[np.ndarray]:
    """Liang–Barsky clip of each segment against the rect; consecutive
    surviving pieces stitch back into polyline parts."""
    xmin, ymin, xmax, ymax = rect
    parts: list[list] = []
    cur: list = []
    for i in range(len(coords) - 1):
        (x0, y0), (x1, y1) = coords[i], coords[i + 1]
        dx, dy = x1 - x0, y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in ((-dx, x0 - xmin), (dx, xmax - x0),
                     (-dy, y0 - ymin), (dy, ymax - y0)):
            if p == 0.0:
                if q < 0.0:
                    ok = False
                    break
                continue
            t = q / p
            if p < 0.0:
                t0 = max(t0, t)
            else:
                t1 = min(t1, t)
            if t0 > t1:
                ok = False
                break
        if not ok:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        a = (x0 + t0 * dx, y0 + t0 * dy)
        b = (x0 + t1 * dx, y0 + t1 * dy)
        if cur and cur[-1] == a:
            cur.append(b)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        parts.append(cur)
    return [np.asarray(p, np.float64) for p in parts]


def _clip_wkb_rect(wkb: bytes, rect) -> bytes | None:
    xmin, ymin, xmax, ymax = rect
    import struct as _struct
    gtype, _en, _off = G._read_header(memoryview(wkb), 0)
    if gtype == G.WKB_POINT:
        x, y = G.decode_point(wkb)
        return wkb if xmin <= x <= xmax and ymin <= y <= ymax else None
    if gtype == G.WKB_MULTIPOINT:
        d = FMT.geojson_geom_from_wkb(wkb)
        pts = np.asarray(d["coordinates"], np.float64)
        keep = pts[(pts[:, 0] >= xmin) & (pts[:, 0] <= xmax)
                   & (pts[:, 1] >= ymin) & (pts[:, 1] <= ymax)]
        return G.encode_multipoint(keep) if len(keep) else None
    if gtype in (G.WKB_LINESTRING, G.WKB_MULTILINESTRING):
        if gtype == G.WKB_LINESTRING:
            lines = [G.decode_linestring(wkb)]
        else:
            lines = [np.asarray(ln, np.float64) for ln in
                     FMT.geojson_geom_from_wkb(wkb)["coordinates"]]
        parts = [p for ln in lines for p in _clip_polyline_rect(ln, rect)]
        if not parts:
            return None
        return (G.encode_linestring(parts[0]) if len(parts) == 1
                else G.encode_multilinestring(parts))
    if gtype in (G.WKB_POLYGON, G.WKB_MULTIPOLYGON):
        ring = np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                         [xmin, ymax], [xmin, ymin]])
        return G.polygon_clip_convex(wkb, ring)
    raise ValueError(f"unsupported geometry type {gtype}")


def clip_to_rect(df: DataFrame, rect: tuple[float, float, float, float],
                 geometry_col: str = "geometry") -> DataFrame:
    """ogr2ogr -clipdst with a rectangle: per-feature geometry clipping
    (features whose clipped geometry is empty are dropped, as the app
    does). Arrow-batched; rectangle clipping is exact for every stored
    geometry type."""
    gi = df.schema.fieldNames().index(geometry_col)
    rect = tuple(float(v) for v in rect)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, keep = [], []
            for i, w in enumerate(pdf.iloc[:, gi]):
                c = _clip_wkb_rect(bytes(w), rect) if w is not None else None
                if c is not None:
                    out.append(bytearray(c))
                    keep.append(i)
            pdf = pdf.iloc[keep].copy()
            pdf[geometry_col] = out
            yield pdf

    return df.mapInPandas(run, df.schema)


def ogrinfo(spark: SparkSession, src, layer: str | None = None,
            geometry_col: str = "geometry", summary: bool = True) -> dict:
    """ogrinfo -so (gdal/apps/ogrinfo.cpp): layer summary — feature
    count, extent, geometry type histogram, field schema. One distributed
    pass (count + envelope aggregate + type histogram in a single job)."""
    df = read_vector(spark, src, layer=layer)
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields
              if f.name != geometry_col]
    info: dict = {"fields": fields, "geometry_column":
                  geometry_col if geometry_col in df.columns else None}
    if not summary:
        return info
    if geometry_col in df.columns:
        def env(wkb: pd.Series) -> pd.DataFrame:
            n = len(wkb)
            cols = {k: np.full(n, np.nan) for k in ("x0", "y0", "x1", "y1")}
            for i, b in enumerate(wkb):
                if b is None:
                    continue
                bb = FMT._wkb_bbox(bytes(b))
                for k, v in zip(("x0", "y0", "x1", "y1"), bb):
                    cols[k][i] = v
            return pd.DataFrame(cols)

        def gname(wkb: pd.Series) -> pd.Series:
            from gdal_spark.functions.ogr_sql import _geometry_fn
            return _geometry_fn(wkb)

        env_udf = F.pandas_udf(
            env, "struct<x0:double,y0:double,x1:double,y1:double>")
        with_env = df.select(
            env_udf(F.col(geometry_col)).alias("e"),
            F.pandas_udf(gname, "string")(F.col(geometry_col)).alias("g"))
        agg = with_env.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("e.x0").alias("xmin"), F.min("e.y0").alias("ymin"),
            F.max("e.x1").alias("xmax"), F.max("e.y1").alias("ymax"),
            *[F.sum((F.col("g") == t).cast("long")).alias(f"t_{t}")
              for t in ("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
                        "MULTILINESTRING", "MULTIPOLYGON")]).collect()[0]
        info["feature_count"] = agg["n"]
        info["extent"] = [agg["xmin"], agg["ymin"], agg["xmax"], agg["ymax"]]
        info["geometry_types"] = {t: int(agg[f"t_{t}"])
                                  for t in ("POINT", "LINESTRING", "POLYGON",
                                            "MULTIPOINT", "MULTILINESTRING",
                                            "MULTIPOLYGON")
                                  if agg[f"t_{t}"]}
    else:
        info["feature_count"] = df.count()
    return info


# ---------------------------------------------------------------------------
# small utility apps: gdal2xyz / gdalcompare / gdalmove / pct2rgb /
# mkgraticule / ogrtindex
# ---------------------------------------------------------------------------

def gdal2xyz(tiles: DataFrame, meta: RasterMeta, band: int = 0,
             srcwin: tuple[int, int, int, int] | None = None,
             skip: int = 1) -> DataFrame:
    """gdal2xyz.py (gdal/swig/python/scripts/gdal2xyz.py:126-170): one row
    per sampled pixel with geotransformed CENTER coordinates
    ``geo = gt[0] + (x+0.5)*gt[1] + (y+0.5)*gt[2]``; ``skip`` subsamples
    relative to the window origin; window defaults to the full raster.
    Distributed: per-tile pixel explode in one Arrow pass, no shuffle.
    (The reference emits all pixels including zeros; the sparse block
    model stores only materialized blocks, so absent blocks — all
    background — are not emitted.  Callers needing dense export write
    from a densified raster.)"""
    from gdal_spark.raster import model as RM

    x0, y0, w, h = srcwin or (0, 0, meta.width, meta.height)
    g = meta.gt
    px = RM.nonzero_pixels(tiles, meta, band=band)
    win = px.filter((F.col("px") >= x0) & (F.col("px") < x0 + w)
                    & (F.col("py") >= y0) & (F.col("py") < y0 + h)
                    & ((F.col("px") - x0) % skip == 0)
                    & ((F.col("py") - y0) % skip == 0))
    geo_x = F.lit(g[0]) + (F.col("px") + 0.5) * g[1] + (F.col("py") + 0.5) * g[2]
    geo_y = F.lit(g[3]) + (F.col("px") + 0.5) * g[4] + (F.col("py") + 0.5) * g[5]
    return win.select(geo_x.alias("geo_x"), geo_y.alias("geo_y"), "val")


def gdalcompare(tiles1: DataFrame, meta1: RasterMeta,
                tiles2: DataFrame, meta2: RasterMeta) -> dict:
    """gdalcompare.py (gdal/swig/python/scripts/gdalcompare.py): count the
    differences between two rasters — size, geotransform, dtype, nodata,
    and per-band checksum (the reference's primary pixel comparison).
    Checksums run distributed; everything else is header metadata."""
    from gdal_spark.raster import checksum as CK

    found = 0
    report: dict = {}
    if (meta1.width, meta1.height) != (meta2.width, meta2.height):
        report["size"] = [(meta1.width, meta1.height),
                          (meta2.width, meta2.height)]
        found += 1
    if tuple(meta1.gt) != tuple(meta2.gt):
        report["geotransform"] = [list(meta1.gt), list(meta2.gt)]
        found += 1
    if meta1.dtype != meta2.dtype:
        report["dtype"] = [meta1.dtype, meta2.dtype]
        found += 1
    if meta1.nodata != meta2.nodata:
        report["nodata"] = [meta1.nodata, meta2.nodata]
        found += 1
    c1 = {r["band"]: r["checksum"]
          for r in CK.checksum(tiles1, meta1).collect()}
    c2 = {r["band"]: r["checksum"]
          for r in CK.checksum(tiles2, meta2).collect()}
    if c1 != c2:
        report["checksum"] = [c1, c2]
        found += 1
    report["differences"] = found
    return report


def gdalmove(meta: RasterMeta, affine: tuple[float, float, float,
                                             float, float, float]) -> RasterMeta:
    """gdalmove.py: rewrite the geotransform by composing an affine
    (xoff, s1, s2, yoff, s4, s5) — header-only, pixels untouched
    (gdal/swig/python/scripts/gdalmove.py:12-160 fits the affine from
    transformed corners; here the caller supplies it directly)."""
    g = meta.gt
    new_gt = (
        affine[0] + affine[1] * g[0] + affine[2] * g[3],
        affine[1] * g[1] + affine[2] * g[4],
        affine[1] * g[2] + affine[2] * g[5],
        affine[3] + affine[4] * g[0] + affine[5] * g[3],
        affine[4] * g[1] + affine[5] * g[4],
        affine[4] * g[2] + affine[5] * g[5],
    )
    return replace(meta, gt=new_gt)


def pct2rgb(tiles: DataFrame, meta: RasterMeta, palette: np.ndarray,
            out_id: str | None = None) -> tuple[DataFrame, RasterMeta]:
    """pct2rgb.py: expand a palette-index band to 3 RGB bands via the
    color-table LUT (gdal/swig/python/scripts/pct2rgb.py:73-107 —
    ``lookup[band].take(index_array)`` per channel).  One Arrow pass,
    3 output rows per input block, no shuffle."""
    from gdal_spark.raster.model import TILE_SCHEMA

    pal = np.asarray(palette, dtype=np.uint8)
    rid = out_id or (meta.raster_id + "_rgb")
    dtype = meta.dtype

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                idx = np.frombuffer(bytes(r.data), dtype=dtype).reshape(
                    r.h, r.w).astype(np.int64)
                idx = np.clip(idx, 0, len(pal) - 1)
                for b in range(3):
                    rows.append((rid, b, r.bx, r.by, r.w, r.h,
                                 pal[idx, b].astype(np.uint8).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              TILE_SCHEMA.fields])

    out_meta = replace(meta, raster_id=rid, dtype="uint8")
    return tiles.mapInPandas(run, schema=TILE_SCHEMA), out_meta


def mkgraticule(spark: SparkSession, step: float = 5.0,
                lon_min: float = -180.0, lon_max: float = 180.0,
                lat_min: float = -90.0, lat_max: float = 90.0,
                densify: float = 1.0) -> DataFrame:
    """mkgraticule.py: graticule polylines every ``step`` degrees,
    densified so reprojection bends them smoothly.  Pure generator —
    rows (kind, value, wkb)."""
    rows = []
    v = lon_min
    while v <= lon_max + 1e-9:
        lats = np.arange(lat_min, lat_max + densify / 2, densify)
        coords = np.column_stack([np.full(len(lats), v), lats])
        rows.append(("meridian", float(v),
                     bytearray(G.encode_linestring(coords))))
        v += step
    v = lat_min
    while v <= lat_max + 1e-9:
        lons = np.arange(lon_min, lon_max + densify / 2, densify)
        coords = np.column_stack([lons, np.full(len(lons), v)])
        rows.append(("parallel", float(v),
                     bytearray(G.encode_linestring(coords))))
        v += step
    return spark.createDataFrame(rows, "kind string, value double, wkb binary")


def ogrtindex(spark: SparkSession, paths: list[str],
              geometry_col: str = "geometry") -> DataFrame:
    """ogrtindex (gdal/apps/ogrtindex.cpp): one envelope polygon per
    vector file — the pruning manifest for layer-partitioned reads,
    mirroring gdaltindex for rasters.  Envelopes aggregate distributed
    per file; only the per-file summary row returns."""
    out = []
    for path in paths:
        df = read_vector(spark, path)
        def envs(wkb: pd.Series) -> pd.DataFrame:
            vals = [G.geometry_envelope(bytes(w)) for w in wkb]
            return pd.DataFrame(vals, columns=["x0", "y0", "x1", "y1"])

        env_udf = F.pandas_udf(
            envs, "x0 double, y0 double, x1 double, y1 double")
        agg = (df.select(env_udf(F.col(geometry_col)).alias("e"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.min("e.x0").alias("x0"), F.min("e.y0").alias("y0"),
                    F.max("e.x1").alias("x1"), F.max("e.y1").alias("y1"))
               .collect()[0])
        ring = np.array([[agg["x0"], agg["y0"]], [agg["x1"], agg["y0"]],
                         [agg["x1"], agg["y1"]], [agg["x0"], agg["y1"]],
                         [agg["x0"], agg["y0"]]])
        out.append((path, int(agg["n"]),
                    bytearray(G.encode_polygon([ring]))))
    return spark.createDataFrame(out, "location string, n long, wkb binary")


def gdaltransform(df: DataFrame, transform, x: str = "x", y: str = "y",
                  inverse: bool = False,
                  out_x: str = "tx", out_y: str = "ty") -> DataFrame:
    """gdaltransform (gdal/apps/gdaltransform.cpp): batch point
    reprojection. The CLI reads stdin points through one transformer;
    here the same picklable transform (GenImgProjTransform / CRS class /
    GCP / TPS / RPC / geoloc) maps whole Arrow batches per partition —
    a narrow map over any number of rows, no shuffle."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_x} double, {out_y} double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs = pdf[x].to_numpy(dtype=np.float64)
            ys = pdf[y].to_numpy(dtype=np.float64)
            if hasattr(transform, "forward") and not inverse:
                ox, oy = transform.forward(xs, ys)
            elif hasattr(transform, "inverse") and inverse:
                ox, oy = transform.inverse(xs, ys)
            else:
                ox, oy = transform(xs, ys)
            out = pdf.copy()
            out[out_x] = ox
            out[out_y] = oy
            yield out

    return df.mapInPandas(run, schema=schema)


def gcps2wld(gcps) -> tuple[float, float, float, float, float, float]:
    """gcps2wld.py: fit a world file (ESRI .wld line order: xpixel,
    yline-rot, xcol-rot, ypixel, x-origin-center, y-origin-center) from
    GCPs via the first-order geotransform fit."""
    from gdal_spark.functions.srs import gcps_to_geotransform
    gt = gcps_to_geotransform(gcps)
    if gt is None:
        raise ValueError("cannot fit a geotransform to these GCPs")
    return (gt[1], gt[4], gt[2], gt[5],
            gt[0] + 0.5 * gt[1] + 0.5 * gt[2],
            gt[3] + 0.5 * gt[4] + 0.5 * gt[5])


def gdalsrsinfo(crs) -> dict:
    """gdalsrsinfo (gdal/apps/gdalsrsinfo.cpp -o all): report the CRS in
    the engine's supported output encodings."""
    from gdal_spark.functions.srs import crs_to_wkt
    wkt = crs_to_wkt(crs)
    name = getattr(crs, "name", type(crs).__name__)
    return {"wkt": wkt, "proj_class": name,
            "is_geographic": name in ("geographic", "Geographic")}
