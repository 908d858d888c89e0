"""gdal2tiles-style XYZ / WebMercator raster tile pyramids, end to end.

Reference: gdal/swig/python/scripts/gdal2tiles.py — open_input warps the
source to EPSG:3857 (:709 via AutoCreateWarpedVRT), base tiles at tmaxz
resample the source window per (tx, ty) (:1155-1260, geo_query :1405-1446,
scale_query_to_tile :1451-1490), overview zooms build each tile from its 4
children (:1313-1400), zoom range from the pixel size (:979-984).

Distributed composition of existing engine pieces:
1. base zoom: one :func:`resample.warp` onto the global WebMercator pixel
   grid at ``zmax`` (256·2^z px world), with dst key generation bounded to
   the source extent (block == tile: block size 256 ⇒ (bx, by) IS the XYZ
   (tx, ty_google) address);
2. overviews: iterated :func:`pyramid.overview_level` — exactly the
   4-children groupBy reduce of the reference's overview pass.

Tile addressing: the world grid's block (bx, by) equals the XYZ/google
tile (x, y) at that zoom (y down from the north — gdal2tiles' GoogleTile
flip is built into the grid's north-up geotransform). TMS ty = 2^z-1-y.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions import tiles as TM
from gdal_spark.raster import pyramid as PY
from gdal_spark.raster import resample as RS
from gdal_spark.raster.model import RasterMeta


def world_meta(zoom: int, raster_id: str, dtype: str = "uint8",
               nodata: float | None = 0.0) -> RasterMeta:
    """Global WebMercator raster at ``zoom``: 256·2^z square, north-up,
    origin at the top-left (-OS, +OS) — block (bx, by) = XYZ tile (x, y)."""
    size = 256 * (1 << zoom)
    res = TM.py_resolution(zoom)
    return RasterMeta(raster_id, size, size,
                      gt=(-TM.ORIGIN_SHIFT, res, 0.0, TM.ORIGIN_SHIFT, 0.0, -res),
                      dtype=dtype, nodata=nodata, block=256)


def zoom_for_meta(src_meta: RasterMeta) -> int:
    """Max-zoom pick from the source pixel size (gdal2tiles
    ZoomForPixelSize, :979-984) — source assumed in mercator meters."""
    return TM.py_zoom_for_pixel_size(abs(src_meta.gt[1]))


def geodetic_world_meta(zoom: int, raster_id: str, dtype: str = "uint8",
                        nodata: float | None = 0.0) -> RasterMeta:
    """Global plate-carrée raster at ``zoom`` (gdal2tiles -profile
    geodetic, tmscompatible layout: 2x1 tiles at z0 covering
    [-180,180]x[-90,90]); block (bx, by) = geodetic tile (x, google-y)."""
    res = TM.py_geodetic_resolution(zoom)
    return RasterMeta(raster_id, 2 * 256 * (1 << zoom), 256 * (1 << zoom),
                      gt=(-180.0, res, 0.0, 90.0, 0.0, -res),
                      dtype=dtype, nodata=nodata, block=256)


def geodetic_tile_range(src_meta: RasterMeta,
                        zoom: int) -> tuple[int, int, int, int]:
    """(x0, y0, x1, y1) google-y geodetic tile window for a lon/lat source."""
    xs = [src_meta.gt[0], src_meta.gt[0] + src_meta.width * src_meta.gt[1]]
    ys = [src_meta.gt[3], src_meta.gt[3] + src_meta.height * src_meta.gt[5]]
    res = TM.py_geodetic_resolution(zoom)
    px = [(x + 180.0) / res for x in xs]
    py = [(90.0 - y) / res for y in ys]
    eps = 1e-6
    x0 = max(int(math.floor(min(px) / 256 + eps)), 0)
    x1 = min(int(math.ceil(max(px) / 256 - eps)) - 1, 2 * (1 << zoom) - 1)
    y0 = max(int(math.floor(min(py) / 256 + eps)), 0)
    y1 = min(int(math.ceil(max(py) / 256 - eps)) - 1, (1 << zoom) - 1)
    return x0, y0, max(x1, x0), max(y1, y0)


def tile_range(src_meta: RasterMeta, zoom: int) -> tuple[int, int, int, int]:
    """(x0, y0, x1, y1) google-y tile window covering the source extent."""
    xs = [src_meta.gt[0], src_meta.gt[0] + src_meta.width * src_meta.gt[1]]
    ys = [src_meta.gt[3], src_meta.gt[3] + src_meta.height * src_meta.gt[5]]
    res = TM.py_resolution(zoom)
    px = [(x + TM.ORIGIN_SHIFT) / res for x in xs]
    py = [(TM.ORIGIN_SHIFT - y) / res for y in ys]   # google y: down from N
    # epsilon guards: extents on exact tile boundaries must not bleed into
    # the neighbor tile through fp rounding of the geotransform arithmetic
    eps = 1e-6
    x0 = max(int(math.floor(min(px) / 256 + eps)), 0)
    x1 = min(int(math.ceil(max(px) / 256 - eps)) - 1, (1 << zoom) - 1)
    y0 = max(int(math.floor(min(py) / 256 + eps)), 0)
    y1 = min(int(math.ceil(max(py) / 256 - eps)) - 1, (1 << zoom) - 1)
    return x0, y0, max(x1, x0), max(y1, y0)


def build_xyz_pyramid(src_tiles: DataFrame, src_meta: RasterMeta,
                      zmin: int, zmax: int | None = None,
                      base_method: str = "average",
                      overview_method: str = "average",
                      profile: str = "mercator"
                      ) -> list[tuple[int, DataFrame, RasterMeta]]:
    """[(zoom, tiles_df, meta)] from zmax down to zmin. Source must be in
    the profile's CRS — WebMercator meters for ``profile="mercator"``,
    lon/lat degrees for ``profile="geodetic"`` (gdal2tiles -profile;
    warp with a transform first otherwise). Block rows are the tiles:
    raster_id f"z{z}", (bx, by) = XYZ (x, y)."""
    if zmax is None:
        zmax = zoom_for_meta(src_meta)
    levels = []
    if profile == "mercator":
        wmeta = world_meta(zmax, f"z{zmax}", dtype=src_meta.dtype,
                           nodata=src_meta.nodata)
        win = tile_range(src_meta, zmax)
    elif profile == "geodetic":
        wmeta = geodetic_world_meta(zmax, f"z{zmax}", dtype=src_meta.dtype,
                                    nodata=src_meta.nodata)
        win = geodetic_tile_range(src_meta, zmax)
    else:
        raise ValueError(f"unsupported profile {profile!r}")
    base = RS.warp(src_tiles, src_meta, wmeta, method=base_method,
                   dst_window=win)
    levels.append((zmax, base, wmeta))
    cur, cur_meta = base, wmeta
    for z in range(zmax - 1, zmin - 1, -1):
        cur, cur_meta = PY.overview_level(cur, cur_meta, f"z{z}",
                                          method=overview_method)
        levels.append((z, cur, cur_meta))
    return levels


def write_xyz_png(levels, out_dir: str,
                  dtypes_ok: tuple = ("uint8",)) -> DataFrame:
    """Materialize a pyramid as gdal2tiles' on-disk layout —
    ``{out_dir}/{z}/{x}/{y}.png`` — with the pure-numpy PNG encoder
    (raster/imagecodec.py), fully distributed: each executor partition
    encodes and writes its own tiles (``out_dir`` must be a shared
    filesystem on a real cluster, exactly like gdal2tiles' target dir),
    the driver never sees pixel bytes. 1 band → gray PNG, 3 bands → RGB.
    Edge tiles are padded to the full 256² with the nodata value (0 when
    unset), matching the reference's fixed tile size (gdal2tiles.py
    :1451-1490). Returns the written-file manifest (zoom, x, y, path,
    n_bytes) — the resume/skip listing (:1200-1205)."""
    import os

    import pandas as pd

    from gdal_spark.raster import imagecodec as IC

    outs = []
    for z, df, meta in levels:
        if meta.dtype not in dtypes_ok:
            raise ValueError(f"PNG tiles need dtype in {dtypes_ok}, "
                             f"got {meta.dtype} at z{z}")
        fill = int(meta.nodata) if meta.nodata is not None else 0
        block, dt = meta.block, meta.dtype

        def make_render(_z, _fill, _block, _dt):
            def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
                import numpy as np
                x, y = int(key[0]), int(key[1])
                bands = {}
                for r in pdf.itertuples(index=False):
                    tile = np.full((_block, _block), _fill, dtype=_dt)
                    a = np.frombuffer(bytes(r.data), dtype=_dt
                                      ).reshape(r.h, r.w)
                    tile[:r.h, :r.w] = a
                    bands[int(r.band)] = tile
                if len(bands) >= 3:
                    img = np.stack([bands[b] for b in sorted(bands)[:3]],
                                   axis=-1)
                else:
                    img = bands[sorted(bands)[0]]
                payload = IC.png_encode(img.astype(np.uint8))
                d = os.path.join(out_dir, str(_z), str(x))
                os.makedirs(d, exist_ok=True)
                path = os.path.join(d, f"{y}.png")
                with open(path, "wb") as fh:
                    fh.write(payload)
                return pd.DataFrame([(_z, x, y, path, len(payload))],
                                    columns=["zoom", "x", "y", "path",
                                             "n_bytes"])
            return render

        outs.append(df.groupBy("bx", "by").applyInPandas(
            make_render(z, fill, block, dt),
            schema="zoom int, x int, y int, path string, n_bytes long"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def tile_manifest(levels) -> DataFrame:
    """(zoom, x, y, tms_y, quadkey) rows for every produced tile — the
    gdal2tiles output listing / resume manifest shape."""
    outs = []
    for z, df, _meta in levels:
        d = (df.select(F.lit(z).alias("zoom"),
                       F.col("bx").alias("x"), F.col("by").alias("y")))
        tms = F.lit((1 << z) - 1) - F.col("y")
        d = d.select("zoom", "x", "y", tms.alias("tms_y"),
                     TM.quadkey(F.col("x"), tms, z).alias("quadkey"))
        outs.append(d)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
