"""Overview / tile-pyramid reduction for block-row rasters.

Reference: GDALRegenerateOverviews average path (gdal/gcore/overview.cpp:
206-501 — integer types accumulate in int and round half-up:
``(total + count/2) / count``, 2×2 fast path ``(total + 2) / 4``,
overview.cpp:340-355) and the gdal2tiles overview pass that builds zoom
z-1 tiles from 4 children (gdal/swig/python/scripts/gdal2tiles.py:
1313-1400).

Spark shape: one overview level = ``groupBy(bx//2, by//2)`` + a 4-child
mosaic-downsample kernel — a narrow shuffle whose key count shrinks 4× per
level. Iterating levels gives the full pyramid. Determinism: each child
lands in a fixed quadrant of the 2B×2B mosaic, so the reduction is
order-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.model import BLOCK, TILE_SCHEMA, RasterMeta


def downsample2x_average(arr: np.ndarray,
                         nodata: float | None = None) -> np.ndarray:
    """Exact reference average-2x2: integer accumulate, (sum + n/2) / n
    (overview.cpp:340-355 fast path / :379-395 general). Odd edges fall
    back to 1x2 / 2x1 / 1x1 boxes with the same rounding. With ``nodata``
    set, nodata source pixels are excluded and an all-nodata box emits
    nodata (overview.cpp:360-382 pabyChunkNodataMask path)."""
    h, w = arr.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    if arr.dtype.kind in "ui":
        acc = np.zeros((oh, ow), dtype=np.int64)
        cnt = np.zeros((oh, ow), dtype=np.int64)
        for dy in (0, 1):
            for dx in (0, 1):
                sub = arr[dy::2, dx::2].astype(np.int64)
                valid = (sub != int(nodata)) if nodata is not None \
                    else np.ones(sub.shape, dtype=bool)
                acc[:sub.shape[0], :sub.shape[1]] += np.where(valid, sub, 0)
                cnt[:sub.shape[0], :sub.shape[1]] += valid
        empty = cnt == 0
        cnt1 = np.where(empty, 1, cnt)
        # C truncating division (reference: (nTotal + nCount/2)/nCount
        # truncates toward zero) — floor division would round signed
        # negative box sums off-by-one (e.g. int16 DEMs).
        num = acc + cnt1 // 2
        q = num // cnt1
        q += (num < 0) & (num % cnt1 != 0)
        if nodata is not None:
            q = np.where(empty, int(nodata), q)
        return q.astype(arr.dtype)
    acc = np.zeros((oh, ow), dtype=np.float64)
    cnt = np.zeros((oh, ow), dtype=np.int64)
    for dy in (0, 1):
        for dx in (0, 1):
            sub = arr[dy::2, dx::2].astype(np.float64)
            valid = (sub != nodata) if nodata is not None \
                else np.ones(sub.shape, dtype=bool)
            acc[:sub.shape[0], :sub.shape[1]] += np.where(valid, sub, 0.0)
            cnt[:sub.shape[0], :sub.shape[1]] += valid
    empty = cnt == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        out = acc / np.where(empty, 1, cnt)
    if nodata is not None:
        out = np.where(empty, nodata, out)
    return out.astype(arr.dtype)


def downsample2x_nearest(arr: np.ndarray) -> np.ndarray:
    """NEAREST overview: top-left sample of each 2x2 box
    (overview.cpp NEAREST path takes nSrcXOff sample)."""
    return arr[::2, ::2].copy()


def _best_entries(pal: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """Nearest color-table entry per RGB row (GDALFindBestEntry,
    overview.cpp:180-198: squared RGB distance, first minimum wins)."""
    d = ((rgb[:, None, :].astype(np.int64)
          - pal[None, :, :].astype(np.int64)) ** 2).sum(2)
    return d.argmin(1)


def downsample2x_average_palette(arr: np.ndarray,
                                 pal: np.ndarray) -> np.ndarray:
    """AVERAGE overview of a palette band (overview.cpp:396-427): average
    the color-table RGB of in-range indices per 2x2 box with the
    (total + count/2)/count integer rounding, then requantize to the
    nearest table entry."""
    pal = np.asarray(pal, np.int64)[:, :3]
    h, w = arr.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    tot = np.zeros((oh, ow, 3), dtype=np.int64)
    cnt = np.zeros((oh, ow), dtype=np.int64)
    for dy in (0, 1):
        for dx in (0, 1):
            sub = arr[dy::2, dx::2].astype(np.int64)
            ok = (sub >= 0) & (sub < len(pal))
            rgb = pal[np.clip(sub, 0, len(pal) - 1)]
            tot[:sub.shape[0], :sub.shape[1]] += np.where(ok[..., None],
                                                          rgb, 0)
            cnt[:sub.shape[0], :sub.shape[1]] += ok
    cnt1 = np.where(cnt == 0, 1, cnt)
    n = (tot + (cnt1 // 2)[..., None]) // cnt1[..., None]
    out = _best_entries(pal, n.reshape(-1, 3)).reshape(oh, ow)
    out = np.where(cnt == 0, 0, out)
    return out.astype(arr.dtype)


def downsample2x_average_complex(arr: np.ndarray) -> np.ndarray:
    """Complex AVERAGE (GDALResampleChunkC32R "AVER" branch,
    overview.cpp:1894-1920): per-component double accumulate, float32
    cast per component on store."""
    h, w = arr.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    acc = np.zeros((oh, ow), dtype=np.complex128)
    cnt = np.zeros((oh, ow), dtype=np.int64)
    for dy in (0, 1):
        for dx in (0, 1):
            sub = arr[dy::2, dx::2].astype(np.complex128)
            acc[:sub.shape[0], :sub.shape[1]] += sub
            cnt[:sub.shape[0], :sub.shape[1]] += 1
    return (acc / cnt).astype(np.complex64)


def downsample2x_magphase(arr: np.ndarray) -> np.ndarray:
    """AVERAGE_MAGPHASE (GDALResampleChunkC32R, overview.cpp:1848-1892):
    the stored value is the per-component mean rescaled so its magnitude
    equals the mean of the source magnitudes — phase of the vector mean,
    magnitude of the scalar-mean. Cast order mirrors the reference: the
    component means are stored float32 first, the magnitude/ratio math
    runs in double on those float32 values, and the final scale is a
    float32 multiply."""
    h, w = arr.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    acc_r = np.zeros((oh, ow), dtype=np.float64)
    acc_i = np.zeros((oh, ow), dtype=np.float64)
    acc_m = np.zeros((oh, ow), dtype=np.float64)
    cnt = np.zeros((oh, ow), dtype=np.int64)
    for dy in (0, 1):
        for dx in (0, 1):
            sub = arr[dy::2, dx::2].astype(np.complex128)
            acc_r[:sub.shape[0], :sub.shape[1]] += sub.real
            acc_i[:sub.shape[0], :sub.shape[1]] += sub.imag
            acc_m[:sub.shape[0], :sub.shape[1]] += np.abs(sub)
            cnt[:sub.shape[0], :sub.shape[1]] += 1
    mean_r = (acc_r / cnt).astype(np.float32)
    mean_i = (acc_i / cnt).astype(np.float32)
    mag = np.sqrt(mean_r.astype(np.float64) ** 2
                  + mean_i.astype(np.float64) ** 2)
    desired = acc_m / cnt
    ratio = np.where(mag != 0.0, desired / mag, 1.0).astype(np.float32)
    out_r = (mean_r * ratio).astype(np.float32)
    out_i = (mean_i * ratio).astype(np.float32)
    return (out_r.astype(np.complex64)
            + 1j * out_i.astype(np.complex64)).astype(np.complex64)


def downsample2x_mode(arr: np.ndarray) -> np.ndarray:
    """MODE overview (GDALResampleChunk32R_Mode, overview.cpp:767-940):
    majority value of each 2x2 box with the reference's first-to-attain
    tie rule (`++count > max` switches the winner only on strict
    increase). For a 2x2 scan (a b / c d) that enumerates to a closed
    form; degenerate 1x2/2x1/1x1 edge boxes always keep their first
    (top-left) sample, because a count of 1 never exceeds the max of 1."""
    h, w = arr.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    out = np.empty((oh, ow), dtype=arr.dtype)
    fh, fw = h // 2, w // 2
    a = arr[0:2 * fh:2, 0:2 * fw:2]
    b = arr[0:2 * fh:2, 1:2 * fw:2]
    c = arr[1:2 * fh:2, 0:2 * fw:2]
    d = arr[1:2 * fh:2, 1:2 * fw:2]
    out[:fh, :fw] = np.where(
        (b == a) | (c == a), a,
        np.where(c == b, b,
                 np.where(d == a, a,
                          np.where(d == b, b, np.where(d == c, c, a)))))
    if ow > fw:
        out[:fh, fw] = arr[0:2 * fh:2, 2 * fw]
    if oh > fh:
        out[fh, :fw] = arr[2 * fh, 0:2 * fw:2]
    if ow > fw and oh > fh:
        out[fh, fw] = arr[2 * fh, 2 * fw]
    return out


# binomial 3x3 gauss matrix for a /2 overview (overview.cpp:509-575;
# larger 5x5/7x7 matrices apply only to >2x ratios, which the /2 overview
# chain never produces)
GAUSS_3X3 = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])


def overview_level(tiles: DataFrame, meta: RasterMeta, out_id: str,
                   method: str = "average",
                   nodata: float | None = None,
                   palette: np.ndarray | None = None
                   ) -> tuple[DataFrame, RasterMeta]:
    """One /2 overview level. Returns (tiles_df, out_meta).

    ``nodata``: pass the band's nodata to replicate gdaladdo on a
    nodata-carrying band (average skips nodata inputs, all-nodata boxes
    stay nodata — overview.cpp:360-382). Kept explicit rather than read
    from ``meta`` so existing no-masking pipelines are unchanged.

    ``palette``: (N,3) color table for a palette-index band — AVERAGE and
    GAUSS then average RGB through the table and requantize to the
    nearest entry (overview.cpp palette branches + GDALFindBestEntry);
    NEAREST passes indices through untouched."""
    if method == "gauss":
        return _overview_gauss(tiles, meta, out_id, palette=palette)
    if method not in ("average", "nearest", "mode", "average_magphase",
                      "average_bit2grayscale",
                      "average_bit2grayscale_miniswhite"):
        raise ValueError(f"unsupported method {method!r}")
    out_meta = meta.scaled(out_id, 2)
    dtype, block = meta.dtype, meta.block
    ow_full, oh_full = out_meta.width, out_meta.height
    is_complex = np.dtype(dtype).kind == "c"
    if method == "average_magphase" and not is_complex:
        raise ValueError("average_magphase applies to complex rasters "
                         "(GDT_C*; overview.cpp:1848)")

    def _b2g(arr: np.ndarray) -> np.ndarray:
        # 1-bit → 8-bit grayscale promotion before averaging
        # (overview.cpp:2339-2373: value 1 → 255; MINISWHITE swaps 0/255)
        out = arr.copy()
        out[arr == 1] = 255
        return downsample2x_average(out)

    def _b2g_mw(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        out[arr == 1] = 0
        out[arr == 0] = 255
        return downsample2x_average(out)

    if palette is not None and method == "average":
        avg = lambda a: downsample2x_average_palette(a, palette)
    elif is_complex:
        avg = downsample2x_average_complex
    else:
        avg = lambda a: downsample2x_average(a, nodata)
    down = {"average": avg,
            "nearest": downsample2x_nearest,
            "mode": downsample2x_mode,
            "average_magphase": downsample2x_magphase,
            "average_bit2grayscale": _b2g,
            "average_bit2grayscale_miniswhite": _b2g_mw}[method]

    keyed = tiles.withColumn("obx", F.floor(F.col("bx") / 2).cast("int")) \
                 .withColumn("oby", F.floor(F.col("by") / 2).cast("int"))

    def reduce_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, obx, oby = key
        # mosaic up to 4 children into their fixed quadrants
        mw = min(2 * block, meta.width - obx * 2 * block)
        mh = min(2 * block, meta.height - oby * 2 * block)
        mosaic = np.zeros((mh, mw), dtype=dtype)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            qx = (r.bx - obx * 2) * block
            qy = (r.by - oby * 2) * block
            mosaic[qy:qy + r.h, qx:qx + r.w] = sub
        out = down(mosaic)
        w = min(block, ow_full - obx * block)
        h = min(block, oh_full - oby * block)
        out = out[:h, :w]
        return pd.DataFrame([(out_id, band, int(obx), int(oby),
                              int(out.shape[1]), int(out.shape[0]),
                              out.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = (keyed.groupBy("raster_id", "band", "obx", "oby")
           .applyInPandas(reduce_group, schema=TILE_SCHEMA))
    return out, out_meta


def _overview_gauss(tiles: DataFrame, meta: RasterMeta,
                    out_id: str,
                    palette: np.ndarray | None = None
                    ) -> tuple[DataFrame, RasterMeta]:
    """GAUSS /2 overview (GDALResampleChunk32R_Gauss, overview.cpp:509-700):
    each dst pixel g convolves source window [2g, 2g+3) with the binomial
    3x3 matrix, normalizing by the sum of in-raster weights at edges.

    The 1-px overhang means a parent block needs its 2x2 children plus one
    extra source row/col: source blocks on an even block row/col are
    therefore shipped to the parent above/left as well (≤4 parents for a
    corner block) — still a shrinking groupBy shuffle, no extra pass."""
    out_meta = meta.scaled(out_id, 2)
    dtype, block = meta.dtype, meta.block
    ow_full, oh_full = out_meta.width, out_meta.height
    W, H = meta.width, meta.height

    def parents(col):
        half = F.floor(F.col(col) / 2).cast("int")
        return F.when(F.col(col) % 2 == 0,
                      F.array(half, (half - 1).cast("int"))
                      ).otherwise(F.array(half))

    keyed = (tiles.withColumn("obx", F.explode(parents("bx")))
             .filter(F.col("obx") >= 0)
             .withColumn("oby", F.explode(parents("by")))
             .filter(F.col("oby") >= 0))

    def reduce_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, obx, oby = key
        wx0, wy0 = obx * 2 * block, oby * 2 * block
        ww = min(2 * block + 1, W - wx0)
        wh = min(2 * block + 1, H - wy0)
        V = np.zeros((wh, ww), dtype=np.float64)
        Mk = np.zeros((wh, ww), dtype=np.float64)
        for r in pdf.itertuples(index=False):
            sub = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
            qx, qy = r.bx * block - wx0, r.by * block - wy0
            cw, ch = min(r.w, ww - qx), min(r.h, wh - qy)
            if cw <= 0 or ch <= 0:
                continue
            V[qy:qy + ch, qx:qx + cw] = sub[:ch, :cw]
            Mk[qy:qy + ch, qx:qx + cw] = 1.0
        ow = min(block, ow_full - obx * block)
        oh = min(block, oh_full - oby * block)
        VP = np.zeros((2 * oh + 1, 2 * ow + 1))
        MP = np.zeros_like(VP)
        ch, cw = min(wh, 2 * oh + 1), min(ww, 2 * ow + 1)
        VP[:ch, :cw] = V[:ch, :cw]
        MP[:ch, :cw] = Mk[:ch, :cw]
        if palette is not None:
            # palette branch (overview.cpp:699-747): weight the table RGB
            # of in-range indices, integer-round, requantize
            pal = np.asarray(palette, np.int64)[:, :3]
            tot = np.zeros((oh, ow, 3), dtype=np.int64)
            wsum = np.zeros((oh, ow), dtype=np.int64)
            for j in range(3):
                for i in range(3):
                    wgt = int(GAUSS_3X3[j, i])
                    sub = VP[j:j + 2 * oh:2, i:i + 2 * ow:2].astype(np.int64)
                    ok = ((MP[j:j + 2 * oh:2, i:i + 2 * ow:2] > 0)
                          & (sub >= 0) & (sub < len(pal)))
                    rgb = pal[np.clip(sub, 0, len(pal) - 1)]
                    tot += np.where(ok[..., None], rgb, 0) * wgt
                    wsum += ok * wgt
            w1 = np.where(wsum == 0, 1, wsum)
            n = (tot + (w1 // 2)[..., None]) // w1[..., None]
            idx = _best_entries(pal, n.reshape(-1, 3)).reshape(oh, ow)
            out = np.where(wsum == 0, 0, idx).astype(dtype)
            return pd.DataFrame([(out_id, band, int(obx), int(oby),
                                  ow, oh, out.tobytes())],
                                columns=["raster_id", "band", "bx", "by",
                                         "w", "h", "data"])
        acc = np.zeros((oh, ow))
        cnt = np.zeros((oh, ow))
        for j in range(3):
            for i in range(3):
                wgt = GAUSS_3X3[j, i]
                acc += wgt * VP[j:j + 2 * oh:2, i:i + 2 * ow:2]
                cnt += wgt * MP[j:j + 2 * oh:2, i:i + 2 * ow:2]
        # reference computes a float32 scanline, the band write converts
        val = np.where(cnt > 0, acc / np.where(cnt > 0, cnt, 1.0),
                       0.0).astype(np.float32)
        if np.dtype(dtype).kind in "ui":
            info = np.iinfo(dtype)
            out = np.clip(np.floor(val + 0.5), info.min, info.max).astype(dtype)
        else:
            out = val.astype(dtype)
        return pd.DataFrame([(out_id, band, int(obx), int(oby),
                              int(out.shape[1]), int(out.shape[0]),
                              out.tobytes())],
                            columns=["raster_id", "band", "bx", "by",
                                     "w", "h", "data"])

    out = (keyed.groupBy("raster_id", "band", "obx", "oby")
           .applyInPandas(reduce_group, schema=TILE_SCHEMA))
    return out, out_meta


def build_pyramid(tiles: DataFrame, meta: RasterMeta, levels: int,
                  method: str = "average") -> list[tuple[DataFrame, RasterMeta]]:
    """Full overview chain [(level1, meta1), ...] — iterated narrow-ish
    shuffles, the gdal2tiles overview-loop shape."""
    out = []
    cur, cur_meta = tiles, meta
    for i in range(1, levels + 1):
        cur, cur_meta = overview_level(
            cur, cur_meta, f"{meta.raster_id}_ov{i}", method)
        out.append((cur, cur_meta))
    return out
