"""SURF-style image matching (GDALSimpleSURF / GDALComputeMatchingPoints).

Closes the one SURVEY §2.9 line previously marked out of scope: the
reference's correlator finds corresponding points between two rasters
(Fast-Hessian feature detection on an integral image + 64-d Haar
descriptor + greedy ratio-test matching) and returns them as GCPs.

Reference semantics re-expressed from scratch in vectorized numpy (not a
copy — the reference is scalar C++ with per-pixel loops):

- integral image + clamped rectangle sum + Haar wavelets:
  gdal/alg/gdal_octave.cpp:49-75, :89-121, :123-133
- Fast-Hessian octave layer (filterSize = 3*(2^octave*interval + 1),
  det = dxx*dyy - (0.9*dxy)^2, sign(dxx+dyy)): gdal_octave.cpp:155-216
- strict 3x3x3 scale-space extremum: gdal_octave.cpp:246-274
- ExtractFeaturePoints over INTERVALS=4 with (k, k+1, k+2) triples:
  gdal/alg/gdal_simplesurf.cpp:214-255 (emission order: octave asc,
  interval-triple asc, row asc, col asc — matching is order-dependent,
  so the vectorized extraction preserves it)
- 64-d descriptor (4x4 quadrants x 5x5 sub-quadrants, Haar size
  2*scale, per-quadrant [dx, dy, |dx|, |dy|]): gdal_simplesurf.cpp:276-334
- greedy nearest/second-nearest matching with sign gating, 0.8 ratio
  prune, max-normalized distance threshold (including the reference's
  sequential second-nearest update quirks): gdal_simplesurf.cpp:357-506
- GDALComputeMatchingPoints defaults (octaves 2..2, SURF_THRESHOLD
  0.001, MATCHING_THRESHOLD 0.015, luminosity (0.21R+0.72G+0.07B)/255,
  GCP = pixel/line on image1 -> X/Y = pixel/line on image2, all +0.5):
  gdal/alg/gdalmatching.cpp:36-299

Spark-first shape: detection + matching are whole-image algorithms in
the reference (it reads both rasters fully); the distributed axis is
therefore across image PAIRS — ``matching_points`` maps one scene pair
per row through an Arrow batch, numpy-vectorized inside, so a 100-TB
scene-matching sweep (millions of pairs) parallelizes per pair with no
per-pixel Python and no driver collect.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# integral image + clamped rectangle sums (gdal_octave.cpp:49-121)
# ---------------------------------------------------------------------------


def integral_image(img: np.ndarray) -> np.ndarray:
    """Summed-area table, I[i,j] = sum(img[:i+1, :j+1])."""
    return np.asarray(img, dtype=np.float64).cumsum(axis=0).cumsum(axis=1)


def _at(I: np.ndarray, r, c):
    """GetValue: I[r, c] with 0 outside the matrix (gdal_octave.cpp:80-87)."""
    H, W = I.shape
    r = np.asarray(r)
    c = np.asarray(c)
    ok = (r >= 0) & (r < H) & (c >= 0) & (c < W)
    return np.where(ok, I[np.clip(r, 0, H - 1), np.clip(c, 0, W - 1)], 0.0)


def rect_sum(I: np.ndarray, row, col, w: int, h: int):
    """GetRectangleSum with the reference's exact clamping: right/bottom
    corners clamp to the image edge, out-of-range corner reads are 0 and
    negative results clamp to 0 (gdal_octave.cpp:89-121)."""
    H, W = I.shape
    row = np.asarray(row)
    col = np.asarray(col)
    lt_r = np.where(row <= H, row - 1, -1)
    lt_c = np.where(col <= W, col - 1, -1)
    rb_r = np.minimum(row + h - 1, H - 1)
    rb_c = np.minimum(col + w - 1, W - 1)
    res = (_at(I, lt_r, lt_c) + _at(I, rb_r, rb_c)
           - _at(I, lt_r, rb_c) - _at(I, rb_r, lt_c))
    return np.maximum(res, 0.0)


def haar_x(I: np.ndarray, row, col, size: int):
    """HaarWavelet_X (gdal_octave.cpp:123-127): right half minus left."""
    return (rect_sum(I, row, col + size // 2, size // 2, size)
            - rect_sum(I, row, col, size // 2, size))


def haar_y(I: np.ndarray, row, col, size: int):
    """HaarWavelet_Y (gdal_octave.cpp:129-133): bottom half minus top."""
    return (rect_sum(I, row + size // 2, col, size, size // 2)
            - rect_sum(I, row, col, size, size // 2))


# ---------------------------------------------------------------------------
# Fast-Hessian octave layers (gdal_octave.cpp:155-216)
# ---------------------------------------------------------------------------

INTERVALS = 4  # gdal_simplesurf.h:389


class OctaveLayer:
    """detHessian + sign grids for one (octave, interval) box-filter size."""

    def __init__(self, octave: int, interval: int):
        self.octave = octave
        self.filter_size = 3 * ((2 ** octave) * interval + 1)
        self.radius = (self.filter_size - 1) // 2
        self.scale = 2 ** octave
        self.det: np.ndarray | None = None
        self.signs: np.ndarray | None = None

    def compute(self, I: np.ndarray) -> "OctaveLayer":
        H, W = I.shape
        fs, radius = self.filter_size, self.radius
        lobe = fs // 3
        long_part = 2 * lobe - 1
        norm = float(fs * fs)
        det = np.zeros((H, W))
        signs = np.zeros((H, W), dtype=np.int8)
        # reference loops r,c in [radius, dim - radius] INCLUSIVE
        if H - radius >= radius and W - radius >= radius:
            rs = np.arange(radius, H - radius + 1)
            cs = np.arange(radius, W - radius + 1)
            R = rs[:, None]
            C = cs[None, :]
            dxx = (rect_sum(I, R - lobe + 1, C - radius, fs, long_part)
                   - 3.0 * rect_sum(I, R - lobe + 1, C - (lobe - 1) // 2,
                                    lobe, long_part))
            dyy = (rect_sum(I, R - radius, C - lobe - 1, long_part, fs)
                   - 3.0 * rect_sum(I, R - lobe + 1, C - lobe + 1,
                                    long_part, lobe))
            dxy = (rect_sum(I, R - lobe, C - lobe, lobe, lobe)
                   + rect_sum(I, R + 1, C + 1, lobe, lobe)
                   - rect_sum(I, R - lobe, C + 1, lobe, lobe)
                   - rect_sum(I, R + 1, C - lobe, lobe, lobe))
            dxx /= norm
            dyy /= norm
            dxy /= norm
            det[radius:H - radius + 1, radius:W - radius + 1] = \
                dxx * dyy - (0.9 * 0.9) * dxy * dxy
            signs[radius:H - radius + 1, radius:W - radius + 1] = \
                np.where(dxx + dyy >= 0.0, 1, -1)
        self.det = det
        self.signs = signs
        return self


def _extrema(bot: OctaveLayer, mid: OctaveLayer, top: OctaveLayer,
             threshold: float) -> tuple[np.ndarray, np.ndarray]:
    """Strict 3x3x3 extremum rows/cols of the mid layer, row-major
    (PointIsExtremum, gdal_octave.cpp:246-274)."""
    H, W = mid.det.shape
    tr = top.radius
    r0, r1 = tr + 1, H - tr - 1  # inclusive: row > tr and row + tr < H
    c0, c1 = tr + 1, W - tr - 1
    if r1 < r0 or c1 < c0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cur = mid.det[r0:r1 + 1, c0:c1 + 1]
    ok = cur >= threshold
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            t = top.det[r0 + di:r1 + 1 + di, c0 + dj:c1 + 1 + dj]
            b = bot.det[r0 + di:r1 + 1 + di, c0 + dj:c1 + 1 + dj]
            ok &= (t < cur) & (b < cur)
            if di != 0 or dj != 0:
                m = mid.det[r0 + di:r1 + 1 + di, c0 + dj:c1 + 1 + dj]
                ok &= m < cur
    rr, cc = np.nonzero(ok)  # row-major — the reference's emission order
    return rr + r0, cc + c0


# ---------------------------------------------------------------------------
# descriptors (gdal_simplesurf.cpp:276-334)
# ---------------------------------------------------------------------------


def compute_descriptors(I: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                        scale: int) -> np.ndarray:
    """64-d descriptors for points sharing one scale, vectorized across
    points: 4x4 quadrants x 5x5 sub-quadrant Haar responses of size
    2*scale, per-quadrant [sum dx, sum dy, sum |dx|, sum |dy|]."""
    n = len(xs)
    if n == 0:
        return np.zeros((0, 64))
    haar = 2 * scale
    desc_side = 20 * scale
    quad_step = desc_side // 4      # 5*scale
    sub_step = quad_step // 5       # scale
    # sub-quadrant left-top offsets within the descriptor window
    qr = np.arange(4) * quad_step
    sr = np.arange(5) * sub_step
    # (4, 5) row offsets / col offsets, combined to (4, 4, 5, 5)
    row_off = (qr[:, None] + sr[None, :])          # (4 quad rows, 5 sub rows)
    col_off = (qr[:, None] + sr[None, :])
    lt_row = (ys - desc_side // 2)[:, None, None, None, None]
    lt_col = (xs - desc_side // 2)[:, None, None, None, None]
    # centers of sub-quadrants, then Haar window left-tops
    cntr_r = lt_row + row_off[None, :, None, :, None] + sub_step // 2
    cntr_c = lt_col + col_off[None, None, :, None, :] + sub_step // 2
    cur_r = cntr_r - haar // 2
    cur_c = cntr_c - haar // 2
    shape = np.broadcast_shapes(cur_r.shape, cur_c.shape)
    cur_r = np.broadcast_to(cur_r, shape)
    cur_c = np.broadcast_to(cur_c, shape)
    dx = haar_x(I, cur_r, cur_c, haar)   # (n, 4, 4, 5, 5)
    dy = haar_y(I, cur_r, cur_c, haar)
    quad = np.stack([dx.sum(axis=(3, 4)), dy.sum(axis=(3, 4)),
                     np.abs(dx).sum(axis=(3, 4)),
                     np.abs(dy).sum(axis=(3, 4))], axis=-1)  # (n,4,4,4)
    return quad.reshape(n, 64)


def extract_feature_points(img: np.ndarray, octave_start: int = 2,
                           octave_end: int = 2,
                           threshold: float = 0.001) -> dict:
    """ExtractFeaturePoints (gdal_simplesurf.cpp:214-255): returns
    dict of arrays x, y, scale, radius, sign, desc (n, 64), in the
    reference's emission order."""
    I = integral_image(img)
    xs, ys, scales, radii, sgns, descs = [], [], [], [], [], []
    for octave in range(octave_start, octave_end + 1):
        layers = [OctaveLayer(octave, i).compute(I)
                  for i in range(1, INTERVALS + 1)]
        for k in range(INTERVALS - 2):
            bot, mid, top = layers[k], layers[k + 1], layers[k + 2]
            rr, cc = _extrema(bot, mid, top, threshold)
            if len(rr) == 0:
                continue
            xs.append(cc)
            ys.append(rr)
            scales.append(np.full(len(rr), mid.scale))
            radii.append(np.full(len(rr), mid.radius))
            sgns.append(mid.signs[rr, cc].astype(np.int64))
            descs.append(compute_descriptors(I, cc, rr, mid.scale))
    if not xs:
        return {"x": np.empty(0, np.int64), "y": np.empty(0, np.int64),
                "scale": np.empty(0, np.int64),
                "radius": np.empty(0, np.int64),
                "sign": np.empty(0, np.int64), "desc": np.zeros((0, 64))}
    return {"x": np.concatenate(xs), "y": np.concatenate(ys),
            "scale": np.concatenate(scales),
            "radius": np.concatenate(radii),
            "sign": np.concatenate(sgns), "desc": np.vstack(descs)}


# ---------------------------------------------------------------------------
# matching (gdal_simplesurf.cpp:357-506)
# ---------------------------------------------------------------------------


def match_feature_points(fp1: dict, fp2: dict,
                         matching_threshold: float = 0.015) -> list[tuple]:
    """Greedy nearest/second-nearest matching with the reference's exact
    sequential semantics (the collections swap so the smaller drives;
    second-nearest initializes to the FIRST candidate distance and only
    updates on curDist > bestDist — order-dependent, replicated
    faithfully). Returns [(i1, i2), ...] index pairs into fp1/fp2."""
    len1, len2 = len(fp1["x"]), len(fp2["x"])
    swap = len2 < len1
    p1, p2 = (fp2, fp1) if swap else (fp1, fp2)
    n2 = len(p2["x"])
    matched = np.zeros(n2, dtype=bool)
    infos: list[list] = []  # [i, bestIndex, dist]
    for i in range(len(p1["x"])):
        d = np.sqrt(((p2["desc"] - p1["desc"][i]) ** 2).sum(axis=1))
        cand = np.nonzero((~matched) & (p2["sign"] == p1["sign"][i]))[0]
        best = -1.0
        best_idx = -1
        best2 = -1.0
        for j in cand:
            cur = d[j]
            if best == -1.0 or cur < best:
                best = cur
                best_idx = int(j)
            if best2 < 0:
                best2 = cur
            elif best < cur < best2:
                best2 = cur
        if best2 > 0 and best >= 0 and best / best2 < 0.8:
            infos.append([i, best_idx, best])
            matched[best_idx] = True
    # max-normalize distances, keep <= threshold (NormalizeDistances)
    if infos:
        mx = max(r[2] for r in infos)
        if mx != 0:
            for r in infos:
                r[2] /= mx
    out = []
    for i, j, dist in infos:
        if dist <= matching_threshold:
            out.append((j, i) if swap else (i, j))
    return out


def rgb_to_luminosity(r: np.ndarray, g: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """ConvertRGBToLuminosity (gdal_simplesurf.cpp:141-150):
    (0.21 R + 0.72 G + 0.07 B) / 255."""
    return (0.21 * np.asarray(r, np.float64) + 0.72 * np.asarray(g, np.float64)
            + 0.07 * np.asarray(b, np.float64)) / 255.0


def match_images(img1: np.ndarray, img2: np.ndarray,
                 octave_start: int = 2, octave_end: int = 2,
                 surf_threshold: float = 0.001,
                 matching_threshold: float = 0.015) -> np.ndarray:
    """GDALComputeMatchingPoints kernel (gdalmatching.cpp:108-271): GCP
    rows (pixel, line, x, y) — pixel/line on img1, x/y the corresponding
    pixel/line on img2, all shifted +0.5 to pixel centers."""
    fp1 = extract_feature_points(img1, octave_start, octave_end,
                                 surf_threshold)
    fp2 = extract_feature_points(img2, octave_start, octave_end,
                                 surf_threshold)
    pairs = match_feature_points(fp1, fp2, matching_threshold)
    out = np.zeros((len(pairs), 4))
    for n, (i, j) in enumerate(pairs):
        out[n] = (fp1["x"][i] + 0.5, fp1["y"][i] + 0.5,
                  fp2["x"][j] + 0.5, fp2["y"][j] + 0.5)
    return out


# ---------------------------------------------------------------------------
# Spark operator: pair-parallel matching
# ---------------------------------------------------------------------------

GCP_SCHEMA = T.StructType([
    T.StructField("pair_id", T.LongType()),
    T.StructField("gcp_id", T.IntegerType()),
    T.StructField("pixel", T.DoubleType()),
    T.StructField("line", T.DoubleType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
])


def matching_points(pairs: DataFrame, octave_start: int = 2,
                    octave_end: int = 2, surf_threshold: float = 0.001,
                    matching_threshold: float = 0.015) -> DataFrame:
    """Distributed GDALComputeMatchingPoints over an image-pair table.

    ``pairs`` columns: (pair_id long, w1 int, h1 int, img1 binary,
    w2 int, h2 int, img2 binary) — images are row-major float64 grids
    (luminosity; use :func:`rgb_to_luminosity` upstream for RGB). One
    scene pair per row; pairs are independent, so the operator scales
    linearly across executors with no shuffle at all."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                img1 = np.frombuffer(bytes(r.img1),
                                     dtype=np.float64).reshape(r.h1, r.w1)
                img2 = np.frombuffer(bytes(r.img2),
                                     dtype=np.float64).reshape(r.h2, r.w2)
                gcps = match_images(img1, img2, octave_start, octave_end,
                                    surf_threshold, matching_threshold)
                outs.append(pd.DataFrame({
                    "pair_id": np.full(len(gcps), r.pair_id, np.int64),
                    "gcp_id": np.arange(len(gcps), dtype=np.int32),
                    "pixel": gcps[:, 0], "line": gcps[:, 1],
                    "x": gcps[:, 2], "y": gcps[:, 3]}))
            yield (pd.concat(outs) if outs else pd.DataFrame(
                {f.name: [] for f in GCP_SCHEMA.fields}))

    return pairs.mapInPandas(run, schema=GCP_SCHEMA)


def matching_points_tiles(tiles1: DataFrame, meta1, tiles2: DataFrame,
                          meta2, **kw) -> DataFrame:
    """Convenience: match two block-model rasters (raster/model.py). The
    reference algorithm is whole-image, so each side is assembled from
    its blocks in one task (bounded by the raster size contract, same as
    the dither operator); use :func:`matching_points` directly for
    many-pair sweeps."""
    def pack(tiles, meta, n):
        b = meta.block
        assembled = (tiles.withColumn("_p", F.lit(0)).groupBy("_p").agg(
            F.collect_list(F.struct("bx", "by", "w", "h", "data")).alias("_t")))

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            arr = np.zeros((meta.height, meta.width))
            for t in pdf.iloc[0]["_t"]:
                blk = np.frombuffer(bytes(t["data"]),
                                    dtype=meta.dtype).reshape(t["h"], t["w"])
                arr[t["by"] * b:t["by"] * b + t["h"],
                    t["bx"] * b:t["bx"] * b + t["w"]] = blk
            return pd.DataFrame({
                "pair_id": [0], f"w{n}": [meta.width], f"h{n}": [meta.height],
                f"img{n}": [arr.astype(np.float64).tobytes()]})

        schema = T.StructType([
            T.StructField("pair_id", T.LongType()),
            T.StructField(f"w{n}", T.IntegerType()),
            T.StructField(f"h{n}", T.IntegerType()),
            T.StructField(f"img{n}", T.BinaryType())])
        return assembled.groupBy("_p").applyInPandas(
            lambda _k, pdf: build(pdf), schema=schema)

    left = pack(tiles1, meta1, 1)
    right = pack(tiles2, meta2, 2)
    return matching_points(left.join(right, on="pair_id"), **kw)
