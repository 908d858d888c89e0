"""Distributed raster→vector polygonize (GDALPolygonize).

Reference: gdal/alg/polygonize.cpp:493 — single pass of 2-row rolling
4-connected component labeling (GDALRasterPolygonEnumerator) collecting
pixel-edge segments per region (RPolygon :41-259), emitting one polygon
(+holes) per connected region of equal pixel value, with the pixel value
attached.

Spark decomposition (the classic 2-phase distributed CC):

1. **local labeling** — per block, run-length union-find labels 4-connected
   equal-value runs (the same 2-row rolling idea as the reference, but
   whole-block vectorized). Each block emits per-label summary rows and
   *edge rows* describing its border pixels (side, global position, value,
   label).
2. **boundary merge** — edge rows of adjacent blocks join on the shared
   border position; equal values create merge edges between (block,label)
   nodes. Iterative min-label propagation (pure DataFrame joins, converges
   in O(log diameter) rounds with path-halving via self-join) produces a
   global region id per local label.
3. **aggregate / trace** — region stats are a groupBy; exact pixel-edge
   rings are traced per region by assembling the region's blocks
   (groupBy(region).applyInPandas) and walking boundary unit-edges into
   closed rings (exterior CCW area-positive first, holes after — matching
   the reference's even-odd emission).

nodata pixels are skipped (GDALPolygonize mask semantics).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions import geometry as G
from gdal_spark.raster.model import RasterMeta


# ---------------------------------------------------------------------------
# local labeling (numpy union-find over runs)
# ---------------------------------------------------------------------------

def label_block(arr: np.ndarray, nodata=None,
                connectedness: int = 4) -> tuple[np.ndarray, int]:
    """Equal-value labeling, 4- or 8-connected. Returns (labels int32
    (-1 = nodata), n_labels). Row-run RLE + union-find — the reference's
    2-row rolling algorithm (gdalrasterpolygonenumerator.cpp; the
    8CONNECTED=8 option widens the run-overlap test by one pixel each
    side, ProcessPair semantics)."""
    h, w = arr.shape
    labels = np.full((h, w), -1, dtype=np.int64)
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    prev_runs: list[tuple[int, int, int, object]] = []  # (start, end, label, val)
    for y in range(h):
        row = arr[y]
        # run boundaries
        change = np.nonzero(row[1:] != row[:-1])[0] + 1
        starts = np.r_[0, change]
        ends = np.r_[change, w]
        runs = []
        for s, e in zip(starts, ends):
            v = row[s]
            if nodata is not None and v == nodata:
                continue
            lab = len(parent)
            parent.append(lab)
            # merge with overlapping runs of the previous row
            # (8-connected: runs touching diagonally also merge)
            pad = 1 if connectedness == 8 else 0
            for ps, pe, plab, pv in prev_runs:
                if ps < e + pad and s < pe + pad and pv == v:
                    ra, rb = find(lab), find(plab)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
            labels[y, s:e] = lab
            runs.append((s, e, lab, v))
        prev_runs = runs
    # flatten to dense root ids
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int64)
    uniq, dense = np.unique(roots, return_inverse=True)
    mask = labels >= 0
    labels[mask] = dense[labels[mask]]
    return labels, len(uniq)


# ---------------------------------------------------------------------------
# ring tracing (pixel-edge boundary walk)
# ---------------------------------------------------------------------------

def trace_rings(mask: np.ndarray, x_off: float = 0.0, y_off: float = 0.0
                ) -> list[np.ndarray]:
    """Exact pixel-boundary rings of a binary mask (RPolygon analog:
    polygonize.cpp:41-259 collects the same unit segments). Returns closed
    rings in pixel coordinates (+offsets); exterior rings clockwise in
    array coords, holes counter-clockwise, exterior first."""
    h, w = mask.shape
    m = np.zeros((h + 2, w + 2), dtype=bool)
    m[1:-1, 1:-1] = mask
    # horizontal boundary edges between (y-1,x) above and (y,x): dict keyed
    # by directed start vertex. Directions chosen so interior is on the
    # right → exterior traces CW in array coords (y down).
    nxt: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a, b):
        nxt.setdefault(a, []).append(b)

    diff_h = m[1:, :] != m[:-1, :]          # edge between rows y and y+1
    ys, xs = np.nonzero(diff_h)
    for y, x in zip(ys, xs):
        if m[y, x]:      # interior above → walk west keeps interior right
            add((x, y), (x - 1, y))
        else:            # interior below → walk east
            add((x - 1, y), (x, y))
    diff_v = m[:, 1:] != m[:, :-1]
    ys, xs = np.nonzero(diff_v)
    for y, x in zip(ys, xs):
        if m[y, x]:      # interior west → walk south
            add((x, y - 1), (x, y))
        else:            # interior east → walk north
            add((x, y), (x, y - 1))
    rings = []
    while nxt:
        start = next(iter(nxt))
        ring = [start]
        a = start
        prev_d = None
        while True:
            cands = nxt[a]
            if len(cands) == 1 or prev_d is None:
                b = cands.pop()
            else:
                # diagonal self-touch vertex: take the sharpest right turn
                # (keeps the interior tightly on the right, as the
                # reference's segment merge does)
                def turn(c):
                    d = (c[0] - a[0], c[1] - a[1])
                    return prev_d[0] * d[1] - prev_d[1] * d[0]
                cands.sort(key=turn)
                b = cands.pop()   # max cross = rightmost turn (y down)
            if not nxt[a]:
                del nxt[a]
            prev_d = (b[0] - a[0], b[1] - a[1])
            ring.append(b)
            a = b
            if a == start:
                break
        r = np.asarray(ring, dtype=np.float64)
        # collinear simplification
        keep = np.ones(len(r), dtype=bool)
        d1 = r[1:-1] - r[:-2]
        d2 = r[2:] - r[1:-1]
        keep[1:-1] = (d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]) != 0
        r = r[keep]
        r[:, 0] += x_off
        r[:, 1] += y_off
        rings.append(r)
    # exterior = ring with max |area| first (single-region masks)
    rings.sort(key=lambda r: -abs(
        np.dot(r[:-1, 0], r[1:, 1]) - np.dot(r[1:, 0], r[:-1, 1])))
    return rings


# ---------------------------------------------------------------------------
# distributed polygonize
# ---------------------------------------------------------------------------

_SUMMARY = T.StructType([
    T.StructField("node", T.LongType()),       # global (block, label) node id
    T.StructField("value", T.DoubleType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("pxmin", T.LongType()), T.StructField("pymin", T.LongType()),
    T.StructField("pxmax", T.LongType()), T.StructField("pymax", T.LongType()),
])

_EDGES = T.StructType([
    T.StructField("side", T.StringType()),     # 'h' below-edge / 'v' right-edge
    T.StructField("gpos", T.LongType()),       # global edge coordinate key
    T.StructField("value", T.DoubleType()),
    T.StructField("node", T.LongType()),
])

# summary + edge rows from ONE labeling pass, discriminated by `kind`
# ('s'/'e'); the per-block union-find is the expensive step, so running it
# once and caching the combined rows halves the labeling cost
_COMBINED = T.StructType(
    [T.StructField("kind", T.StringType())]
    + list(_SUMMARY.fields)
    + [f for f in _EDGES.fields if f.name not in ("value", "node")])


def _node_base(bx: int, by: int, nbx: int) -> int:
    return (np.int64(by) * nbx + bx) << np.int64(24)


def polygonize(tiles: DataFrame, meta: RasterMeta, band: int = 0,
               max_iters: int = 50, connectedness: int = 4) -> DataFrame:
    """Global region table: (region, value, n_pixels, pxmin, pymin, pxmax,
    pymax). ``region`` is a stable global id (min node id of the component).
    ``connectedness=8`` reproduces the 8CONNECTED=8 option. Follow with
    :func:`region_geometries` for exact WKB rings."""
    regions, _lab = _polygonize_full(tiles, meta, band, max_iters,
                                     connectedness)
    return regions


def _polygonize_full(tiles: DataFrame, meta: RasterMeta, band: int = 0,
                     max_iters: int = 50, connectedness: int = 4):
    dtype, block, nodata = meta.dtype, meta.block, meta.nodata
    nbx, width, height = meta.n_block_x, meta.width, meta.height

    tiles = tiles.filter(F.col("band") == band)

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srows: list = []
            erows: list = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                labels, n = label_block(arr, nodata, connectedness)
                base = _node_base(r.bx, r.by, nbx)
                px0, py0 = r.bx * block, r.by * block
                flat = labels.ravel()
                ok = flat >= 0
                vals = arr.ravel().astype(np.float64)[ok]
                labs = flat[ok]
                X = np.tile(np.arange(r.w), r.h)[ok] + px0
                Y = np.repeat(np.arange(r.h), r.w)[ok] + py0
                cnt = np.bincount(labs, minlength=n)
                big = np.int64(1) << 40
                vx0 = np.full(n, big); vy0 = np.full(n, big)
                vx1 = np.full(n, -big); vy1 = np.full(n, -big)
                np.minimum.at(vx0, labs, X); np.minimum.at(vy0, labs, Y)
                np.maximum.at(vx1, labs, X); np.maximum.at(vy1, labs, Y)
                lval = np.zeros(n)
                lval[labs[::-1]] = vals[::-1]  # first pixel's value per label
                for lab in range(n):
                    if cnt[lab] == 0:
                        continue
                    srows.append((int(base + lab), float(lval[lab]),
                                  int(cnt[lab]),
                                  int(vx0[lab]), int(vy0[lab]),
                                  int(vx1[lab]), int(vy1[lab])))
                # border pixels → edge rows keyed by the *shared* border.
                # h keys: y*width + x (x < width, never wraps).  v keys use a
                # width+1 multiplier so the left edge of column 0 (x = -1)
                # cannot collide with the right edge of column width-1 on the
                # previous row.  Edges on the raster's outer border are not
                # emitted — there is no neighbor block to join with.
                diag = connectedness == 8
                for x in range(r.w):          # top row ↔ block above's bottom
                    lab = labels[0, x]
                    if lab >= 0 and py0 > 0:
                        k = (py0 - 1) * width + px0 + x
                        erows.append(("h", k, float(arr[0, x]),
                                      int(base + lab)))
                        # 8-conn: a +1-shifted twin key matches the
                        # neighbor column's direct key across the border
                        # (both diagonal directions covered because the
                        # other side emits its own twin); guarded against
                        # the x = width-1 row-wrap collision
                        if diag and px0 + x + 1 < width:
                            erows.append(("h", k + 1, float(arr[0, x]),
                                          int(base + lab)))
                    lab = labels[r.h - 1, x]  # bottom row (its own key)
                    if lab >= 0 and py0 + r.h < height:
                        k = (py0 + r.h - 1) * width + px0 + x
                        erows.append(("h", k, float(arr[r.h - 1, x]),
                                      int(base + lab)))
                        if diag and px0 + x + 1 < width:
                            erows.append(("h", k + 1,
                                          float(arr[r.h - 1, x]),
                                          int(base + lab)))
                for y in range(r.h):
                    lab = labels[y, 0]
                    if lab >= 0 and px0 > 0:
                        k = (py0 + y) * (width + 1) + px0 - 1
                        erows.append(("v", k, float(arr[y, 0]),
                                      int(base + lab)))
                        if diag and py0 + y + 1 < height:
                            erows.append(("v", k + width + 1,
                                          float(arr[y, 0]),
                                          int(base + lab)))
                    lab = labels[y, r.w - 1]
                    if lab >= 0 and px0 + r.w < width:
                        k = (py0 + y) * (width + 1) + px0 + r.w - 1
                        erows.append(("v", k, float(arr[y, r.w - 1]),
                                      int(base + lab)))
                        if diag and py0 + y + 1 < height:
                            erows.append(("v", k + width + 1,
                                          float(arr[y, r.w - 1]),
                                          int(base + lab)))
            cols = [f.name for f in _COMBINED]
            rows = [("s", n, v, np_, x0, y0, x1, y1, None, None)
                    for n, v, np_, x0, y0, x1, y1 in srows]
            rows += [("e", n, v, None, None, None, None, None, side, gpos)
                     for side, gpos, v, n in erows]
            yield pd.DataFrame(rows, columns=cols)

    combined = tiles.mapInPandas(local, schema=_COMBINED).cache()
    summary = combined.filter(F.col("kind") == "s").select(
        *[f.name for f in _SUMMARY.fields])
    edges = combined.filter(F.col("kind") == "e").select(
        *[f.name for f in _EDGES.fields])

    # adjacent-block merge edges: same (side, gpos, value), different node
    a = edges.alias("a")
    b = edges.alias("b")
    merge = (a.join(b, (F.col("a.side") == F.col("b.side"))
                    & (F.col("a.gpos") == F.col("b.gpos"))
                    & (F.col("a.value") == F.col("b.value"))
                    & (F.col("a.node") < F.col("b.node")))
             .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
             .distinct())

    # min-label propagation to fixpoint (distributed union-find)
    lab = summary.select(F.col("node"), F.col("node").alias("comp"))
    sym = merge.unionByName(merge.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
    sym = sym.cache()
    for _ in range(max_iters):
        nbr = (sym.join(lab, sym.src == lab.node)
               .groupBy("dst").agg(F.min("comp").alias("ncomp"))
               .withColumnRenamed("dst", "node"))
        new = (lab.join(nbr, on="node", how="left")
               .select("node", F.least(F.col("comp"),
                                       F.coalesce("ncomp", "comp")).alias("comp")))
        # pointer-jump: comp ← comp of comp
        new = (new.alias("x")
               .join(new.select(F.col("node").alias("comp"),
                                F.col("comp").alias("cc")).alias("y"),
                     on="comp", how="left")
               .select("node", F.coalesce("cc", "comp").alias("comp")))
        # truncate lineage each round — iterated joins otherwise compound
        # the logical plan exponentially
        new = new.localCheckpoint(eager=True)
        changed = (new.alias("n").join(lab.alias("o"), on="node")
                   .filter(F.col("n.comp") != F.col("o.comp")).limit(1).count())
        lab = new
        if changed == 0:
            break

    return (summary.join(lab, on="node")
            .groupBy(F.col("comp").alias("region"))
            .agg(F.first("value").alias("value"),
                 F.sum("n_pixels").alias("n_pixels"),
                 F.min("pxmin").alias("pxmin"), F.min("pymin").alias("pymin"),
                 F.max("pxmax").alias("pxmax"), F.max("pymax").alias("pymax")),
            lab)


def region_geometries(tiles: DataFrame, meta: RasterMeta,
                      band: int = 0) -> DataFrame:
    """(region, value, n_pixels, wkb) with exact pixel-edge polygon rings in
    *geo* coordinates. Region pixel masks are re-derived per block, shuffled
    by region, and traced per region group (memory ∝ region bbox)."""
    regions, lab = _polygonize_full(tiles, meta, band)
    dtype, block, nodata = meta.dtype, meta.block, meta.nodata
    nbx = meta.n_block_x
    g = meta.gt

    lab_rows = lab  # node → comp
    tiles_b = tiles.filter(F.col("band") == band)

    blk_schema = T.StructType([
        T.StructField("comp", T.LongType()),
        T.StructField("bx", T.IntegerType()), T.StructField("by", T.IntegerType()),
        T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
        T.StructField("mask", T.BinaryType()),
    ])

    def per_block_masks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                labels, n = label_block(arr, nodata)
                base = _node_base(r.bx, r.by, nbx)
                for labn in range(n):
                    m = labels == labn
                    rows.append((int(base + labn), r.bx, r.by, r.w, r.h,
                                 np.packbits(m).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in blk_schema])

    masks = (tiles_b.mapInPandas(per_block_masks, schema=blk_schema)
             .withColumnRenamed("comp", "node")
             .join(lab_rows, on="node").drop("node"))

    out_schema = T.StructType([
        T.StructField("region", T.LongType()),
        T.StructField("wkb", T.BinaryType()),
    ])

    def trace_region(key, pdf: pd.DataFrame) -> pd.DataFrame:
        comp = int(key[0])
        bxs = pdf["bx"].to_numpy(); bys = pdf["by"].to_numpy()
        x0b, y0b = bxs.min(), bys.min()
        ws = pdf["w"].to_numpy(); hs = pdf["h"].to_numpy()
        W = int(((bxs - x0b + 1) * block).max())
        H = int(((bys - y0b + 1) * block).max())
        m = np.zeros((H, W), dtype=bool)
        for bx, by, w, h, mb in zip(bxs, bys, ws, hs, pdf["mask"]):
            sub = np.unpackbits(np.frombuffer(bytes(mb), dtype=np.uint8),
                                count=w * h).reshape(h, w).astype(bool)
            ox, oy = (bx - x0b) * block, (by - y0b) * block
            m[oy:oy + h, ox:ox + w] |= sub
        rings_px = trace_rings(m, x_off=x0b * block, y_off=y0b * block)
        rings_geo = []
        for r in rings_px:
            gx = g[0] + r[:, 0] * g[1] + r[:, 1] * g[2]
            gy = g[3] + r[:, 0] * g[4] + r[:, 1] * g[5]
            rings_geo.append(np.column_stack((gx, gy)))
        return pd.DataFrame([(comp, G.encode_polygon(rings_geo))],
                            columns=["region", "wkb"])

    geoms = masks.groupBy("comp").applyInPandas(trace_region, schema=out_schema)
    return regions.join(geoms, on="region").select(
        "region", "value", "n_pixels", "wkb")
