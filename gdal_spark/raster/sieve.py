"""Distributed sieve filter (GDALSieveFilter).

Reference: gdal/alg/gdalsievefilter.cpp:183 — raster polygons smaller than
``threshold`` pixels merge into their largest neighbor polygon (neighbor
comparison :103), repeating until no small polygon remains.

Spark decomposition: reuse the polygonize 2-phase CC (region per pixel),
build the region adjacency graph (within-block neighbor pairs + cross-
block border joins), then make the reference's SINGLE merge decision on
the region table (tiny relative to pixels): a small region takes the
value of its largest neighbor, and only when that neighbor is at least
threshold-sized (gdalsievefilter.cpp:423-478 — the chain-following
variant is #ifdef'd out in the reference, so clusters of mutually-small
polygons stay untouched). Deterministic and partition-independent.

Output: relabeled block rows where each merged region takes its target
region's pixel value.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta
from gdal_spark.raster.polygonize import _node_base, _polygonize_full, label_block

_ADJ = T.StructType([
    T.StructField("a", T.LongType()), T.StructField("b", T.LongType())])
_EDGE = T.StructType([
    T.StructField("side", T.StringType()), T.StructField("gpos", T.LongType()),
    T.StructField("node", T.LongType())])
# within-block adjacency + border rows from one labeling pass ('a'/'e')
_COMBINED = T.StructType([T.StructField("kind", T.StringType())]
                         + list(_ADJ.fields) + list(_EDGE.fields))


def sieve(tiles: DataFrame, meta: RasterMeta, threshold: int, band: int = 0,
          connectedness: int = 4) -> DataFrame:
    regions, lab = _polygonize_full(tiles, meta, band,
                                    connectedness=connectedness)
    dtype, block, nodata = meta.dtype, meta.block, meta.nodata
    nbx, width, height = meta.n_block_x, meta.width, meta.height
    tiles_b = tiles.filter(F.col("band") == band)

    # ---- adjacency: within-block pairs + cross-block border pairs --------
    # (one labeling pass per block emits BOTH row kinds, cached)
    def local_both(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                labels, _ = label_block(arr, nodata, connectedness)
                base = _node_base(r.bx, r.by, nbx)
                pairs = [(labels[:, :-1], labels[:, 1:]),
                         (labels[:-1, :], labels[1:, :])]
                if connectedness == 8:
                    pairs += [(labels[:-1, :-1], labels[1:, 1:]),
                              (labels[:-1, 1:], labels[1:, :-1])]
                for la, lb in pairs:
                    m = (la != lb) & (la >= 0) & (lb >= 0)
                    pa = la[m] + base
                    pb = lb[m] + base
                    lo = np.minimum(pa, pb)
                    hi = np.maximum(pa, pb)
                    uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
                    rows.extend(("a", int(x), int(y), None, None, None)
                                for x, y in uniq)
                px0, py0 = r.bx * block, r.by * block
                # same non-wrapping key scheme as polygonize: v keys use a
                # width+1 multiplier; outer-border edges are never emitted
                for x in range(r.w):
                    diag = connectedness == 8
                    if labels[0, x] >= 0 and py0 > 0:
                        k = (py0 - 1) * width + px0 + x
                        rows.append(("e", None, None, "h", k,
                                     int(base + labels[0, x])))
                        if diag and px0 + x + 1 < width:
                            rows.append(("e", None, None, "h", k + 1,
                                         int(base + labels[0, x])))
                    if labels[r.h - 1, x] >= 0 and py0 + r.h < height:
                        k = (py0 + r.h - 1) * width + px0 + x
                        rows.append(("e", None, None, "h", k,
                                     int(base + labels[r.h - 1, x])))
                        if diag and px0 + x + 1 < width:
                            rows.append(("e", None, None, "h", k + 1,
                                         int(base + labels[r.h - 1, x])))
                for y in range(r.h):
                    diag = connectedness == 8
                    if labels[y, 0] >= 0 and px0 > 0:
                        k = (py0 + y) * (width + 1) + px0 - 1
                        rows.append(("e", None, None, "v", k,
                                     int(base + labels[y, 0])))
                        if diag and py0 + y + 1 < height:
                            rows.append(("e", None, None, "v",
                                         k + width + 1,
                                         int(base + labels[y, 0])))
                    if labels[y, r.w - 1] >= 0 and px0 + r.w < width:
                        k = (py0 + y) * (width + 1) + px0 + r.w - 1
                        rows.append(("e", None, None, "v", k,
                                     int(base + labels[y, r.w - 1])))
                        if diag and py0 + y + 1 < height:
                            rows.append(("e", None, None, "v",
                                         k + width + 1,
                                         int(base + labels[y, r.w - 1])))
            yield pd.DataFrame(rows, columns=[f.name for f in _COMBINED])

    cached = tiles_b.cache()
    both = cached.mapInPandas(local_both, schema=_COMBINED).cache()
    adj_local = both.filter(F.col("kind") == "a").select("a", "b")
    edges = both.filter(F.col("kind") == "e").select("side", "gpos", "node")
    ea, eb = edges.alias("x"), edges.alias("y")
    adj_cross = (ea.join(eb, (F.col("x.side") == F.col("y.side"))
                         & (F.col("x.gpos") == F.col("y.gpos"))
                         & (F.col("x.node") < F.col("y.node")))
                 .select(F.col("x.node").alias("a"), F.col("y.node").alias("b")))
    node_adj = adj_local.unionByName(adj_cross).distinct()

    # node pairs → comp pairs via the CC mapping
    la = lab.withColumnRenamed("node", "a").withColumnRenamed("comp", "ca")
    lb = lab.withColumnRenamed("node", "b").withColumnRenamed("comp", "cb")
    comp_adj = (node_adj.join(la, on="a").join(lb, on="b")
                .select("ca", "cb").filter(F.col("ca") != F.col("cb"))
                .distinct().cache())
    sym_adj = comp_adj.unionByName(
        comp_adj.select(F.col("cb").alias("ca"), F.col("ca").alias("cb")))

    # ---- single-pass merge decision (gdalsievefilter.cpp:423-478) ----
    # The reference makes ONE decision per polygon from the ORIGINAL
    # region table: a polygon smaller than the threshold takes the VALUE
    # of its largest neighbour, and only if that neighbour is itself at
    # least threshold-sized ("polygons smaller than the threshold with no
    # neighbours that are as large as the threshold will not be
    # altered"). No iteration, no cascading growth — unmergable clusters
    # of small polygons stay untouched (autotest/alg/sieve.py sieve_3).
    # Tie rule: the reference keeps the first equal-sized neighbour in
    # scan order; the distributed twin picks (size desc, id asc), which
    # coincides on the fixtures (ids are scan-ordered).
    base_sizes = regions.select(F.col("region").alias("comp"),
                                F.col("n_pixels"), F.col("value"))
    sa = base_sizes.select(F.col("comp").alias("ca"),
                           F.col("n_pixels").alias("sza"))
    sb = base_sizes.select(F.col("comp").alias("cb"),
                           F.col("n_pixels").alias("szb"))
    best = (sym_adj.join(sa, on="ca").join(sb, on="cb")
            .filter(F.col("sza") < threshold)
            .withColumn("_ord", F.struct(F.col("szb"), -F.col("cb")))
            .groupBy("ca")
            .agg(F.max_by("cb", F.col("_ord")).alias("tgt"),
                 F.max("szb").alias("bsz")))
    moves = (best.filter(F.col("bsz") >= threshold)
             .select(F.col("ca").alias("comp"), "tgt"))
    mapping = (base_sizes.select("comp")
               .join(moves, on="comp", how="left")
               .select("comp", F.coalesce("tgt", "comp").alias("tgt")))

    # ---- relabel pixels ---------------------------------------------------
    # Distributed relabel: the (node → new value) table is grouped per block
    # and joined onto the tile rows (region count scales with raster size —
    # a driver-side collect would OOM at scale; a keyed join does not).
    tgt_val = base_sizes.select(F.col("comp").alias("tgt"),
                                F.col("value").alias("tval"))
    moved = mapping.filter(F.col("comp") != F.col("tgt"))
    per_block = (moved.join(lab, on="comp")
                 .join(tgt_val, on="tgt")
                 .select("node", "tval")
                 .withColumn("bidx", F.shiftright("node", 24))
                 .groupBy("bidx")
                 .agg(F.collect_list(F.struct("node", "tval")).alias("relab")))
    joined = (cached.withColumn(
                  "bidx", F.col("by").cast("long") * F.lit(int(nbx)) + F.col("bx"))
              .join(per_block, on="bidx", how="left"))

    def relabel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                out = arr.copy()
                relab = r.relab
                if relab is not None and not (isinstance(relab, float)
                                              and np.isnan(relab)):
                    # must re-derive with the SAME connectedness as the
                    # region pass or node ids won't line up
                    labels, _ = label_block(arr, nodata, connectedness)
                    base = _node_base(r.bx, r.by, nbx)
                    for item in relab:
                        out[labels == int(item["node"] - base)] = item["tval"]
                rows.append((r.raster_id + "_sieved", r.band, r.bx, r.by,
                             r.w, r.h, out.tobytes()))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bx", "by",
                                              "w", "h", "data"])

    return joined.mapInPandas(relabel, schema=TILE_SCHEMA)
