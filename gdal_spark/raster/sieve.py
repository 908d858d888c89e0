"""Distributed sieve filter (GDALSieveFilter).

Reference: gdal/alg/gdalsievefilter.cpp:183 — raster polygons smaller than
``threshold`` pixels merge into their largest neighbor polygon (neighbor
comparison :103), repeating until no small polygon remains.

Spark decomposition: reuse the polygonize 2-phase CC (region per pixel),
build the region adjacency graph (within-block neighbor pairs + cross-
block border joins), then run merge rounds on the *region* tables (tiny
relative to pixels): every small region retargets to its largest neighbor.
To keep simultaneous merging acyclic, a merge is applied only when the
target orders strictly greater by (size, -id) — smaller always flows into
larger, ties into the smaller id; remaining small regions merge in later
rounds once their neighbors have grown. This is deterministic and
partition-independent; it can differ from the reference's sequential
raster-order processing only on exotic ties, which the fixtures avoid.

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
          max_rounds: int = 20) -> DataFrame:
    regions, lab = _polygonize_full(tiles, meta, band)
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
                labels, _ = label_block(arr, nodata)
                base = _node_base(r.bx, r.by, nbx)
                for la, lb in ((labels[:, :-1], labels[:, 1:]),
                               (labels[:-1, :], labels[1:, :])):
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
                    if labels[0, x] >= 0 and py0 > 0:
                        rows.append(("e", None, None, "h",
                                     (py0 - 1) * width + px0 + x,
                                     int(base + labels[0, x])))
                    if labels[r.h - 1, x] >= 0 and py0 + r.h < height:
                        rows.append(("e", None, None, "h",
                                     (py0 + r.h - 1) * width + px0 + x,
                                     int(base + labels[r.h - 1, x])))
                for y in range(r.h):
                    if labels[y, 0] >= 0 and px0 > 0:
                        rows.append(("e", None, None, "v",
                                     (py0 + y) * (width + 1) + px0 - 1,
                                     int(base + labels[y, 0])))
                    if labels[y, r.w - 1] >= 0 and px0 + r.w < width:
                        rows.append(("e", None, None, "v",
                                     (py0 + y) * (width + 1) + px0 + r.w - 1,
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

    # ---- merge rounds on the region table --------------------------------
    # mapping: original comp → current target comp
    mapping = regions.select(F.col("region").alias("comp"),
                             F.col("region").alias("tgt"))
    base_sizes = regions.select(F.col("region").alias("comp"),
                                F.col("n_pixels"), F.col("value"))
    for _ in range(max_rounds):
        cur_sizes = (base_sizes.join(mapping, on="comp")
                     .groupBy("tgt").agg(F.sum("n_pixels").alias("size")))
        # current-level adjacency
        ma = mapping.withColumnRenamed("comp", "ca").withColumnRenamed("tgt", "ta")
        mb = mapping.withColumnRenamed("comp", "cb").withColumnRenamed("tgt", "tb")
        cur_adj = (sym_adj.join(ma, on="ca").join(mb, on="cb")
                   .select("ta", "tb").filter(F.col("ta") != F.col("tb"))
                   .distinct())
        sa = cur_sizes.withColumnRenamed("tgt", "ta").withColumnRenamed("size", "sza")
        sb = cur_sizes.withColumnRenamed("tgt", "tb").withColumnRenamed("size", "szb")
        scored = cur_adj.join(sa, on="ta").join(sb, on="tb")
        # small region ta picks largest neighbor tb; acyclic order guard
        best = (scored.filter(F.col("sza") < threshold)
                .withColumn("_ord", F.struct(F.col("szb"), -F.col("tb")))
                .groupBy("ta", "sza")
                .agg(F.max_by("tb", F.col("_ord")).alias("new_tgt"),
                     F.max("szb").alias("bsz"), F.min("tb").alias("btb")))
        moves = (best.filter((F.col("bsz") > F.col("sza"))
                             | ((F.col("bsz") == F.col("sza"))
                                & (F.col("new_tgt") < F.col("ta"))))
                 .select(F.col("ta").alias("tgt"), "new_tgt"))
        n_moves = moves.limit(1).count()
        if n_moves == 0:
            break
        mapping = (mapping.join(moves, on="tgt", how="left")
                   .select("comp", F.coalesce("new_tgt", "tgt").alias("tgt")))
        # pointer-jump chains created this round
        m2 = mapping.select(F.col("comp").alias("tgt"), F.col("tgt").alias("t2"))
        mapping = (mapping.join(m2, on="tgt", how="left")
                   .select("comp", F.coalesce("t2", "tgt").alias("tgt")))
        # truncate lineage — iterated self-joins otherwise grow the plan
        # exponentially (and wall time with it)
        mapping = mapping.localCheckpoint(eager=True)

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
                    labels, _ = label_block(arr, nodata)
                    base = _node_base(r.bx, r.by, nbx)
                    for item in relab:
                        out[labels == int(item["node"] - base)] = item["tval"]
                rows.append((r.raster_id + "_sieved", r.band, r.bx, r.by,
                             r.w, r.h, out.tobytes()))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bx", "by",
                                              "w", "h", "data"])

    return joined.mapInPandas(relabel, schema=TILE_SCHEMA)
