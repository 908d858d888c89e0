"""Tile assignment + pyramid rollup (the gdal2tiles.py job shape).

Base pass: every point gets its (z, tx, ty) via closed-form column math
(gdal2tiles.py:211-318); per-tile aggregation is one shuffle on the tile
key. Overview pass: zoom z-1 tiles aggregate their 4 children via
``groupBy(tx//2, ty//2)`` iterated down to min_zoom — the distributed
analog of gdal2tiles.py:1313-1400 (4-child overview resampling), here over
per-tile statistics rather than pixels (pixel pyramids live in
operators/resample.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions import tiles


def tile_counts(points: DataFrame, zoom: int, lon: str = "lon", lat: str = "lat",
                weight: str | None = None) -> DataFrame:
    """Per-tile point counts (and optional weight sums) at ``zoom``.
    Output: (zoom, tx, ty, quadkey, n [, wsum])."""
    df = tiles.with_tile_columns(points, lon=lon, lat=lat, zoom=zoom)
    aggs = [F.count(F.lit(1)).alias("n")]
    if weight is not None:
        aggs.append(F.sum(weight).alias("wsum"))
    return (
        df.groupBy("tx", "ty")
        .agg(*aggs)
        .withColumn("zoom", F.lit(zoom))
        .withColumn("quadkey", tiles.quadkey(F.col("tx"), F.col("ty"), zoom))
        .select("zoom", "tx", "ty", "quadkey", *[a for a in ("n", "wsum") if weight or a == "n"])
    )


def pyramid(base: DataFrame, zoom: int, min_zoom: int = 0) -> DataFrame:
    """Roll per-tile counts up from ``zoom`` to ``min_zoom``; returns the
    union over all levels. Each level is one narrow-key shuffle of the
    previous (already-reduced) level — the overview-pass dataflow."""
    has_w = "wsum" in base.columns
    levels = [base]
    cur = base
    for z in range(zoom - 1, min_zoom - 1, -1):
        aggs = [F.sum("n").alias("n")] + ([F.sum("wsum").alias("wsum")] if has_w else [])
        cur = (
            cur.groupBy(
                tiles.parent_tile(F.col("tx")).alias("tx"),
                tiles.parent_tile(F.col("ty")).alias("ty"),
            )
            .agg(*aggs)
            .withColumn("zoom", F.lit(z))
            .withColumn("quadkey", tiles.quadkey(F.col("tx"), F.col("ty"), z))
            .select("zoom", "tx", "ty", "quadkey", *(["n", "wsum"] if has_w else ["n"]))
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
