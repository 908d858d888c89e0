"""Raster statistics and histograms as partial-aggregate DataFrame ops.

Reference: GDALRasterBand::ComputeStatistics (single pass min/max/mean/
stddev over non-nodata pixels, gdal/gcore/gdalrasterband.cpp:3752),
ComputeRasterMinMax (:4232), GetHistogram (fixed buckets, :2848).

Spark shape: each block emits a partial row (count, sum, sumsq, min, max |
bucket-count vector); Catalyst's partial+final aggregation folds them —
the distributed analog of the reference's per-scanline accumulator loop.
stddev uses the same population formula sqrt(sumsq/n - mean²) the
reference uses.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.model import RasterMeta


def _iter_blocks(pdf: pd.DataFrame, dtype: str):
    for r in pdf.itertuples(index=False):
        yield r, np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)


def compute_statistics(tiles: DataFrame, meta: RasterMeta) -> DataFrame:
    """(raster_id, band, n, min, max, mean, stddev) over non-nodata pixels."""
    dtype, nodata = meta.dtype, meta.nodata
    schema = T.StructType([
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("ss", T.DoubleType()),
        T.StructField("mn", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r, arr in _iter_blocks(pdf, dtype):
                v = arr.astype(np.float64).ravel()
                # NaN pixels never enter statistics (ComputeStatistics'
                # CPLIsNan skip, gdal/gcore/gdalrasterband.cpp:3887)
                v = v[~np.isnan(v)]
                if nodata is not None:
                    v = v[v != nodata]
                if v.size == 0:
                    rows.append((r.raster_id, r.band, 0, 0.0, 0.0,
                                 np.inf, -np.inf))
                else:
                    rows.append((r.raster_id, r.band, int(v.size),
                                 float(v.sum()), float((v * v).sum()),
                                 float(v.min()), float(v.max())))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "n", "s",
                                              "ss", "mn", "mx"])

    parts = tiles.mapInPandas(run, schema=schema)
    n, s, ss = F.sum("n"), F.sum("s"), F.sum("ss")
    mean = s / n
    return (parts.groupBy("raster_id", "band").agg(
        n.alias("n"),
        F.min("mn").alias("min"), F.max("mx").alias("max"),
        mean.alias("mean"),
        F.sqrt(ss / n - mean * mean).alias("stddev")))


def histogram(tiles: DataFrame, meta: RasterMeta, lo: float, hi: float,
              n_buckets: int, include_out_of_range: bool = False) -> DataFrame:
    """(raster_id, band, bucket, count) — GetHistogram semantics: bucket i
    covers [lo + i*width, lo + (i+1)*width); out-of-range pixels are dropped
    unless ``include_out_of_range`` clamps them into the end buckets."""
    dtype, nodata = meta.dtype, meta.nodata
    width = (hi - lo) / n_buckets
    schema = T.StructType([
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r, arr in _iter_blocks(pdf, dtype):
                v = arr.astype(np.float64).ravel()
                v = v[~np.isnan(v)]  # GetHistogram skips NaN like stats
                if nodata is not None:
                    v = v[v != nodata]
                b = np.floor((v - lo) / width).astype(np.int64)
                if include_out_of_range:
                    b = np.clip(b, 0, n_buckets - 1)
                else:
                    keep = (b >= 0) & (b < n_buckets)
                    b = b[keep]
                idx, cnts = np.unique(b, return_counts=True)
                rows.extend((r.raster_id, r.band, int(i), int(c))
                            for i, c in zip(idx, cnts))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bucket", "cnt"])

    return (tiles.mapInPandas(run, schema=schema)
            .groupBy("raster_id", "band", "bucket")
            .agg(F.sum("cnt").alias("count")))


def block_summary(tiles: DataFrame, meta: RasterMeta) -> DataFrame:
    """(bx, by, n_nonzero, sum_vals) per block — compact comparable shape
    for burned/derived rasters (gdalinfo -stats style per-block report)."""
    dtype = meta.dtype
    schema = T.StructType([
        T.StructField("bx", T.IntegerType()), T.StructField("by", T.IntegerType()),
        T.StructField("n_nonzero", T.LongType()),
        T.StructField("sum_vals", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r, arr in _iter_blocks(pdf, dtype):
                v = arr.astype(np.float64)
                rows.append((r.bx, r.by, int((v != 0).sum()), float(v.sum())))
            yield pd.DataFrame(rows, columns=["bx", "by", "n_nonzero", "sum_vals"])

    return tiles.mapInPandas(run, schema=schema)
