"""Bit-exact re-implementation of GDALChecksumImage — the autotest golden
workhorse (reference: gdal/alg/gdalchecksum.cpp:122-159).

Reference algorithm (full-raster window): scan pixels row-major; for pixel
k (k = y*width + x) convert the value to Int32 per GDALCopyWords rules,
then ``checksum += val % primes[k % 11]; checksum &= 0xffff``. Because
masking with 0xffff is mod-2^16 and addition commutes with it, the per-step
mask equals one final mask over the int64 partial sums — which is what
makes the checksum *distributable*: each block contributes
``sum(cval % primes[(y*W + x) % 11])`` using only its own global pixel
indices, and a final agg folds partials. C-style truncating remainder
(sign of dividend) is preserved via np.fmod.

Float conversion (gdalchecksum.cpp:100-121): NaN/Inf → 0x80000000 (as
int32, i.e. -2147483648); else val+0.5, clamped to ±2147483647,
floor-truncated.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.model import RasterMeta

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _to_int32(arr: np.ndarray) -> np.ndarray:
    """GDALCopyWords float→Int32 conversion (gdalchecksum.cpp:100-121)."""
    if arr.dtype.kind == "f":
        v = arr.astype(np.float64) + 0.5
        bad = ~np.isfinite(arr)
        v = np.clip(v, -2147483647.0, 2147483647.0)
        out = np.floor(v).astype(np.int64)
        out[bad] = -2147483648
        return out
    # integer inputs read through GInt32 buffers in the reference —
    # GDALCopyWords clamps out-of-range values (uint32/int64 > 2^31-1)
    return np.clip(arr.astype(np.int64), -2147483648, 2147483647)


def block_checksum_partial(block: np.ndarray, x0: int, y0: int, width: int) -> int:
    """Partial checksum sum for one block at global offset (x0, y0)."""
    h, w = block.shape
    vals = _to_int32(block)
    gx = np.arange(x0, x0 + w, dtype=np.int64)[None, :]
    gy = np.arange(y0, y0 + h, dtype=np.int64)[:, None]
    prime_idx = (gy * width + gx) % 11
    return int(np.fmod(vals, PRIMES[prime_idx]).sum())


def py_checksum(arr: np.ndarray) -> int:
    """Driver-side reference twin over a full array (tests). Complex
    bands checksum over interleaved (real, imag) components — the
    reference reads complex data as CInt32/CFloat64 pairs and runs the
    same modulo loop over 2x the samples (gdalchecksum.cpp:69-155)."""
    if np.iscomplexobj(arr):
        inter = np.empty(arr.shape + (2,), np.float64)
        inter[..., 0] = arr.real
        inter[..., 1] = arr.imag
        arr = inter.reshape(arr.shape[0], -1)
    return block_checksum_partial(arr, 0, 0, arr.shape[1]) & 0xFFFF


def checksum(tiles: DataFrame, meta: RasterMeta) -> DataFrame:
    """(raster_id, band, checksum) — distributed GDALChecksumImage."""
    dtype, width, block = meta.dtype, meta.width, meta.block

    schema = T.StructType([
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("partial", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            partials = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(bytes(r.data), dtype=dtype).reshape(r.h, r.w)
                partials.append(block_checksum_partial(
                    arr, r.bx * block, r.by * block, width))
            yield pd.DataFrame({"raster_id": pdf["raster_id"],
                                "band": pdf["band"], "partial": partials})

    parts = tiles.mapInPandas(run, schema=schema)
    # two's-complement 0xffff mask on the (possibly negative) int64 total
    total = F.sum("partial")
    masked = F.pmod(total, F.lit(65536)).cast("int")
    return (parts.groupBy("raster_id", "band")
            .agg(masked.alias("checksum")))
