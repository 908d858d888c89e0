"""Multimodal (binary-column) pipeline plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, exactly like the ``html:binary`` column of the pages table
(BASELINE.json input_hint). The Spark-side plumbing — schema, Arrow batch
shape, partitioning — is real and tested; the codec step is REAL for
PNG/BMP/PGM/PPM/GIF/TIFF images and PCM WAV audio (pure-numpy spec
re-implementations in raster/imagecodec.py + raster/jpegcodec.py) and
for video via the two containers those codecs can express (animated GIF,
MJPEG AVI); other video containers raise clearly.

Operators:
- ``byte_features``   — vectorized per-blob statistics (length, byte
  sum, distinct bytes, entropy) via one Arrow pass.
- ``decode_image``    — real decode for PNG/BMP/PNM/TIFF → 8-bit luma
  grid rows; ``fake=True`` keeps the deterministic pseudo-decode for
  plumbing-only tests.
- ``audio_features``  — real WAV decode → integer-exact signal features.
- ``video_frames``    — real frame sampling: animated GIF + MJPEG AVI →
  every k-th frame as a luma grid.
- ``frame_sample``    — raw fixed-size-frame layout sampler (kept for
  opaque byte streams with a known stride).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def byte_features(df: DataFrame, blob: str = "blob",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, n_bytes, byte_sum, n_distinct, entropy) — vectorized numpy over
    each Arrow batch; no per-byte Python."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("n_distinct", T.IntegerType()),
        T.StructField("entropy", T.DoubleType()),
    ])
    idx = df.schema.fieldNames().index(blob)
    id_idx = df.schema.fieldNames().index(id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf.iloc[:, id_idx], pdf.iloc[:, idx]):
                a = np.frombuffer(bytes(b), dtype=np.uint8)
                counts = np.bincount(a, minlength=256)
                p = counts[counts > 0] / max(len(a), 1)
                ent = float(-(p * np.log2(p)).sum()) if len(a) else 0.0
                rows.append((int(did), len(a), int(a.sum(dtype=np.int64)),
                             int((counts > 0).sum()), round(ent, 6)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(run, schema=schema)


IMG_TILE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("h", T.IntegerType()), T.StructField("w", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),
])


def decode_image(df: DataFrame, blob: str = "blob", id_col: str = "doc_id",
                 fake: bool = False, size: tuple[int, int] = (16, 16)
                 ) -> DataFrame:
    """blob → grayscale pixel grid rows. REAL for PNG/BMP/PGM/PPM/GIF/
    JPEG(baseline)/TIFF
    (pure-numpy codecs, raster/imagecodec.py); color images are reduced
    to 8-bit luma via the BT.601 integer weights; JPEG is the pure-numpy
    baseline decoder (raster/jpegcodec.py, libjpeg-parity goldens).
    ``fake=True`` keeps the old deterministic
    pseudo-decode (first bytes tiled into an H×W grid) for plumbing
    tests that don't want real image bytes."""
    idx_blob = df.schema.fieldNames().index(blob)
    idx_id = df.schema.fieldNames().index(id_col)

    if fake:
        h, w = size

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for did, b in zip(pdf.iloc[:, idx_id], pdf.iloc[:, idx_blob]):
                    a = np.frombuffer(bytes(b), dtype=np.uint8)
                    grid = np.resize(a, (h, w))  # deterministic tile/repeat
                    rows.append((int(did), h, w, grid.tobytes()))
                yield pd.DataFrame(rows,
                                   columns=[f.name for f in IMG_TILE_SCHEMA])

        return df.mapInPandas(run, schema=IMG_TILE_SCHEMA)

    from gdal_spark.raster import imagecodec as IC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf.iloc[:, idx_id], pdf.iloc[:, idx_blob]):
                img = IC.to_gray(IC.decode_any(bytes(b)))
                rows.append((int(did), img.shape[0], img.shape[1],
                             img.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in IMG_TILE_SCHEMA])

    return df.mapInPandas(run, schema=IMG_TILE_SCHEMA)


def audio_features(df: DataFrame, blob: str = "blob",
                   id_col: str = "doc_id") -> DataFrame:
    """WAV blob → (id, rate, channels, n_samples, duration_s, sq_sum,
    zero_crossings). Real decode (raster/imagecodec.py RIFF parser);
    features are integer-exact so oracles can verify them closed-form."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sq_sum", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ])
    idx_blob = df.schema.fieldNames().index(blob)
    idx_id = df.schema.fieldNames().index(id_col)

    from gdal_spark.raster import imagecodec as IC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf.iloc[:, idx_id], pdf.iloc[:, idx_blob]):
                a, rate = IC.wav_decode(bytes(b))
                n, ch = a.shape
                mono = a[:, 0].astype(np.int64)
                zc = int(((mono[1:] >= 0) != (mono[:-1] >= 0)).sum())
                rows.append((int(did), rate, ch, n, round(n / rate, 6),
                             int((a.astype(np.int64) ** 2).sum()), zc))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(run, schema=schema)


def resize_image(imgs: DataFrame, out_size: tuple[int, int]) -> DataFrame:
    """Nearest-neighbour resize of decoded pixel grids (real numpy op,
    reusing the raster resample index rule trunc(src + 1e-10))."""
    oh, ow = out_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(r.h, r.w)
                sy = np.trunc((np.arange(oh) + 0.5) * r.h / oh + 1e-10).astype(int)
                sx = np.trunc((np.arange(ow) + 0.5) * r.w / ow + 1e-10).astype(int)
                out = a[np.clip(sy, 0, r.h - 1)][:, np.clip(sx, 0, r.w - 1)]
                rows.append((r.doc_id, oh, ow, out.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in IMG_TILE_SCHEMA])

    return imgs.mapInPandas(run, schema=IMG_TILE_SCHEMA)


def video_frames(df: DataFrame, blob: str = "blob", id_col: str = "doc_id",
                 every: int = 1) -> DataFrame:
    """REAL video frame sampling: animated GIF and MJPEG AVI containers
    (raster/imagecodec.py) → every k-th frame as an 8-bit luma grid row
    (id, frame_no, h, w, pixels). The two containers expressible with
    the pure-numpy codecs; other containers raise clearly."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ])
    idx_blob = df.schema.fieldNames().index(blob)
    idx_id = df.schema.fieldNames().index(id_col)

    from gdal_spark.raster import imagecodec as IC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gdal_spark.raster.jpegcodec import jpeg_decode
        for pdf in batches:
            rows = []
            for did, b in zip(pdf.iloc[:, idx_id], pdf.iloc[:, idx_blob]):
                bb = bytes(b)
                kind = IC.detect_format(bb)
                if kind == "gif":
                    frames = IC.gif_decode_frames(bb)
                elif kind == "avi":
                    frames = [jpeg_decode(p)
                              for p in IC.avi_decode_frames(bb)]
                else:
                    raise ValueError(
                        f"unsupported video container ({kind})")
                for fno in range(0, len(frames), every):
                    g = IC.to_gray(frames[fno])
                    rows.append((int(did), fno, g.shape[0], g.shape[1],
                                 g.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(run, schema=schema)


def frame_sample(df: DataFrame, blob: str = "blob", id_col: str = "doc_id",
                 every: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video-style frame sampling plumbing: treat the blob as a sequence of
    fixed-size fake frames, emit every k-th frame's offset + bytes. A real
    container parser replaces the layout function only."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ])
    idx_blob = df.schema.fieldNames().index(blob)
    idx_id = df.schema.fieldNames().index(id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, b in zip(pdf.iloc[:, idx_id], pdf.iloc[:, idx_blob]):
                bb = bytes(b)
                n_frames = len(bb) // frame_bytes
                for fno in range(0, n_frames, every):
                    off = fno * frame_bytes
                    rows.append((int(did), fno, off, bb[off:off + frame_bytes]))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return df.mapInPandas(run, schema=schema)
