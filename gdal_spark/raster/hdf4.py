"""HDF4 scientific-dataset reader (pure numpy, from the public HDF 4.x
specification: DD-block chains, NDG numeric data groups, SDD dimension
records, NT number types, Vgroup/Vdata structures for SD-interface
names and attributes).

Driver semantics mirror gdal/frmts/hdf4/hdf4dataset.cpp: each SDS
(numeric data group) is a subdataset; X = last dim, Y = second-to-last,
leading dims unroll into bands; data is big-endian on disk.

Supported storage: plain contiguous SD data and RLE-compressed
(DFTAG_COMPRESSED with scheme 11) elements. Chunked/NBIT storage raises
with the structure named.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"\x0e\x03\x13\x01"

TAG_NT = 106
TAG_SDD = 701
TAG_SD = 702
TAG_SDL = 704
TAG_NDG = 720
TAG_COMPRESSED = 40
TAG_VH = 1962
TAG_VS = 1963
TAG_VG = 1965

# DFNT number types → numpy dtype (big-endian on disk)
_DFNT = {3: "u1", 4: "S1", 5: ">f4", 6: ">f8",
         20: "i1", 21: "u1", 22: ">i2", 23: ">u2",
         24: ">i4", 25: ">u4", 26: ">i8", 27: ">u8"}


@dataclass
class SDS:
    index: int
    name: str
    dims: tuple
    dtype: str
    data_off: int
    data_len: int
    compressed: bool = False
    attrs: dict = field(default_factory=dict)


class H4File:
    def __init__(self, data: bytes):
        if data[:4] != MAGIC:
            raise ValueError("not an HDF4 file")
        self.d = data
        self.dds: dict[tuple[int, int], tuple[int, int]] = {}
        off = 4
        while off not in (0, 0xFFFFFFFF) and off < len(data):
            ndds, nxt = struct.unpack_from(">hI", data, off)
            p = off + 6
            for _ in range(ndds):
                tag, ref, o, ln = struct.unpack_from(">HHiI", data, p)
                if tag not in (0, 1):  # skip free/null entries
                    self.dds[(tag & 0x3FFF, ref)] = (o, ln)
                p += 12
            off = nxt
        self.sds = self._scan_sds()

    def _blob(self, tag, ref):
        o, ln = self.dds[(tag, ref)]
        return self.d[o:o + ln]

    # ---- Vgroups: SDS names from the SD interface -----------------------
    def _vgroups(self):
        out = {}
        for (tag, ref), (o, ln) in self.dds.items():
            if tag != TAG_VG:
                continue
            b = self.d[o:o + ln]
            (nelt,) = struct.unpack_from(">H", b, 0)
            tags = struct.unpack_from(f">{nelt}H", b, 2)
            refs = struct.unpack_from(f">{nelt}H", b, 2 + 2 * nelt)
            p = 2 + 4 * nelt
            (namelen,) = struct.unpack_from(">H", b, p)
            name = b[p + 2:p + 2 + namelen].decode("latin-1")
            p += 2 + namelen
            (classlen,) = struct.unpack_from(">H", b, p)
            vclass = b[p + 2:p + 2 + classlen].decode("latin-1")
            out[ref] = (name.rstrip("\x00"), vclass.rstrip("\x00"),
                        list(zip(tags, refs)))
        return out

    # ---- scientific data sets -------------------------------------------
    def _scan_sds(self) -> list[SDS]:
        # map NDG ref → vgroup name (class 'Var0.0' per the SD interface)
        vg_name_for = {}
        for _ref, (name, vclass, members) in self._vgroups().items():
            if vclass.startswith("Var"):
                for t, r in members:
                    if t == TAG_NDG:
                        vg_name_for[r] = name
        out = []
        idx = 0
        for (tag, ref) in sorted(self.dds):
            if tag != TAG_NDG:
                continue
            members = self._blob(TAG_NDG, ref)
            pairs = [struct.unpack_from(">HH", members, i)
                     for i in range(0, len(members), 4)]
            sdd = next((r for t, r in pairs if t == TAG_SDD), None)
            sd = next((r for t, r in pairs if t == TAG_SD), None)
            if sdd is None or sd is None:
                continue
            b = self._blob(TAG_SDD, sdd)
            (rank,) = struct.unpack_from(">H", b, 0)
            dims = struct.unpack_from(f">{rank}i", b, 2)
            nt_tag, nt_ref = struct.unpack_from(">HH", b, 2 + 4 * rank)
            nt = self._blob(TAG_NT, nt_ref)
            dfnt = nt[1]
            dtype = _DFNT.get(dfnt)
            if dtype is None:
                raise ValueError(f"DFNT type {dfnt} not supported")
            o, ln = self.dds[(TAG_SD, sd)]
            compressed = (TAG_COMPRESSED, sd) in self.dds
            name = vg_name_for.get(ref, f"sds_{idx}")
            out.append(SDS(idx, name, tuple(dims), dtype, o, ln,
                           compressed))
            idx += 1
        return out

    def read(self, sds: SDS) -> np.ndarray:
        n = int(np.prod(sds.dims)) if sds.dims else 0
        raw = self.d[sds.data_off:sds.data_off + sds.data_len]
        if sds.compressed:
            raw = _rle_decode(raw, n * np.dtype(sds.dtype).itemsize)
        return np.frombuffer(raw, dtype=sds.dtype,
                             count=n).reshape(sds.dims)


def _rle_decode(raw: bytes, out_len: int) -> bytes:
    """HDF4 RLE scheme (DFTAG_RLE semantics): count byte n —
    n < 128: copy n+1 literal bytes; n >= 128: repeat next byte
    (n & 0x7F) + 3 times."""
    out = bytearray()
    i = 0
    while i < len(raw) and len(out) < out_len:
        n = raw[i]
        i += 1
        if n < 128:
            out += raw[i:i + n + 1]
            i += n + 1
        else:
            out += raw[i:i + 1] * ((n & 0x7F) + 3)
            i += 1
    return bytes(out[:out_len])


def subdatasets(data: bytes) -> list[str]:
    return [s.name for s in H4File(data).sds if len(s.dims) >= 2]


def read_band(data: bytes, name_or_idx, band: int = 0) -> np.ndarray:
    h4 = H4File(data)
    if isinstance(name_or_idx, int):
        sds = h4.sds[name_or_idx]
    else:
        sds = next(s for s in h4.sds if s.name == name_or_idx)
    arr = h4.read(sds)
    if arr.ndim < 2:
        raise ValueError(f"{sds.name} is not a raster")
    flat = arr.reshape(-1, arr.shape[-2], arr.shape[-1])
    # expose in native byte order for downstream kernels
    return np.ascontiguousarray(flat[band]).astype(
        np.dtype(sds.dtype).newbyteorder("="))


def read_hdf4(spark, path: str, dataset: str | None = None,
              raster_id: str | None = None, block: int = 256):
    """Distributed open: DD walk on the driver, one task per band."""
    import os

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

    with open(path, "rb") as fh:
        data = fh.read()
    h4 = H4File(data)
    rasters = [s for s in h4.sds if len(s.dims) >= 2]
    if dataset is None:
        if len(rasters) != 1:
            raise ValueError(
                f"pick one of {[s.name for s in rasters]}")
        sds = rasters[0]
    else:
        sds = next(s for s in rasters if s.name == dataset)
    height, width = sds.dims[-2], sds.dims[-1]
    n_bands = int(np.prod(sds.dims[:-2])) if len(sds.dims) > 2 else 1
    out_dtype = np.dtype(sds.dtype).newbyteorder("=").name
    rid = raster_id or (os.path.splitext(os.path.basename(path))[0]
                        + ":" + sds.name)
    meta = RasterMeta(rid, width, height, dtype=out_dtype, block=block)

    spec = spark.createDataFrame(
        [(b,) for b in range(n_bands)],
        StructType([StructField("band", IntegerType())]))
    name = sds.name

    def run(batches):
        with open(path, "rb") as fh:
            blob = fh.read()
        for pdf in batches:
            rows = []
            for b in pdf["band"]:
                arr = read_band(blob, name, int(b)).astype(out_dtype)
                for by in range((height + block - 1) // block):
                    for bx in range((width + block - 1) // block):
                        sub = np.ascontiguousarray(
                            arr[by * block:(by + 1) * block,
                                bx * block:(bx + 1) * block])
                        rows.append((rid, int(b), bx, by, sub.shape[1],
                                     sub.shape[0], sub.tobytes()))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in TILE_SCHEMA])

    return spec.mapInPandas(run, schema=TILE_SCHEMA), meta
