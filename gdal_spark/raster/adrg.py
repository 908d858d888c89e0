"""ADRG (ARC Digitized Raster Graphics) reader — ISO8211 .GEN general
information file + raw .IMG pixel file, mirroring
gdal/frmts/adrg/adrgdataset.cpp:

- the GIN record's GEN field fixes the geotransform
  (gt = LSO, 360/ARV, 0, PSO, 0, -360/BRV); OVV records carry the
  overview (OVI field) with the same shape;
- SPR gives the 128x128 tile grid (NFL x NFC), the .IMG file name
  (BAD) and whether a tile index map (TIM/TSI) is present — index 0
  means an all-zero tile;
- .IMG pixel data starts after its ISO8211 header's IMG field marker,
  each tile 128*128*3 bytes, band-sequential within the tile (RGB).
"""

from __future__ import annotations

import os

import numpy as np

from gdal_spark.sources.iso8211 import DDFModule

TILE = 128


def _lon(s: str) -> float:
    """±DDDMMSS.SS -> decimal degrees (adrgdataset.cpp
    GetLongitudeFromString)."""
    sign = -1.0 if s[0] == "-" else 1.0
    return sign * (int(s[1:4]) + int(s[4:6]) / 60.0 + float(s[6:]) / 3600.0)


def _lat(s: str) -> float:
    sign = -1.0 if s[0] == "-" else 1.0
    return sign * (int(s[1:3]) + int(s[3:5]) / 60.0 + float(s[5:]) / 3600.0)


class ADRG:
    def __init__(self, gen_path: str, record_type: str = "GIN"):
        self.dir = os.path.dirname(os.path.abspath(gen_path))
        found = None
        for rec in DDFModule.open(gen_path).records():
            rty = rec.subfield("001", "RTY")
            if rty != record_type:
                continue
            if record_type == "GIN":
                if rec.subfield("DSI", "PRT", "").strip() != "ADRG":
                    continue
                if rec.subfield("GEN", "STR") != 3:
                    continue
            found = rec
            break
        if found is None:
            raise ValueError(f"no {record_type} record in {gen_path}")
        rec = found
        geo = "GEN" if record_type == "GIN" else "OVI"
        self.arv = rec.subfield(geo, "ARV")
        self.brv = rec.subfield(geo, "BRV")
        self.lso = _lon(rec.subfield(geo, "LSO"))
        self.pso = _lat(rec.subfield(geo, "PSO"))
        self.nfl = rec.subfield("SPR", "NFL")
        self.nfc = rec.subfield("SPR", "NFC")
        if rec.subfield("SPR", "PNC") != TILE or \
                rec.subfield("SPR", "PNL") != TILE:
            raise ValueError("ADRG tiles must be 128x128")
        self.img_name = rec.subfield("SPR", "BAD").split(" ")[0]
        self.width = self.nfc * TILE
        self.height = self.nfl * TILE
        self.scale = rec.subfield("GEN", "SCA") if record_type == "GIN" \
            else None
        self.name = (rec.subfield("DSI", "NAM") or "").strip()

        self.tile_index = None
        if (rec.subfield("SPR", "TIF") or "N").startswith("Y"):
            tim = rec.field("TIM")
            self.tile_index = [g["TSI"] for g in tim.values()] \
                if tim else None

        img_path = os.path.join(self.dir, self.img_name)
        if not os.path.exists(img_path):
            for f in os.listdir(self.dir):
                if f.lower() == self.img_name.lower():
                    img_path = os.path.join(self.dir, f)
                    break
        self.img = open(img_path, "rb").read()
        self.data_offset = self._img_data_offset(self.img)

    @staticmethod
    def _img_data_offset(d: bytes) -> int:
        """Skip the .IMG's own ISO8211 header: scan for the 'IMG'
        field marker and the space padding after it
        (adrgdataset.cpp:1100)."""
        i = 0
        while i < len(d):
            if d[i] == 30 and d[i + 1:i + 4] == b"IMG":
                i += 3 + 4 + 3
                while d[i] == 0x20:
                    i += 1
                return i + 1
            i += 1
        raise ValueError("no IMG field in .IMG file")

    def geotransform(self):
        return (self.lso, 360.0 / self.arv, 0.0,
                self.pso, 0.0, -360.0 / self.brv)

    def read_band(self, band: int = 0) -> np.ndarray:
        out = np.zeros((self.height, self.width), np.uint8)
        for by in range(self.nfl):
            for bx in range(self.nfc):
                i = by * self.nfc + bx
                if self.tile_index is not None:
                    tsi = self.tile_index[i]
                    if tsi == 0:
                        continue
                    off = self.data_offset + (tsi - 1) * TILE * TILE * 3
                else:
                    off = self.data_offset + i * TILE * TILE * 3
                off += band * TILE * TILE
                out[by * TILE:(by + 1) * TILE, bx * TILE:(bx + 1) * TILE] = \
                    np.frombuffer(self.img, np.uint8, TILE * TILE, off) \
                    .reshape(TILE, TILE)
        return out


def open_adrg(path: str, record_type: str = "GIN") -> ADRG:
    """path: the .GEN file, a .THF transmittal (resolved to its first
    coverage's .GEN), or 'ADRG:<gen>,<img>' like the reference."""
    if path.upper().startswith("ADRG:"):
        path = path[5:].split(",")[0]
    if path.upper().endswith(".THF"):
        d = os.path.dirname(os.path.abspath(path))
        gens = [f for f in os.listdir(d) if f.upper().endswith(".GEN")]
        if not gens:
            raise ValueError("no .GEN next to .THF")
        path = os.path.join(d, sorted(gens)[0])
    return ADRG(path, record_type)


def read_adrg(spark, path: str, raster_id: str | None = None,
              block: int = TILE):
    """Distributed read: one executor task per band (mapInPandas)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from gdal_spark.raster.model import TILE_SCHEMA, RasterMeta

    a = open_adrg(path)
    rid = raster_id or a.name or "adrg"
    meta = RasterMeta(rid, a.width, a.height, gt=a.geotransform(),
                      dtype="uint8", block=block)
    height, width = a.height, a.width

    spec = spark.createDataFrame(
        [(b,) for b in range(3)],
        StructType([StructField("band", IntegerType())]))

    def run(batches):
        aa = open_adrg(path)
        for pdf in batches:
            rows = []
            for b in pdf["band"]:
                arr = aa.read_band(int(b))
                for by in range((height + block - 1) // block):
                    for bx in range((width + block - 1) // block):
                        sub = np.ascontiguousarray(
                            arr[by * block:(by + 1) * block,
                                bx * block:(bx + 1) * block])
                        rows.append((rid, int(b), bx, by, sub.shape[1],
                                     sub.shape[0], sub.tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA])

    return spec.mapInPandas(run, schema=TILE_SCHEMA), meta
