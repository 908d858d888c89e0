"""SRP (ASRP/USRP Standard Raster Product) reader over the ISO8211
module.

Reference semantics: gdal/frmts/adrg/srpdataset.cpp — a dataset is a
.GEN general-information file (record RTY=GIN, STR=4) plus a .IMG tile
payload named by SPR.BAD; 128x128 tiles, optional TIM tile index where
0 = empty tile, optional run-length compression PCB=4/8 with PVB=8
(IReadBlock :245-320: count/value pairs, 4-bit counts packed two per
byte with a flush at each 128-pixel row end); geotransform from
GEN ARV/BRV/LSO/PSO (ASRP, arc-second lattice :390-410) or LOD/LAD/
LSO/PSO (USRP, meters); CRS from ZNA (UTM zone, +-61 = UPS, ASRP
geographic, ZNA 9/18 = polar azimuthal equidistant :745-780); color
table and classification/date metadata from the .QAL quality file
(:642-722); a .THF transmittal header lists member .GEN files
(GetGENListFromTHF :1010) and contributes VDR/LCF metadata
(AddMetadatafromFromTHF :1158)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.raster.model import RasterMeta, from_array
from gdal_spark.sources.iso8211 import DDFModule

TILE = 128


def _ci_path(dirname: str, name: str) -> str | None:
    p = os.path.join(dirname, name)
    if os.path.exists(p):
        return p
    low = name.lower()
    for f in os.listdir(dirname or "."):
        if f.lower() == low:
            return os.path.join(dirname, f)
    return None


def thf_gen_list(thf_path: str) -> list[str]:
    """Member .GEN paths from a .THF transmittal (FDR.NAM entries)."""
    out = []
    d = os.path.dirname(os.path.abspath(thf_path))
    for rec in DDFModule.open(thf_path).records():
        if rec.subfield("001", "RTY") != "THF":
            continue
        fdr = rec.field("FDR")
        if fdr is None:
            continue
        for grp in fdr.values():
            nam = (grp.get("NAM") or "").strip()
            if not nam:
                continue
            # GDAL probes <dir>/<NAM[:6]>/ for a .GEN, then the THF's
            # own directory (GetGENListFromTHF :1070-1140)
            sub = os.path.join(d, nam[:6])
            cands = []
            if os.path.isdir(sub):
                cands += [os.path.join(sub, f) for f in sorted(os.listdir(sub))
                          if f.upper().endswith(".GEN")]
            if not cands:
                cands += [os.path.join(d, f) for f in sorted(os.listdir(d))
                          if f.upper().endswith(".GEN")
                          and f.upper().startswith(nam[:6].upper())]
            if cands:
                out.append(cands[0])
    return out


def _thf_metadata(thf_path: str) -> dict:
    md = {}
    for rec in DDFModule.open(thf_path).records():
        rty = rec.subfield("001", "RTY")
        if rty == "THF":
            voo = rec.subfield("VDR", "VOO")
            if voo is not None:
                md["SRP_VOO"] = voo
            edn = rec.subfield("VDR", "EDN")
            if edn is not None:
                md["SRP_EDN"] = str(int(edn))
            cdv = rec.subfield("VDR", "CDV07")
            if cdv is not None:
                md["SRP_CREATIONDATE"] = cdv
            else:
                dat = rec.subfield("VDR", "DAT")
                if dat is not None:
                    md["SRP_CREATIONDATE"] = str(dat)[4:12]
        elif rty == "LCF":
            qss = rec.subfield("QSR", "QSS")
            if qss is not None:
                md["SRP_CLASSIFICATION"] = qss
            src = rec.subfield("QUV", "SRC1") or rec.subfield("QUV", "SRC")
            if src is not None:
                md["SRP_PRODUCTVERSION"] = src
    return md


class SRP:
    def __init__(self, gen_path: str, img_name: str | None = None):
        self.dir = os.path.dirname(os.path.abspath(gen_path))
        found = None
        for rec in DDFModule.open(gen_path).records():
            if rec.subfield("001", "RTY") != "GIN":
                continue
            if rec.subfield("GEN", "STR") != 4:
                continue
            bad = (rec.subfield("SPR", "BAD") or "").split(" ")[0]
            if img_name is not None and \
                    bad.lower() != os.path.basename(img_name).lower():
                continue
            found = rec
            break
        if found is None:
            raise ValueError(f"no usable GIN record in {gen_path}")
        rec = found
        prt = (rec.subfield("DSI", "PRT") or "")[:4]
        if prt not in ("ASRP", "USRP"):
            raise ValueError(f"unsupported SRP product {prt!r}")
        self.product = prt
        self.nam = rec.subfield("DSI", "NAM") or ""
        self.sca = rec.subfield("GEN", "SCA")
        self.zna = rec.subfield("GEN", "ZNA") or 0
        self.arv = rec.subfield("GEN", "ARV")
        self.brv = rec.subfield("GEN", "BRV")
        self.lso = float(rec.subfield("GEN", "LSO") or 0)
        self.pso = float(rec.subfield("GEN", "PSO") or 0)
        self.lod = float(rec.subfield("GEN", "LOD") or 0)
        self.lad = float(rec.subfield("GEN", "LAD") or 0)
        self.nfl = rec.subfield("SPR", "NFL")
        self.nfc = rec.subfield("SPR", "NFC")
        if rec.subfield("SPR", "PNC") != TILE or \
                rec.subfield("SPR", "PNL") != TILE:
            raise ValueError("SRP tiles must be 128x128")
        self.pcb = rec.subfield("SPR", "PCB") or 0
        self.pvb = rec.subfield("SPR", "PVB") or 8
        self.width = self.nfc * TILE
        self.height = self.nfl * TILE
        self.img_name = (rec.subfield("SPR", "BAD") or "").split(" ")[0]

        self.tile_index = None
        if (rec.subfield("SPR", "TIF") or "N").startswith("Y"):
            tim = rec.field("TIM")
            if tim is not None:
                self.tile_index = [g["TSI"] for g in tim.values()]

        img_path = _ci_path(self.dir, self.img_name)
        if img_path is None:
            raise ValueError(f"cannot find {self.img_name} beside {gen_path}")
        self.img = open(img_path, "rb").read()
        self.data_offset = self._img_data_offset(self.img)

        self.metadata = {"SRP_NAM": self.nam.strip(),
                         "SRP_PRODUCT": self.product,
                         "SRP_SCA": str(self.sca),
                         "SRP_ZNA": str(self.zna)}
        self.color_table: list[tuple[int, int, int, int]] = []
        base = os.path.splitext(os.path.basename(gen_path))[0]
        qal = _ci_path(self.dir, base + ".QAL")
        if qal:
            self._read_qal(qal)

    @staticmethod
    def _img_data_offset(d: bytes) -> int:
        """Skip the .IMG's ISO8211 wrapper: find the IMG field tag,
        skip its 4 leading attribute bytes + padding up to the next
        unit separator (srpdataset.cpp:575-620)."""
        i = 0
        while i < len(d) - 3:
            if d[i] == 30 and d[i + 1:i + 4] == b"IMG":
                i += 3 + 4 + 3
                while d[i] != 30:
                    i += 1
                return i + 1
            i += 1
        raise ValueError("no IMG field in .IMG file")

    def _read_qal(self, qal_path: str) -> None:
        for rec in DDFModule.open(qal_path).records():
            col = rec.field("COL")
            if col is not None:
                for grp in col.values():
                    ccd = int(grp["CCD"])
                    while len(self.color_table) <= ccd:
                        self.color_table.append((0, 0, 0, 255))
                    self.color_table[ccd] = (int(grp["NSR"]),
                                             int(grp["NSG"]),
                                             int(grp["NSB"]), 255)
            quv = rec.field("QUV")
            if quv is not None:
                g = quv.values()[0]
                if g.get("EDN") is not None:
                    # atoi semantics: blank -> 0 (GetIntSubfield)
                    s = str(g["EDN"]).strip()
                    self.metadata["SRP_EDN"] = \
                        str(int(s)) if s.lstrip("+-").isdigit() else "0"
                if g.get("CDV07") is not None:
                    self.metadata["SRP_CREATIONDATE"] = str(g["CDV07"])
                elif g.get("DAT1") is not None:
                    self.metadata["SRP_CREATIONDATE"] = str(g["DAT1"])[4:12]
                if g.get("CDV24") is not None:
                    self.metadata["SRP_REVISIONDATE"] = str(g["CDV24"])
                elif g.get("DAT2") is not None:
                    self.metadata["SRP_REVISIONDATE"] = str(g["DAT2"])[4:12]
            qsr = rec.field("QSR")
            if qsr is not None:
                g = qsr.values()[0]
                if g.get("QSS") is not None:
                    self.metadata["SRP_CLASSIFICATION"] = g["QSS"]

    def geotransform(self) -> tuple:
        if self.product == "ASRP":
            if self.zna in (9, 18):
                return (-1152000.0, 500.0, 0.0, 1152000.0, 0.0, -500.0)
            return (self.lso / 3600.0, 360.0 / self.arv, 0.0,
                    self.pso / 3600.0, 0.0, -360.0 / self.brv)
        return (self.lso, self.lod, 0.0, self.pso, 0.0, -self.lad)

    def epsg(self) -> int | None:
        z = self.zna
        if 1 <= abs(z) <= 60 and self.product == "USRP":
            return (32600 if z > 0 else 32700) + abs(z)
        if z == 61:
            return 32661
        if z == -61:
            return 32761
        return 4326 if self.product == "ASRP" else None

    def _decode_tile(self, off: int) -> np.ndarray:
        if self.pcb == 0:
            return np.frombuffer(self.img, np.uint8, TILE * TILE,
                                 off).reshape(TILE, TILE)
        data = self.img[off:off + TILE * TILE * 2]
        out = np.zeros(TILE * TILE, np.uint8)
        i = pix = 0
        half = False
        while pix < TILE * TILE:
            if self.pcb == 8:
                count, value = data[i], data[i + 1]
                i += 2
            else:  # pcb == 4: nibble counts, byte values, row-aligned
                if pix % TILE == 0 and half:
                    i += 1
                    half = False
                if half:
                    count = data[i] & 0xF
                    value = data[i + 1]
                    i += 2
                    half = False
                else:
                    count = data[i] >> 4
                    value = ((data[i] & 0xF) << 4) | (data[i + 1] >> 4)
                    i += 1
                    half = True
            out[pix:pix + count] = value
            pix += count
        return out.reshape(TILE, TILE)

    def read_band(self) -> np.ndarray:
        out = np.zeros((self.height, self.width), np.uint8)
        for by in range(self.nfl):
            for bx in range(self.nfc):
                i = by * self.nfc + bx
                if self.tile_index is not None:
                    tsi = self.tile_index[i]
                    if tsi == 0:
                        continue
                    off = self.data_offset + ((tsi - 1) * TILE * TILE
                                              if self.pcb == 0 else tsi - 1)
                else:
                    off = self.data_offset + i * TILE * TILE
                out[by * TILE:(by + 1) * TILE,
                    bx * TILE:(bx + 1) * TILE] = self._decode_tile(off)
        return out


def open_srp(path: str) -> SRP:
    """Open by .GEN, .IMG (sibling .GEN located), or
    'SRP:<gen>,<img>' subdataset name."""
    if path.upper().startswith("SRP:"):
        gen, _, img = path[4:].partition(",")
        return SRP(gen, img or None)
    low = path.lower()
    if low.endswith(".img"):
        d = os.path.dirname(os.path.abspath(path))
        gen = _ci_path(d, os.path.basename(path)[:-4] + ".GEN")
        if gen is None:
            raise ValueError(f"no .GEN beside {path}")
        return SRP(gen, os.path.basename(path))
    if low.endswith(".thf"):
        gens = thf_gen_list(path)
        if len(gens) != 1:
            raise ValueError(
                f"THF lists {len(gens)} GENs; open one via SRP:gen,img "
                f"({gens})")
        srp = SRP(gens[0])
        srp.metadata.update(_thf_metadata(path))
        return srp
    return SRP(path)


def srp_subdatasets(thf_path: str) -> list[str]:
    """SRP:<gen>,<img> names for every member of a .THF
    (srp_5's SUBDATASETS listing)."""
    out = []
    for gen in thf_gen_list(thf_path):
        try:
            srp = SRP(gen)
        except ValueError:
            continue
        img = _ci_path(srp.dir, srp.img_name) or srp.img_name
        out.append(f"SRP:{gen},{img}")
    return out


def read_srp(spark: SparkSession, path: str, raster_id: str = "srp",
             block: int = 256) -> tuple[DataFrame, RasterMeta, SRP]:
    srp = open_srp(path)
    meta = RasterMeta(raster_id, srp.width, srp.height,
                      gt=srp.geotransform(), dtype="uint8", block=block)
    tiles = from_array(spark, srp.read_band(), meta)
    return tiles, meta, srp
