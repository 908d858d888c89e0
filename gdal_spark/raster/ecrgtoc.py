"""ECRG TOC (Enhanced Compressed Raster Graphics table-of-contents)
reader.

Reference semantics: gdal/frmts/nitf/ecrgtocdataset.cpp — TOC.xml lists
products/discs/scales/frames; each 2304x2304 frame's placement comes
entirely from its NAME: the first 10 characters are a base-34 number
(letters i and o excluded, GetFromBase34 :227) giving row*cols+col in
the zone's frame grid; pixel sizes derive from the ADRG east-west/
north-south pixel constants for the scale with CADRG 150% reduction and
384/256 ECRG rescale (GetExtent :278: nEW = NEAR_ROUND(CEIL_ROUND(
ACst*1e6/scale,512)/1.5,256)/256*384, etc.); zone latitudes from
MIL-PRF-32283 Table II. Subdatasets are named
ECRG_TOC_ENTRY:<product>:<disc>:<toc path>."""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

ECRG_PIXELS = 2304
_ZONE_UPPER_LAT = [0, 32, 48, 56, 64, 68, 72, 76, 80]
_ACST_ADRG = [369664, 302592, 245760, 199168, 163328, 137216, 110080,
              82432]
_BCST_ADRG = 400384


def _ceil_round(a: float, b: float) -> int:
    return int(math.ceil(a / b) * b)


def _near_round(a: float, b: float) -> int:
    return int(math.floor(a / b + 0.5) * b)


def from_base34(s: str, nmax: int = 10) -> int:
    n = 0
    for ch in s[:nmax]:
        c = ch.lower()
        if "0" <= c <= "9":
            v = ord(c) - 48
        elif "a" <= c <= "h":
            v = ord(c) - 97 + 10
        elif "j" <= c < "n":
            v = ord(c) - 97 + 9
        elif "p" < c <= "z":
            v = ord(c) - 97 + 8
        else:
            break
        n = n * 34 + v
    return n


def scale_from_string(s: str) -> int:
    i = s.find("1:")
    p = s[i + 2:] if i >= 0 else s
    n = 0
    for ch in p:
        if ch.isdigit():
            n = n * 10 + int(ch)
        elif ch == " ":
            continue
        elif ch in "kK":
            return n * 1000
        elif ch in "mM":
            return n * 1000000
        else:
            return 0
    return n


def frame_extent(frame_name: str, scale: int, zone: int
                 ) -> tuple[float, float, float, float, float, float]:
    """(minx, maxx, miny, maxy, px, py) of one frame."""
    az = abs(zone)
    new_adrg = _ceil_round(_ACST_ADRG[az - 1] * (1e6 / scale), 512)
    new_cadrg = _near_round(new_adrg / 1.5, 256)
    n_ew = new_cadrg // 256 * 384
    n_cols = int(math.ceil(n_ew / ECRG_PIXELS))
    nns_adrg = _ceil_round(_BCST_ADRG * (1e6 / scale), 512) // 4
    nns_cadrg = _near_round(nns_adrg / 1.5, 256)
    n_ns = nns_cadrg // 256 * 384
    py = 90.0 / n_ns
    frame_lat_h = py * ECRG_PIXELS
    upper = int(math.ceil(_ZONE_UPPER_LAT[az] / frame_lat_h))
    bottom = int(math.floor(_ZONE_UPPER_LAT[az - 1] / frame_lat_h))
    n_rows = upper - bottom
    if zone < 0:
        upper = -bottom
        bottom = upper - n_rows
    top_lat = frame_lat_h * upper
    fn = from_base34(frame_name, 10)
    fy, fx = fn // n_cols, fn % n_cols
    maxy = top_lat - (n_rows - 1 - fy) * frame_lat_h
    miny = maxy - frame_lat_h
    px = 360.0 / n_ew
    frame_lon_w = px * ECRG_PIXELS
    minx = -180.0 + fx * frame_lon_w
    return minx, minx + frame_lon_w, miny, maxy, px, py


@dataclass
class EcrgFrame:
    name: str
    path: str
    zone: int
    extent: tuple = ()


@dataclass
class EcrgEntry:
    product: str
    disc: str
    scale: int
    frames: list = field(default_factory=list)

    def geotransform_and_size(self) -> tuple[tuple, int, int]:
        minx = min(f.extent[0] for f in self.frames)
        maxx = max(f.extent[1] for f in self.frames)
        miny = min(f.extent[2] for f in self.frames)
        maxy = max(f.extent[3] for f in self.frames)
        px, py = self.frames[0].extent[4], self.frames[0].extent[5]
        w = int(round((maxx - minx) / px))
        h = int(round((maxy - miny) / py))
        return (minx, px, 0.0, maxy, 0.0, -py), w, h


def read_ecrg_toc(path: str) -> list[EcrgEntry]:
    root = ET.parse(path).getroot()
    toc_dir = os.path.dirname(os.path.abspath(path))
    entries = []
    for product in root.iter("product"):
        title = product.get("product_title") or ""
        for disc in product.iter("disc"):
            disc_id = disc.get("id") or ""
            by_scale: dict[int, EcrgEntry] = {}
            for sc in disc.iter("scale"):
                scale = scale_from_string(sc.get("size") or "")
                if scale == 0:
                    continue
                e = by_scale.setdefault(
                    scale, EcrgEntry(title, disc_id, scale))
                for fr in sc.iter("frame"):
                    name = fr.get("name") or ""
                    fpath = (fr.findtext("frame_path") or "") \
                        .replace("\\", "/")
                    zone_t = fr.findtext("frame_zone") or "1"
                    zone = int(zone_t)
                    full = os.path.join(toc_dir, fpath, name)
                    f = EcrgFrame(name, full, zone)
                    f.extent = frame_extent(name, scale, zone)
                    e.frames.append(f)
            entries.extend(v for v in by_scale.values() if v.frames)
    return entries


def ecrg_subdatasets(path: str) -> list[str]:
    return [f"ECRG_TOC_ENTRY:{e.product}:{e.disc}:{path}"
            for e in read_ecrg_toc(path)]


def ecrg_file_list(path: str) -> list[str]:
    """TOC + every frame path (the reference's GetFileList)."""
    out = [path]
    for e in read_ecrg_toc(path):
        out.extend(f.path for f in e.frames)
    return out
