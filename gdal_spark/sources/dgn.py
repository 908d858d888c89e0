"""DGN (MicroStation v7 design file) vector driver, read side.

Re-expresses the reference dgnlib reader + OGR layer translation
(gdal/ogr/ogrsf_frmts/dgn/dgnread.cpp, dgnhelp.cpp, dgnstroke.cpp,
dgnfloat.cpp, ogrdgnlayer.cpp) as a driver-side parse producing one
DataFrame row per translatable element — DGN files are sidecar-scale
CAD documents, the same deal as the DXF/MIF drivers here.

Covered elements: LINE(3), LINE_STRING(4), SHAPE(6, with fill-linkage
brush), CURVE(11, vertices passed through), COMPLEX_CHAIN(12) /
COMPLEX_SHAPE(14) headers with inline child assembly, ELLIPSE(15) and
ARC(16) stroked at <=5-degree steps (DGNStrokeArc), TEXT(17) with the
reference's LABEL style (font table, height format tiers).  TCB(9)
supplies UOR scale/origin (DGNParseTCB); GROUP_DATA level 1 is the
color table.  3-D files parse (Z dropped at WKB encode, the engine's
2-D contract).  Quaternion-rotated 3-D arcs keep rotation 0 like the
reference (dgnread.cpp:652 'for now we don't try to handle
quaternion').
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions import geometry as G
from gdal_spark.functions.geomops import build_polygon_from_edges

# Default MicroStation palette (dgnhelp.cpp abyDefaultPCT) — pure data
# required for PEN/BRUSH color parity when a file carries no table.
_DEFAULT_PCT = bytes.fromhex(
    "ffffff0000ff00ff00ff0000ffff00ff00ffff7f0000ffff404040c0c0c0fe00"
    "60a0e00000fea08000a0b0b0b000f0f0f0f0f00000f000f000f00000f0f000f0"
    "00f0f07a0000f0f0f0f0f00000f000f000f00000f0f000f000f0f07a0000e1e1"
    "e1e1e10000e100e100e10000e1e100e100e1e1750000e1e1e1e1e10000e100e1"
    "00e10000e1e100e100e1e1750000d2d2d2d2d20000d200d200d20000d2d200d2"
    "00d2d2700000d2d2d2d2d20000d200d200d20000d2d200d200d2d2700000c3c3"
    "c3c3c30000c300c300c30000c3c300c300c3c36b0000c3c3c3c3c30000c300c3"
    "00c30000c3c300c300c3c36b0000b4b4b4b4b40000b400b400b40000b4b400b4"
    "00b4b4660000b4b4b4b4b40000b400b400b40000b4b400b400b4b4660000a5a5"
    "a5a5a50000a500a500a50000a5a500a500a5a5610000a5a5a5a5a50000a500a5"
    "00a50000a5a500a500a5a5610000969696969600009600960096000096960096"
    "0096965c00009696969696000096009600960000969600960096965c00008787"
    "8787870000870087008700008787008700878757000087878787870000870087"
    "0087000087870087008787570000787878787800007800780078000078780078"
    "0078785200007878787878000078007800780000787800780078785200006969"
    "696969000069006900690000696900690069694d000069696969690000690069"
    "00690000696900690069694d00005a5a5a5a5a00005a005a005a00005a5a005a"
    "005a5a4800005a5a5a5a5a00005a005a005a00005a5a005a005a5a4800004b4b"
    "4b4b4b00004b004b004b00004b4b004b004b4b4300004b4b4b4b4b00004b004b"
    "004b00004b4b004b004b4b4300003c3c3c3c3c00003c003c003c00003c3c003c"
    "003c3c3e00003c3c3c3c3c00003c003c003c00003c3c003c003c3c3e00002d2d"
    "2d2d2d00002d002d002d00002d2d002d002d2d3900002d2d2d2d2d00002d002d"
    "002d00002d2d002d002d2d3900001e1e1e1e1e00001e001e001e00001e1e001e"
    "001e1e3400001e1e1e1e1e00001e001e001e00001e1e001e001ec0c0c01c0064"
)

_FONTS = {0: "STANDARD", 1: "WORKING", 2: "FANCY", 3: "ENGINEERING",
          4: "NEWZERO", 5: "STENCEL", 6: "USTN_FANCY", 7: "COMPRESSED",
          8: "STENCEQ", 10: "hand", 11: "ARCH", 12: "ARCHB",
          15: "IGES1001", 16: "IGES1002", 17: "IGES1003", 18: "CENTB",
          19: "MICROS", 22: "ISOFRACTIONS", 23: "ITALICS", 24: "ISO30",
          26: "GREEK", 27: "ISOREC", 28: "Isoeq", 30: "ISO_FONTLEFT",
          31: "ISO_FONTRIGHT", 32: "INTL_ENGINEERING", 33: "INTL_WORKING",
          34: "ISOITEQ", 36: "USTN FONT 26", 41: "ARCHITECTURAL",
          42: "BLOCK_OUTLINE", 43: "LOW_RES_FILLED", 50: "UPPERCASE",
          60: "FONT060", 61: "din", 62: "dinit", 63: "helvl",
          64: "HELVLIT", 65: "helv", 66: "HELVIT", 67: "cent",
          68: "CENTIT", 69: "SCRIPT", 76: "MICROQ", 77: "dotfont",
          78: "DOTIT", 92: "FONT092", 94: "FONT094",
          100: "ANSI_SYMBOLS", 101: "FEATURE_CONTROL_SYSMBOLS",
          102: "SYMB_FAST", 105: "INTL_ISO", 106: "INTL_ISO_EQUAL",
          107: "INTL_ISO_ITALIC", 108: "INTL_ISO_ITALIC_EQUAL"}

# PEN id per DGN line style code (ogrdgnlayer.cpp:407-425)
_PEN = {0: 'PEN(id:"ogr-pen-0"', 1: 'PEN(id:"ogr-pen-5"',
        2: 'PEN(id:"ogr-pen-2"', 3: 'PEN(id:"ogr-pen-4"',
        4: 'PEN(id:"ogr-pen-6"', 5: 'PEN(id:"ogr-pen-3"',
        6: 'PEN(id:"ogr-pen-7"', 7: 'PEN(p:"10px 5px 4px 5px"'}

# element types with no display header (dgnread.cpp:1122)
_NO_DISPHDR = {0, 9, 1, 10, 32, 44, 48, 49, 50, 51, 57, 60, 61, 62, 63}


def _vax_double(b8: bytes) -> float:
    """DGN2IEEEDouble (dgnfloat.cpp:46): VAX D-float → IEEE double with
    the reference's exact rounding (sticky low bit)."""
    d = bytes((b8[2], b8[3], b8[0], b8[1], b8[6], b8[7], b8[4], b8[5]))
    hi = int.from_bytes(d[0:4], "little")
    lo = int.from_bytes(d[4:8], "little")
    sign = hi & 0x80000000
    exponent = (hi >> 23) & 0xFF
    if exponent:
        exponent = exponent - 129 + 1023
    rndbits = lo & 0x7
    lo = (lo >> 3) & 0x1FFFFFFF | ((hi << 29) & 0xFFFFFFFF)
    if rndbits:
        lo |= 1
    hi = ((hi >> 3) & 0x000FFFFF) | (exponent << 20) | sign
    return struct.unpack(
        "<d", lo.to_bytes(4, "little") + hi.to_bytes(4, "little"))[0]


def _int32(b: bytes, off: int) -> int:
    """DGN_INT32: word-swapped signed 32-bit (dgnlibp.h:89)."""
    v = b[off + 2] + (b[off + 3] << 8) + (b[off + 1] << 24) + \
        (b[off] << 16)
    return v - (1 << 32) if v & 0x80000000 else v


class _DGN:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.scale = 1.0
        self.ox = self.oy = self.oz = 0.0
        self.dim = 2
        self.pct = _DEFAULT_PCT

    def next_raw(self):
        """DGNLoadRawElement: 4-byte header (level|complex, type|deleted,
        word count), then 2*words payload; 0xffff ends the file."""
        d, p = self.data, self.pos
        if p + 4 > len(d) or (d[p] == 0xFF and d[p + 1] == 0xFF):
            return None
        nwords = d[p + 2] + d[p + 3] * 256
        elem = d[p:p + 4 + nwords * 2]
        self.pos = p + 4 + nwords * 2
        return elem

    def transform(self, x, y, z=0.0):
        return (x * self.scale - self.ox, y * self.scale - self.oy,
                z * self.scale - self.oz)

    def color(self, idx):
        if idx < 0 or idx > 255:
            return None
        return tuple(self.pct[idx * 3:idx * 3 + 3])


def _parse_core(el: bytes) -> dict:
    """DGNParseCore (dgnread.cpp:1151)."""
    c = {"level": el[0] & 0x3F, "complex": bool(el[0] & 0x80),
         "deleted": bool(el[1] & 0x80), "type": el[1] & 0x7F,
         "graphic_group": 0, "properties": 0, "style": 0, "weight": 0,
         "color": 0, "attr": b""}
    if len(el) >= 36 and c["type"] not in _NO_DISPHDR:
        c["graphic_group"] = el[28] + el[29] * 256
        c["properties"] = el[32] + el[33] * 256
        c["style"] = el[34] & 0x7
        c["weight"] = (el[34] & 0xF8) >> 3
        c["color"] = el[35]
    if c["properties"] & 0x0800:    # DGNPF_ATTRIBUTES
        att_index = el[30] + el[31] * 256
        start = att_index * 2 + 32
        if start < len(el):
            c["attr"] = el[start:]
    return c


def _linkages(attr: bytes):
    """(link_type, payload) per attribute linkage (DGNGetAttrLinkSize +
    DGNGetLinkage, dgnhelp.cpp)."""
    off = 0
    while off + 4 <= len(attr):
        if attr[off] == 0 and attr[off + 1] in (0, 0x80):
            size, ltype = 8, 0x0000   # DMRS
            ent = attr[off + 2] + attr[off + 3] * 256
            mslink = (attr[off + 4] + attr[off + 5] * 256
                      + attr[off + 6] * 65536)
        elif attr[off + 1] & 0x10:
            size = attr[off] * 2 + 2
            ltype = attr[off + 2] + attr[off + 3] * 256
            ent = mslink = 0
            if size == 16 and ltype != 0x0041:
                ent = attr[off + 6] + attr[off + 7] * 256
                mslink = int.from_bytes(attr[off + 8:off + 12], "little")
        else:
            return
        yield ltype, attr[off:off + size], ent, mslink
        off += size


def _shape_fill(attr: bytes):
    """DGNGetShapeFillInfo: SHAPE_FILL linkage (0x0041) byte 8."""
    for ltype, data, _, _ in _linkages(attr):
        if ltype == 0x0041 and len(data) >= 9:
            return data[8]
    return None


def _stroke_arc(primary, secondary, rot_deg, startang, sweepang,
                cx, cy) -> np.ndarray:
    """DGNStrokeArc (dgnstroke.cpp:78): equi-angle points, axis
    rotation applied per point."""
    npts = int(max(1, abs(sweepang) / 5) + 1)
    step = sweepang / (npts - 1)
    ang = (startang + step * np.arange(npts)) * (math.pi / 180.0)
    rot = rot_deg * math.pi / 180.0
    ex = primary * np.cos(ang)
    ey = secondary * np.sin(ang)
    return np.column_stack([
        cx + ex * math.cos(rot) - ey * math.sin(rot),
        cy + ex * math.sin(rot) + ey * math.cos(rot)])


def _pen(core, dgn) -> str:
    pen = _PEN.get(core["style"], 'PEN(id:"ogr-pen-0"')
    rgb = dgn.color(core["color"])
    if rgb:
        pen += ",c:#%02x%02x%02x" % rgb
    if core["weight"] > 1:
        pen += ",w:%dpx" % core["weight"]
    return pen + ")"


def _consider_brush(core, dgn, pen) -> str:
    """ConsiderBrush (ogrdgnlayer.cpp:270)."""
    fill = _shape_fill(core["attr"])
    if fill is not None:
        rgb = dgn.color(fill)
        if rgb:
            style = 'BRUSH(fc:#%02x%02x%02x,id:"ogr-brush-0")' % rgb
            if fill != core["color"]:
                style += ";" + pen
            return style
    return pen


def _vertices(dgn, el, core):
    """LINE / LINE_STRING / SHAPE / CURVE vertex list in master units."""
    if core["type"] == 3:       # LINE
        psz = dgn.dim * 4
        pts = [(_int32(el, 36 + i * psz), _int32(el, 40 + i * psz))
               for i in range(2)]
    else:
        psz = dgn.dim * 4
        count = el[36] + el[37] * 256
        count = min(count, (len(el) - 38) // psz)
        pts = [(_int32(el, 38 + i * psz), _int32(el, 42 + i * psz))
               for i in range(count)]
    return np.array([dgn.transform(x, y)[:2] for x, y in pts])


def _arc_element(dgn, el, core):
    """ELLIPSE(15) / ARC(16) → stroked linestring."""
    if core["type"] == 15:
        primary = _vax_double(el[36:44]) * dgn.scale
        secondary = _vax_double(el[44:52]) * dgn.scale
        if dgn.dim == 2:
            rot = _int32(el, 52) / 360000.0
            cx = _vax_double(el[56:64])
            cy = _vax_double(el[64:72])
        else:
            rot = 0.0
            cx = _vax_double(el[68:76])
            cy = _vax_double(el[76:84])
        start, sweep = 0.0, 360.0
    else:
        start = _int32(el, 36) / 360000.0
        b41 = el[41]
        if b41 & 0x80:
            e = bytearray(el)
            e[41] &= 0x7F
            sweep_val = -_int32(bytes(e), 40)
        else:
            sweep_val = _int32(el, 40)
        sweep = 360.0 if sweep_val == 0 else sweep_val / 360000.0
        primary = _vax_double(el[44:52]) * dgn.scale
        secondary = _vax_double(el[52:60]) * dgn.scale
        if dgn.dim == 2:
            rot = _int32(el, 60) / 360000.0
            cx = _vax_double(el[64:72])
            cy = _vax_double(el[72:80])
        else:
            rot = 0.0
            cx = _vax_double(el[76:84])
            cy = _vax_double(el[84:92])
    cx, cy, _ = dgn.transform(cx, cy)
    return _stroke_arc(primary, secondary, rot, start, sweep, cx, cy)


def _text_element(dgn, el, core):
    """TEXT(17) → point + LABEL style (ogrdgnlayer.cpp:531-604)."""
    num_chars = el[58] if dgn.dim == 2 else el[74]
    font_id = el[36]
    height_mult = _int32(el, 42) * dgn.scale * 6.0 / 1000.0
    if dgn.dim == 2:
        rotation = _int32(el, 46) / 360000.0
        ox, oy = _int32(el, 50), _int32(el, 54)
        text_off = 60
    else:
        rotation = 0.0
        ox, oy = _int32(el, 62), _int32(el, 66)
        text_off = 76
    x, y, _ = dgn.transform(ox, oy)
    text = el[text_off:text_off + num_chars].decode("latin-1")
    style = f'LABEL(t:"{text}"'
    rgb = dgn.color(core["color"])
    if rgb:
        style += ",c:#%02x%02x%02x" % rgb
    if abs(height_mult) >= 6.0:
        style += ",s:%dg" % int(height_mult)
    elif abs(height_mult) > 0.1:
        style += ",s:%.3fg" % height_mult
    else:
        style += ",s:%.12fg" % height_mult
    font = _FONTS.get(font_id)
    style += ",f:%s" % (font if font else f"MstnFont{font_id}")
    if rotation != 0.0:
        style += ",a:%d" % int(rotation + 0.5)
    style += ")"
    return (x, y), text, style


def _parse_tcb(dgn, el):
    """DGNParseTCB (dgnread.cpp:1409): units, global origin, dimension."""
    dgn.dim = 3 if (len(el) > 1214 and el[1214] & 0x40) else 2
    sub_per_master = _int32(el, 1112)
    uor_per_sub = _int32(el, 1116)
    ox = _vax_double(el[1240:1248])
    oy = _vax_double(el[1248:1256])
    oz = _vax_double(el[1256:1264])
    if uor_per_sub != 0 and sub_per_master != 0:
        denom = uor_per_sub * sub_per_master
        dgn.scale = 1.0 / denom
        dgn.ox, dgn.oy, dgn.oz = ox / denom, oy / denom, oz / denom
    else:
        dgn.ox, dgn.oy, dgn.oz = ox, oy, oz


def _element_feature(dgn, el, core):
    """ElementToFeature geometry + style; None for non-geometric."""
    t = core["type"]
    pen = _pen(core, dgn)
    if t in (3, 4, 11, 21):
        pts = _vertices(dgn, el, core)
        if len(pts) < 2:
            return None
        return G.encode_linestring(pts), pen
    if t == 6:
        pts = _vertices(dgn, el, core)
        if len(pts) < 3:
            return None
        return (G.encode_polygon([pts]),
                _consider_brush(core, dgn, pen))
    if t in (15, 16):
        return G.encode_linestring(_arc_element(dgn, el, core)), pen
    if t == 17:
        (x, y), text, style = _text_element(dgn, el, core)
        return G.encode_point(x, y), style, text
    return None


def read_dgn(spark: SparkSession, path: str) -> DataFrame:
    with open(path, "rb") as f:
        dgn = _DGN(f.read())
    rows = []
    element_id = -1
    pending_children = 0
    complex_parts = None
    complex_row = None

    while True:
        el = dgn.next_raw()
        if el is None:
            break
        element_id += 1
        core = _parse_core(el)
        t = core["type"]
        if t == 9:
            _parse_tcb(dgn, el)
            continue
        if t == 5 and core["level"] == 1:   # color table
            pct = bytearray(768)
            pct[765:768] = el[38:41]
            pct[0:765] = el[41:41 + 765]
            dgn.pct = bytes(pct)
            continue
        if core["deleted"]:
            if pending_children:
                pending_children -= 1
            continue

        if pending_children:
            pending_children -= 1
            out = _element_feature(dgn, el, core)
            if out is not None and len(out) >= 1:
                wkb = out[0]
                kind = G.wkt_from_wkb(wkb).split(" ", 1)[0].split("(")[0]
                if kind == "LINESTRING":
                    complex_parts.append(G.decode_linestring(wkb))
            if pending_children == 0 and complex_row is not None:
                hdr_core, hdr_id = complex_row
                if complex_parts:
                    mls = G.encode_multilinestring(complex_parts)
                    if hdr_core["type"] == 14:
                        try:
                            geom = build_polygon_from_edges(
                                mls, auto_close=True, tolerance=100000)
                        except ValueError:
                            geom = None
                    else:
                        geom = mls
                    if geom is not None:
                        style = _consider_brush(hdr_core, dgn,
                                                _pen(hdr_core, dgn))
                        rows.append(_row(hdr_id, hdr_core, None, style,
                                         geom))
                complex_parts, complex_row = None, None
            continue

        if t in (12, 14):
            pending_children = el[38] + el[39] * 256
            complex_parts = []
            complex_row = (core, element_id)
            continue

        out = _element_feature(dgn, el, core)
        if out is None:
            continue
        if len(out) == 3:
            wkb, style, text = out
        else:
            wkb, style = out
            text = None
        rows.append(_row(element_id, core, text, style, wkb))

    schema = ("fid long, Type int, Level int, GraphicGroup int, "
              "ColorIndex int, Weight int, Style int, EntityNum long, "
              "MSLink long, Text string, ogr_style string, "
              "geometry binary")
    return spark.createDataFrame(rows, schema)


def _row(fid, core, text, style, wkb):
    ent = mslink = None
    for ltype, _, e, m in _linkages(core["attr"]):
        if e != 0 or m != 0:
            ent, mslink = e, m
            break
    return (fid, core["type"], core["level"], core["graphic_group"],
            core["color"], core["weight"], core["style"], ent, mslink,
            text, style, bytearray(wkb))
