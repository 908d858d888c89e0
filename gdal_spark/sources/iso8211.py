"""ISO/IEC 8211 (DDF) reader — pure python, from the public standard
as exercised by the reference's frmts/iso8211 library (DDFModule /
DDFRecord / DDFField semantics).  Used by the ADRG raster driver and
the S-57 / SDTS vector families.

A DDF file is a DDR (data descriptive record) defining per-tag
subfield labels + format controls, followed by data records (DR).
Leaders are 24 bytes; directories are (tag, length, position) entries
terminated by 0x1E; subfields are coded per format controls —
A(n)/I(n)/R(n) fixed ASCII, b1x/b2x little-endian binary ints, B(n)
bitfields — with 0x1F unit and 0x1E field terminators for variable
width.
"""

from __future__ import annotations

import struct

FT = 0x1E   # field terminator
UT = 0x1F   # unit terminator


class DDFSubfield:
    __slots__ = ("name", "kind", "width", "binary")

    def __init__(self, name, kind, width, binary=0):
        self.name = name
        self.kind = kind        # 'A' ascii, 'I' int, 'R' real, 'B' bits,
        #                         'b' binary int (width bytes, signed if
        #                         binary==2)
        self.width = width      # 0 = delimited by UT/FT
        self.binary = binary


class DDFFieldDefn:
    def __init__(self, tag, name, labels, formats, repeating):
        self.tag = tag
        self.name = name
        self.repeating = repeating
        self.subfields = []
        if not labels:
            return
        fmts = formats or [("A", 0, 0)] * len(labels)
        for i, lab in enumerate(labels):
            kind, width, binary = fmts[i % len(fmts)] if fmts else ("A", 0, 0)
            self.subfields.append(DDFSubfield(lab, kind, width, binary))


def _parse_formats(s):
    """'(A(2),I(4),3R(5),B(8),b14)' -> [(kind, width, binary), ...]"""
    out = []
    s = s.strip()
    if s.startswith("("):
        s = s[1:]
    if s.endswith(")"):
        s = s[:-1]
    i = 0
    n = len(s)
    while i < n:
        rep = 0
        while i < n and s[i].isdigit():
            rep = rep * 10 + int(s[i])
            i += 1
        rep = rep or 1
        if i >= n:
            break
        c = s[i]
        if c == ",":
            i += 1
            continue
        if c == "(":                        # nested group e.g. 2(A(5),I(3))
            depth, j = 1, i + 1
            while j < n and depth:
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            inner = _parse_formats(s[i:j])
            out.extend(inner * rep)
            i = j
            continue
        i += 1
        width, binary = 0, 0
        kind = c
        if c == "b":                        # b11/b12/b14 (unsigned),
            spec = s[i:i + 2]               # b21/b22/b24 (signed)
            i += 2
            binary = 1 if spec[0] == "1" else 2
            width = int(spec[1])
            kind = "b"
        elif i < n and s[i] == "(":
            j = s.index(")", i)
            width = int(s[i + 1:j])
            i = j + 1
        if kind == "B":
            width = (width + 7) // 8
        out.extend([(kind, width, binary)] * rep)
    return out


def _parse_labels(s):
    """'NAM!STR!LOD' or '*TSI' (repeating group)."""
    repeating = s.startswith("*")
    s = s.lstrip("*")
    labels = [x for x in s.replace("\\\\", "!").split("!") if x]
    return labels, repeating


class DDFField:
    __slots__ = ("defn", "data")

    def __init__(self, defn, data):
        self.defn = defn
        self.data = data

    def values(self):
        """List of dicts (one per repeated group) of subfield values."""
        out = []
        pos = 0
        data = self.data
        # Double-byte (UCS-2 lexical level 2) fields end with a 2-byte
        # terminator (0x1E/0x1F, 0x00) — ddfsubfielddefn.cpp bug #1526.
        dbcs = (len(data) >= 2 and data[-1] == 0x00
                and data[-2] in (UT, FT))
        end = len(data)
        if not dbcs and end and data[-1] == FT:
            end -= 1
        subs = self.defn.subfields
        if not subs:
            return [{"_raw": data}]
        while pos < end:
            row = {}
            for sf in subs:
                if pos >= end:
                    break
                if sf.kind == "b":
                    raw = data[pos:pos + sf.width]
                    pos += sf.width
                    v = int.from_bytes(raw, "little",
                                       signed=(sf.binary == 2))
                elif sf.width:
                    raw = data[pos:pos + sf.width]
                    pos += sf.width
                    v = _convert(sf, raw)
                else:
                    if dbcs:
                        j = pos
                        while j < end and not (
                                j > pos and data[j] == 0
                                and data[j - 1] in (UT, FT)):
                            j += 1
                        v = data[pos:j - 1].decode("utf-16-le", "replace")
                        pos = j + 1
                    else:
                        j = pos
                        while j < end and data[j] not in (UT, FT):
                            j += 1
                        v = _convert(sf, data[pos:j])
                        pos = j + 1 if j < end and data[j] == UT else j
                row[sf.name] = v
            out.append(row)
            if not self.defn.repeating:
                # consume a trailing UT between fixed groups, if any
                if pos < end and data[pos] == UT:
                    pos += 1
                if len(out) >= 1 and pos >= end:
                    break
        return out

    def first(self):
        v = self.values()
        return v[0] if v else {}


def _convert(sf, raw):
    if sf.kind == "I":
        s = raw.decode("latin-1").strip()
        return int(s) if s and s.strip("+- ").isdigit() else 0
    if sf.kind == "R":
        s = raw.decode("latin-1").strip()
        try:
            return float(s)
        except ValueError:
            return 0.0
    if sf.kind == "B":
        return raw
    return raw.decode("latin-1")


class DDFRecord:
    def __init__(self, fields):
        self.fields = fields            # list[(tag, DDFField)]

    def field(self, tag):
        for t, f in self.fields:
            if t == tag:
                return f
        return None

    def subfield(self, tag, name, default=None):
        f = self.field(tag)
        if f is None:
            return default
        return f.first().get(name, default)


class DDFModule:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.defns = {}
        self._read_ddr()

    @classmethod
    def open(cls, path):
        with open(path, "rb") as fh:
            return cls(fh.read())

    def _leader(self, pos):
        d = self.data
        rec_len = int(d[pos:pos + 5])
        field_area = int(d[pos + 12:pos + 17])
        size_len = int(chr(d[pos + 20]))
        size_pos = int(chr(d[pos + 21]))
        size_tag = int(chr(d[pos + 23]))
        fcl_raw = d[pos + 10:pos + 12]
        try:
            fcl = int(fcl_raw)
        except ValueError:
            fcl = 0
        entries = []
        p = pos + 24
        while self.data[p] != FT:
            tag = d[p:p + size_tag].decode("latin-1")
            ln = int(d[p + size_tag:p + size_tag + size_len])
            fpos = int(d[p + size_tag + size_len:
                         p + size_tag + size_len + size_pos])
            entries.append((tag, ln, fpos))
            p += size_tag + size_len + size_pos
        return rec_len, field_area, entries, fcl

    def _read_ddr(self):
        rec_len, base, entries, fcl = self._leader(0)
        d = self.data
        for tag, ln, fpos in entries:
            raw = d[base + fpos:base + fpos + ln]
            # DDR field: field controls (fcl bytes), name, UT,
            # labels, UT, formats, FT
            body = raw[fcl or 9:]
            parts = body.rstrip(bytes([FT])).split(bytes([UT]))
            name = parts[0].decode("latin-1") if parts else ""
            labels, repeating = _parse_labels(
                parts[1].decode("latin-1")) if len(parts) > 1 else ([], False)
            formats = _parse_formats(
                parts[2].decode("latin-1")) if len(parts) > 2 else []
            self.defns[tag] = DDFFieldDefn(tag, name, labels, formats,
                                           repeating)
        self.pos = rec_len

    def records(self):
        d = self.data
        reuse = None        # (field_area_size, entries) after an 'R' leader
        while self.pos < len(d):
            if reuse is not None:
                # ISO8211 'R' leader: every further record is a bare
                # field area sharing the first DR's directory
                size, entries = reuse
                if self.pos + size > len(d):
                    return
                base_abs = self.pos
                fields = []
                for tag, ln, fpos in entries:
                    raw = d[base_abs + fpos:base_abs + fpos + ln]
                    defn = self.defns.get(tag) or DDFFieldDefn(
                        tag, tag, [], [], False)
                    fields.append((tag, DDFField(defn, raw)))
                self.pos += size
                yield DDFRecord(fields)
                continue
            if self.pos + 24 > len(d):
                return
            try:
                rec_len, base, entries, _ = self._leader(self.pos)
            except (ValueError, IndexError):
                return
            fields = []
            for tag, ln, fpos in entries:
                raw = d[self.pos + base + fpos:self.pos + base + fpos + ln]
                defn = self.defns.get(tag) or DDFFieldDefn(
                    tag, tag, [], [], False)
                fields.append((tag, DDFField(defn, raw)))
            if d[self.pos + 6:self.pos + 7] == b"R":
                reuse = (rec_len - base, entries)
            self.pos += rec_len
            yield DDFRecord(fields)
