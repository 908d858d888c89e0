"""CCITT Group 3 (ITU-T T.4) bi-level fax decoder — 1-D MH and 2-D MR
coding, from the public T.4 code tables.  Used by the NITF IC=C1
"bi-level" path (the reference routes C1 blocks through a fax-enabled
TIFF decode, gdal/frmts/nitf/nitfbilevel.cpp) and available to the
TIFF codec for COMPRESSION_CCITTFAX3.

Output convention matches the reference path: white runs decode to 0
bits, black runs to 1 bits (PHOTOMETRIC_MINISBLACK promotion to 0/1
bytes happens in the caller).

Entropy decoding is inherently bit-serial; this is a per-blob kernel
run inside executor tasks, sized for NITF bi-level tiles (≤ a few MP).
"""

from __future__ import annotations

import numpy as np

# (run-length, code-as-bit-string) — ITU-T T.4 tables 2/3 (terminating
# + makeup), plus the shared extended makeup codes (table 4).
_WHITE = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"), (23, "0000100"),
    (24, "0101000"), (25, "0101011"), (26, "0010011"), (27, "0100100"),
    (28, "0011000"), (29, "00000010"), (30, "00000011"), (31, "00011010"),
    (32, "00011011"), (33, "00010010"), (34, "00010011"), (35, "00010100"),
    (36, "00010101"), (37, "00010110"), (38, "00010111"), (39, "00101000"),
    (40, "00101001"), (41, "00101010"), (42, "00101011"), (43, "00101100"),
    (44, "00101101"), (45, "00000100"), (46, "00000101"), (47, "00001010"),
    (48, "00001011"), (49, "01010010"), (50, "01010011"), (51, "01010100"),
    (52, "01010101"), (53, "00100100"), (54, "00100101"), (55, "01011000"),
    (56, "01011001"), (57, "01011010"), (58, "01011011"), (59, "01001010"),
    (60, "01001011"), (61, "00110010"), (62, "00110011"), (63, "00110100"),
    (64, "11011"), (128, "10010"), (192, "010111"), (256, "0110111"),
    (320, "00110110"), (384, "00110111"), (448, "01100100"),
    (512, "01100101"), (576, "01101000"), (640, "01100111"),
    (704, "011001100"), (768, "011001101"), (832, "011010010"),
    (896, "011010011"), (960, "011010100"), (1024, "011010101"),
    (1088, "011010110"), (1152, "011010111"), (1216, "011011000"),
    (1280, "011011001"), (1344, "011011010"), (1408, "011011011"),
    (1472, "010011000"), (1536, "010011001"), (1600, "010011010"),
    (1664, "011000"), (1728, "010011011"),
]
_BLACK = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"), (11, "0000101"),
    (12, "0000111"), (13, "00000100"), (14, "00000111"),
    (15, "000011000"), (16, "0000010111"), (17, "0000011000"),
    (18, "0000001000"), (19, "00001100111"), (20, "00001101000"),
    (21, "00001101100"), (22, "00000110111"), (23, "00000101000"),
    (24, "00000010111"), (25, "00000011000"), (26, "000011001010"),
    (27, "000011001011"), (28, "000011001100"), (29, "000011001101"),
    (30, "000001101000"), (31, "000001101001"), (32, "000001101010"),
    (33, "000001101011"), (34, "000011010010"), (35, "000011010011"),
    (36, "000011010100"), (37, "000011010101"), (38, "000011010110"),
    (39, "000011010111"), (40, "000001101100"), (41, "000001101101"),
    (42, "000011011010"), (43, "000011011011"), (44, "000001010100"),
    (45, "000001010101"), (46, "000001010110"), (47, "000001010111"),
    (48, "000001100100"), (49, "000001100101"), (50, "000001010010"),
    (51, "000001010011"), (52, "000000100100"), (53, "000000110111"),
    (54, "000000111000"), (55, "000000100111"), (56, "000000101000"),
    (57, "000001011000"), (58, "000001011001"), (59, "000000101011"),
    (60, "000000101100"), (61, "000001011010"), (62, "000001100110"),
    (63, "000001100111"),
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"), (384, "000000110100"),
    (448, "000000110101"), (512, "0000001101100"), (576, "0000001101101"),
    (640, "0000001001010"), (704, "0000001001011"), (768, "0000001001100"),
    (832, "0000001001101"), (896, "0000001110010"), (960, "0000001110011"),
    (1024, "0000001110100"), (1088, "0000001110101"),
    (1152, "0000001110110"), (1216, "0000001110111"),
    (1280, "0000001010010"), (1344, "0000001010011"),
    (1408, "0000001010100"), (1472, "0000001010101"),
    (1536, "0000001011010"), (1600, "0000001011011"),
    (1664, "0000001100100"), (1728, "0000001100101"),
]
_EXT = [
    (1792, "00000001000"), (1856, "00000001100"), (1920, "00000001101"),
    (1984, "000000010010"), (2048, "000000010011"), (2112, "000000010100"),
    (2176, "000000010101"), (2240, "000000010110"), (2304, "000000010111"),
    (2368, "000000011100"), (2432, "000000011101"), (2496, "000000011110"),
    (2560, "000000011111"),
]


def _table(entries):
    return {(len(c), int(c, 2)): run for run, c in entries}


_WHITE_T = _table(_WHITE + _EXT)
_BLACK_T = _table(_BLACK + _EXT)
_MAXLEN = 14


class _Bits:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        self.pos = p + 1
        return (self.d[p >> 3] >> (7 - (p & 7))) & 1

    def eof(self) -> bool:
        return self.pos >= self.n


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run length (makeup codes + terminating code)."""
    table = _WHITE_T if white else _BLACK_T
    total = 0
    while True:
        v, ln = 0, 0
        while ln < _MAXLEN:
            if bits.eof():
                raise EOFError("fax stream truncated")
            v = (v << 1) | bits.bit()
            ln += 1
            run = table.get((ln, v))
            if run is not None:
                break
        else:
            raise ValueError(f"bad {'white' if white else 'black'} code")
        total += run
        if run < 64:
            return total


def _sync_eol(bits: _Bits) -> bool:
    """Consume one EOL (>=11 zeros then a 1) if the stream is
    positioned at one (allowing fill bits); returns True if found."""
    save = bits.pos
    zeros = 0
    while not bits.eof():
        if bits.bit():
            if zeros >= 11:
                return True
            bits.pos = save
            return False
        zeros += 1
        if zeros > 64:                      # fill can't be this long
            bits.pos = save
            return False
    bits.pos = save
    return False


def decode_g3(data: bytes, width: int, height: int,
              two_d: bool = False) -> np.ndarray:
    """Decode a T.4 MH (1-D) or MR (2-D) stream to an (height, width)
    uint8 array of 0 (white) / 1 (black)."""
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    ref = np.zeros(width, np.uint8)         # imaginary all-white row 0

    for y in range(height):
        one_d = not two_d
        if _sync_eol(bits):
            if two_d:
                one_d = bits.bit() == 1
        cur = np.zeros(width, np.uint8)
        if one_d:
            pos, white = 0, True
            while pos < width:
                run = _read_run(bits, white)
                if not white:
                    cur[pos:pos + run] = 1
                pos += run
                white = not white
        else:
            _decode_2d_line(bits, ref, cur, width)
        out[y] = cur
        ref = cur
    return out


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode a T.6 (CCITT Group 4) stream: pure 2-D MR coding against
    the previous line (imaginary all-white first reference), no EOLs
    until the trailing EOFB."""
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    ref = np.zeros(width, np.uint8)
    for y in range(height):
        cur = np.zeros(width, np.uint8)
        _decode_2d_line(bits, ref, cur, width)
        out[y] = cur
        ref = cur
    return out


def decode_rle(data: bytes, width: int, height: int) -> np.ndarray:
    """CCITT RLE ("G1" / TIFF COMPRESSION_CCITTRLE): every line is an
    independent 1-D MH code starting on a byte boundary."""
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        if bits.pos & 7:
            bits.pos = (bits.pos + 7) & ~7
        pos, white = 0, True
        while pos < width:
            run = _read_run(bits, white)
            if not white:
                out[y, pos:pos + run] = 1
            pos += run
            white = not white
    return out


def _transitions(row: np.ndarray) -> np.ndarray:
    """Changing elements (first index of each new run), including
    position 0 when the line starts black (the imaginary white element
    preceding the line, T.4 §4.2.1.1), terminated by two sentinels at
    width."""
    w = len(row)
    r = row.astype(np.int8)
    prev = np.concatenate([[0], r[:-1]])
    ch = np.flatnonzero(r != prev)
    return np.concatenate([ch, [w, w]])


def _decode_2d_line(bits: _Bits, ref: np.ndarray, cur: np.ndarray,
                    width: int) -> None:
    """One MR-coded line against reference line `ref` (T.4 §4.2.1).

    trans[i] is the start of run i+1 on the reference line; the pixel
    color at trans[i] is (i+1) % 2 with 0 = white.  b1 is the first
    changing element right of a0 with color opposite to the current
    run color; b2 the next changing element after b1.
    """
    trans = _transitions(ref)
    n_tr = len(trans)
    a0 = -1
    color = 0                               # 0 = white

    def get_b1():
        for i in range(n_tr):
            t = int(trans[i])
            if t > a0 and (t >= width or int(ref[t]) != color):
                return min(t, width), i
        return width, n_tr

    while a0 < width:
        b1, i1 = get_b1()
        b2 = min(int(trans[i1 + 1]), width) if i1 + 1 < n_tr else width

        if bits.eof():
            break
        a1 = b1
        if bits.bit():                      # 1 -> V0
            mode = "V"
        elif bits.bit():                    # 01x -> VR1 / VL1
            mode = "V"
            a1 = b1 + 1 if bits.bit() else b1 - 1
        elif bits.bit():                    # 001 -> H
            mode = "H"
        elif bits.bit():                    # 0001 -> P
            mode = "P"
        elif bits.bit():                    # 00001 x -> VR2 / VL2
            mode = "V"
            a1 = b1 + 2 if bits.bit() else b1 - 2
        elif bits.bit():                    # 000001 x -> VR3 / VL3
            mode = "V"
            a1 = b1 + 3 if bits.bit() else b1 - 3
        else:
            bits.pos -= 6                   # EOL prefix: rewind, stop
            return

        if mode == "P":
            if color:
                cur[max(a0, 0):b2] = 1
            a0 = b2
        elif mode == "H":
            run1 = _read_run(bits, color == 0)
            run2 = _read_run(bits, color != 0)
            s = max(a0, 0)
            if color:
                cur[s:s + run1] = 1
            else:
                cur[s + run1:s + run1 + run2] = 1
            a0 = s + run1 + run2
        else:
            a1 = max(min(a1, width), 0)
            if color:
                cur[max(a0, 0):a1] = 1
            a0 = a1
            color ^= 1
