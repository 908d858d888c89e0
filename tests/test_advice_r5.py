"""Round-5 regression tests for the three ADVICE findings:

1. ``span_dedup`` crashed on documents with fewer than 5 tokens
   (descending ``sequence(1, 0)`` fed ``slice(toks, 0, 5)``).
2. NOAA-15 L1B word-size detection read offset 512+117 instead of the
   ARS header's offset 117 (l1bdataset.cpp L1B_NOAA15_HDR_WORD_OFF),
   silently defaulting unpacked products to PACKED10BIT.
3. XLS MULRK cell runs never advanced the sheet extent (and raised
   NameError when MULRK was the first cell record in a sheet).
"""

import struct

import duckdb
import pytest

from gdal_spark.queries import QUERIES
from gdal_spark.raster.l1b import (L1B, PACKED10BIT, UNPACKED8BIT,
                                   UNPACKED16BIT)
from gdal_spark.sources import xls as X


# ------------------------------------------------------------------ span

def test_span_dedup_short_docs(spark, tmp_path):
    texts = [
        (1, "a b c d e f g"),          # 7 tokens -> 3 spans
        (2, "a b c d e f g"),          # duplicate -> shared spans
        (3, "too short"),              # 2 tokens -> no spans, no crash
        (4, "one"),                    # 1 token
        (5, "a b c d e"),              # exactly 5 -> 1 span
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)

    fn, oracle = QUERIES["span_dedup"]
    got = {r["doc_id"]: (r["n_spans"], r["n_shared_spans"])
           for r in fn(spark, str(tmp_path)).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{p}/*.parquet')")
    want = {r[0]: (r[1], r[2]) for r in con.execute(oracle).fetchall()}
    assert got == want
    assert 3 not in got and 4 not in got      # short docs emit no spans
    assert got[1] == (3, 3)                   # all spans shared with doc 2
    assert got[5] == (1, 1)                   # "a b c d e" appears in 1,2,5


# ------------------------------------------------------------------ l1b

def _klm(word: bytes) -> L1B:
    d = bytearray(2048)
    d[97:102] = b"\x01" * 5                   # 5 channels selected
    d[117:119] = word                         # ARS-header word size
    struct.pack_into(">H", d, 512 + 6, 2001)  # year
    struct.pack_into(">H", d, 512 + 8, 100)   # day
    struct.pack_into(">H", d, 512 + 10, 22016)
    struct.pack_into(">H", d, 512 + 14, 1)    # header record count
    struct.pack_into(">H", d, 512 + 72, 8)    # spacecraft id: NOAA-19
    struct.pack_into(">H", d, 512 + 76, 13)   # product: HRPT
    obj = L1B.__new__(L1B)
    obj.data = bytes(d)
    obj.format = "NOAA15"
    obj.endian = ">"
    obj.expose_mask = False
    obj._parse_klm_header()
    return obj


def test_l1b_noaa15_word_size_from_ars_header():
    assert _klm(b"10").data_format == PACKED10BIT
    assert _klm(b"16").data_format == UNPACKED16BIT
    assert _klm(b"08").data_format == UNPACKED8BIT


def test_l1b_noaa15_unknown_word_size_fails():
    # reference returns CE_Failure on an unknown word size, never a
    # silent PACKED10BIT default (l1bdataset.cpp:1592-1598)
    with pytest.raises(ValueError, match="word size"):
        _klm(b"\x00\x00")


# ------------------------------------------------------------------ xls

def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def test_xls_mulrk_extent(tmp_path, monkeypatch):
    # sheet whose ONLY cell record is a 3-cell MULRK run at row 0
    mulrk = struct.pack("<HH", 0, 0)
    for v in (10, 20, 30):
        mulrk += struct.pack("<HI", 0, (v << 2) | 2)
    mulrk += struct.pack("<H", 2)             # cLast
    sheet = _rec(0xBD, mulrk) + _rec(0x0A, b"")

    name = b"S1"
    globals_ = b""
    bs = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    globals_ = _rec(0x85, bs) + _rec(0x0A, b"")
    # patch the sheet position now that the globals length is known
    bs = struct.pack("<IHBB", len(globals_), 0, len(name), 0) + name
    globals_ = _rec(0x85, bs) + _rec(0x0A, b"")
    stream = globals_ + sheet

    p = tmp_path / "m.xls"
    p.write_bytes(stream)
    monkeypatch.setattr(X, "_ole2_stream", lambda data, names: stream)
    rows = X._xls_rows(str(p))
    assert len(rows) == 1
    assert [c.value for c in rows[0]] == [10, 20, 30]
