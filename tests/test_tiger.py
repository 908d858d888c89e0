"""TIGER/Line reader tests.

The reference autotest (autotest/ogr/ogr_tiger.py) checks the Alabama
TGR01001 module downloaded from census.gov — network-blocked here — so
these tests synthesize a TIGER_2004 module (version code 1006, the same
era as the autotest's tiger2006se data) whose third CompleteChain
record reproduces the autotest's expected feature exactly:
TLID=2833200, FRIADDL=None, BLOCKL=5000, and the nine-point LINESTRING
from ogr_tiger_1, assembled from the RT1 endpoints plus seven RT2 shape
vertices. TLIDRange reproduces MODULE='TGR01001', TLMINID=2822718."""

import os

import pytest

from gdal_spark.data import tiger_schema as TS
from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.tiger import (read_tiger, tiger_layers,
                                      tiger_version)

VER = "1006"

# the autotest ogr_tiger_1 expected geometry
CHAIN = [(-86.4402, 32.504137), (-86.440313, 32.504009),
         (-86.440434, 32.503884), (-86.440491, 32.503805),
         (-86.44053, 32.503757), (-86.440578, 32.503641),
         (-86.440593, 32.503515), (-86.440588, 32.503252),
         (-86.440596, 32.50298)]


def _rec(rectype: str, reclen: int, fields: dict[tuple[int, int], str]):
    buf = [" "] * reclen
    buf[0] = rectype
    buf[1:5] = VER
    for (beg, end), val in fields.items():
        w = end - beg + 1
        s = str(val).rjust(w)[:w]
        buf[beg - 1:beg - 1 + w] = s
    return "".join(buf)


def _pos(key: str, name: str) -> tuple[int, int]:
    for f in TS.RECORD_INFOS[key][0]:
        if f[0] == name:
            return (f[4], f[5])
    raise KeyError(name)


@pytest.fixture(scope="module")
def tiger_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiger") / "TGR01001"
    d.mkdir()

    def micro(v):
        return str(int(round(v * 1e6)))

    rt1 = []
    for i, tlid in enumerate([2822718, 2822719, 2833200]):
        f = {(6, 15): tlid, _pos("rt1_2002", "CFCC"): "A41",
             _pos("rt1_2002", "STATEL"): "01",
             _pos("rt1_2002", "COUNTYL"): "001"}
        if tlid == 2833200:
            f[_pos("rt1_2002", "BLOCKL")] = 5000
            f[(191, 200)] = micro(CHAIN[0][0])
            f[(201, 209)] = micro(CHAIN[0][1])
            f[(210, 219)] = micro(CHAIN[-1][0])
            f[(220, 228)] = micro(CHAIN[-1][1])
        else:
            f[(191, 200)] = micro(-86.1 - i)
            f[(201, 209)] = micro(32.1 + i)
            f[(210, 219)] = micro(-86.2 - i)
            f[(220, 228)] = micro(32.2 + i)
        rt1.append(_rec("1", 228, f))
    (d / "TGR01001.RT1").write_text("\n".join(rt1) + "\n")

    mids = CHAIN[1:-1]
    f2 = {(6, 15): 2833200, (16, 18): 1}
    for i, (x, y) in enumerate(mids):
        f2[(19 + 19 * i, 28 + 19 * i)] = micro(x)
        f2[(29 + 19 * i, 37 + 19 * i)] = micro(y)
    (d / "TGR01001.RT2").write_text(_rec("2", 208, f2) + "\n")

    fr = {_pos("rtR_2002", "FILE"): "01001",
          _pos("rtR_2002", "CENID"): "C0100",
          _pos("rtR_2002", "TLMAXID"): 2833200,
          _pos("rtR_2002", "TLMINID"): 2822718}
    (d / "TGR01001.RTR").write_text(_rec("R", 76, fr) + "\n")

    f7 = {_pos("rt7_2002", "FILE"): "01001",
          _pos("rt7_2002", "LAND"): 17,
          _pos("rt7_2002", "CFCC"): "D51",
          _pos("rt7_2002", "LANAME"): "Montgomery Airport".ljust(30),
          (55, 64): micro(-86.393),
          (65, 73): micro(32.3006)}
    (d / "TGR01001.RT7").write_text(_rec("7", 74, f7) + "\n")

    fp = {_pos("rtP_2002", "FILE"): "01001",
          _pos("rtP_2002", "CENID"): "C0100",
          _pos("rtP_2002", "POLYID"): 12,
          (26, 35): micro(-86.41),
          (36, 44): micro(32.5)}
    (d / "TGR01001.RTP").write_text(_rec("P", 45, fp) + "\n")

    # 2002+: RTA owns FILE/CENID/POLYID/TRACT/BLOCK (the RTS copies have
    # set=0); RTS contributes STATE/COUNTY/BLKGRP and the census codes
    fa = {_pos("rtA_2004", "FILE"): "01001",
          _pos("rtA_2004", "CENID"): "C0100",
          _pos("rtA_2004", "POLYID"): 12,
          _pos("rtA_2004", "STATECU"): "01",
          _pos("rtA_2004", "COUNTYCU"): "001",
          _pos("rtA_2004", "TRACT"): 20500,
          _pos("rtA_2004", "BLOCK"): 5000}
    (d / "TGR01001.RTA").write_text(_rec("A", 210, fa) + "\n")

    fs = {_pos("rtS_2002", "FILE"): "01001",
          _pos("rtS_2002", "CENID"): "C0100",
          _pos("rtS_2002", "POLYID"): 12,
          _pos("rtS_2002", "STATE"): "01",
          _pos("rtS_2002", "COUNTY"): "001",
          _pos("rtS_2002", "BLKGRP"): 2}
    (d / "TGR01001.RTS").write_text(_rec("S", 168, fs) + "\n")

    f4 = {(6, 15): 2833200, (16, 18): 1,
          (19, 26): 99, (27, 34): 100}
    (d / "TGR01001.RT4").write_text(_rec("4", 58, f4) + "\n")

    return str(d)


def test_version_and_layers(tiger_dir):
    assert tiger_version(tiger_dir) == "TIGER_2004"
    layers = tiger_layers(tiger_dir)
    assert "CompleteChain" in layers and "Polygon" in layers
    assert "KeyFeatures" not in layers          # < TIGER_2002 only
    assert "OverUnder" in layers                # >= TIGER_2002


def test_complete_chain(spark, tiger_dir):
    df = read_tiger(spark, tiger_dir, "CompleteChain")
    rows = {r["TLID"]: r for r in df.collect()}
    assert len(rows) == 3
    feat = rows[2833200]
    assert feat["MODULE"] == "TGR01001"
    assert feat["FRIADDL"] is None              # blank -> null
    assert feat["BLOCKL"] == 5000
    wkt = wkt_from_wkb(bytes(feat["geometry"]))
    assert wkt.startswith("LINESTRING")
    nums = wkt[wkt.index("(") + 1:-1].split(",")
    got = [tuple(float(v) for v in p.split()) for p in nums]
    assert len(got) == 9
    for (gx, gy), (ex, ey) in zip(got, CHAIN):
        assert abs(gx - ex) < 1e-6 and abs(gy - ey) < 1e-6
    # chains without RT2 records still close start->end
    assert len(wkt_from_wkb(bytes(rows[2822718]["geometry"])).split(",")) == 2


def test_complete_chain_rt1_file_entry(spark, tiger_dir):
    # reference #4443: opening via the .RT1 file path works too
    df = read_tiger(spark, os.path.join(tiger_dir, "TGR01001.RT1"),
                    "CompleteChain")
    assert df.count() == 3


def test_tlid_range(spark, tiger_dir):
    row = read_tiger(spark, tiger_dir, "TLIDRange").collect()[0]
    assert row["MODULE"] == "TGR01001"
    assert row["TLMINID"] == 2822718
    assert row["TLMAXID"] == 2833200
    assert row["CENID"] == "C0100"


def test_landmarks_point(spark, tiger_dir):
    row = read_tiger(spark, tiger_dir, "Landmarks").collect()[0]
    assert row["LANAME"] == "Montgomery Airport"
    wkt = wkt_from_wkb(bytes(row["geometry"]))
    assert wkt.startswith("POINT (-86.393")


def test_pip_point(spark, tiger_dir):
    row = read_tiger(spark, tiger_dir, "PIP").collect()[0]
    assert row["POLYID"] == 12
    assert wkt_from_wkb(bytes(row["geometry"])).startswith("POINT (-86.41")


def test_polygon_rts_merge(spark, tiger_dir):
    row = read_tiger(spark, tiger_dir, "Polygon").collect()[0]
    assert row["POLYID"] == 12 and row["CENID"] == "C0100"
    assert row["STATECU"] == 1                  # RTA side (OFTInteger)
    assert row["TRACT"] == 20500                # RTA side
    assert row["BLOCK"] == 5000
    assert row["STATE"] == 1                    # RTS side
    assert row["COUNTY"] == 1
    assert row["BLKGRP"] == 2


def test_alt_name_feat_list(spark, tiger_dir):
    row = read_tiger(spark, tiger_dir, "AltName").collect()[0]
    assert row["TLID"] == 2833200
    assert list(row["FEAT"]) == [99, 100]
