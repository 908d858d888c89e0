"""OpenAir + SUA airspace readers vs the reference's autotest
expectations (autotest/ogr/ogr_openair.py, ogr_sua.py)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.geometry import wkb_from_wkt, wkt_from_wkb
from gdal_spark.functions import curves as CU
from gdal_spark.sources.airspace import (parse_openair, parse_sua,
                                         read_openair, read_sua)

D = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{D}/openair_test.txt"),
    reason="reference autotest data not present")


def _max_err(wkb, wkt):
    a = CU.decode_geom(wkb)
    b = CU.decode_geom(wkb_from_wkt(wkt))

    def flat(g):
        if g.coords is not None:
            return [g.coords]
        out = []
        for p in g.parts:
            out.extend([p] if isinstance(p, np.ndarray) else flat(p))
        return out

    fa, fb = flat(a), flat(b)
    assert len(fa) == len(fb)
    return max(np.abs(x - y).max() for x, y in zip(fa, fb))


def test_openair():
    # ogr_openair_1: third airspace is a DP polygon with its own style
    air, labels = parse_openair(f"{D}/openair_test.txt")
    props, style, wkb = air[2]
    assert _max_err(wkb, "POLYGON ((49.75 2.75,49.75 3.0,49.5 3.0,"
                         "49.5 2.75,49.75 2.75))") < 1e-7
    assert style == 'PEN(c:#0000FF,w:2pt,p:"5px 5px");BRUSH(fc:#00FF00)'
    # label point depends on the reference's stale-part lat/lon scanner
    assert _max_err(labels[0][2],
                    "POINT (49.2625 2.504166666666667)") < 1e-7


def test_openair_arcs_and_circle():
    air, _ = parse_openair(f"{D}/openair_test.txt")
    # airspace1 = DC circle (361 pts + close), airspace2 = DA arcs
    g1 = CU.decode_geom(air[0][2])
    assert g1.kind == 3 and len(g1.parts[0]) >= 361
    g2 = CU.decode_geom(air[1][2])
    assert g2.kind == 3 and len(g2.parts[0]) > 100


def test_sua():
    # ogr_sua_1: first airspace is a CIRCLE, vertices per the
    # reference's 1-degree great-circle stroking
    feats = parse_sua(f"{D}/za.sua")
    props, wkb = feats[0]
    assert props["TYPE"] == "CTA/CTR"
    assert props["TITLE"].strip() == "KIMB TMA-A 123.8"
    ring = CU.decode_geom(wkb).parts[0]
    assert len(ring) == 361
    assert abs(ring[0][0] - 24.760277777777777) < 1e-12
    assert abs(ring[0][1] - -28.466666666666683) < 1e-12
    assert abs(ring[1][0] - 24.766895312434809) < 1e-10
    assert abs(ring[1][1] - -28.46671727367243) < 1e-10


def test_read_spark(spark):
    df = read_openair(spark, f"{D}/openair_test.txt")
    assert df.count() == 3
    df2 = read_sua(spark, f"{D}/za.sua")
    assert df2.count() == 2
