"""S-57 ENC reader vs the reference's own autotest expectations
(autotest/ogr/ogr_s57.py ogr_s57_1..7)."""

import os

import numpy as np
import pytest

from gdal_spark.functions import curves as CU
from gdal_spark.functions.geometry import wkb_from_wkt
from gdal_spark.sources.s57 import open_s57, read_s57

D = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{D}/1B5X02NE.000"),
    reason="reference autotest data not present")


@pytest.fixture(scope="module")
def cell():
    return open_s57(f"{D}/1B5X02NE.000")


def _geom_equal(wkb, wkt_exp, tol=1e-9):
    a, b = CU.decode_geom(wkb), CU.decode_geom(wkb_from_wkt(wkt_exp))

    def flat(g):
        if g.coords is not None:
            return [g.coords]
        out = []
        for p in g.parts:
            out.extend([p] if isinstance(p, np.ndarray) else flat(p))
        return out

    fa, fb = flat(a), flat(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        assert x.shape == y.shape
        assert np.abs(x - y).max() <= tol


def test_layer_list(cell):
    # ogr_s57_2: layer names, order, and feature counts
    expected = [("DSID", 1), ("COALNE", 1), ("DEPARE", 4), ("DEPCNT", 4),
                ("LNDARE", 1), ("LNDELV", 2), ("SBDARE", 2), ("SLCONS", 1),
                ("SLOTOP", 1), ("SOUNDG", 2), ("M_COVR", 1), ("M_NSYS", 1),
                ("M_QUAL", 1)]
    assert cell.layer_names() == [n for n, _ in expected]
    for name, count in expected:
        assert len(cell.layer(name)) == count, name


def test_layer_geom_types(cell):
    assert cell.layer_geom_type("SOUNDG") == "MultiPoint25D"
    assert cell.layer_geom_type("M_COVR") == "Polygon"
    assert cell.layer_geom_type("COALNE") == "Unknown"
    assert cell.layer_geom_type("DEPARE") == "Unknown"


def test_coalne_feature(cell):
    # ogr_s57_3
    props, wkb = cell.layer("COALNE")[0]
    assert props["RCID"] == 1
    assert props["LNAM"] == "FFFF7F4F0FB002D3"
    assert props["OBJL"] == 30
    assert props["AGEN"] == 65535
    _geom_equal(wkb, (
        "LINESTRING (60.97683400 -32.49442600,60.97718200 -32.49453800,"
        "60.97742400 -32.49477400,60.97774800 -32.49504000,"
        "60.97791600 -32.49547200,60.97793000 -32.49581800,"
        "60.97794400 -32.49617800,60.97804400 -32.49647600,"
        "60.97800200 -32.49703800,60.97800200 -32.49726600,"
        "60.97805800 -32.49749400,60.97812800 -32.49773200,"
        "60.97827000 -32.49794800,60.97910200 -32.49848600,"
        "60.97942600 -32.49866600)"))


def test_mqual_polygon(cell):
    # ogr_s57_4: polygon assembled from 13 edges in natural direction
    props, wkb = cell.layer("M_QUAL")[0]
    assert props["RCID"] == 15
    assert props["OBJL"] == 308
    assert props["AGEN"] == 65535
    _geom_equal(wkb, (
        "POLYGON ((60.97683400 -32.49534000,60.97683400 -32.49762000,"
        "60.97683400 -32.49866600,60.97869000 -32.49866600,"
        "60.97942600 -32.49866600,60.98215200 -32.49866600,"
        "60.98316600 -32.49866600,60.98316600 -32.49755800,"
        "60.98316600 -32.49477000,60.98316600 -32.49350000,"
        "60.98146800 -32.49350000,60.98029800 -32.49350000,"
        "60.97947400 -32.49350000,60.97901600 -32.49350000,"
        "60.97683400 -32.49350000,60.97683400 -32.49442600,"
        "60.97683400 -32.49469800,60.97683400 -32.49534000))"))


def test_soundg_multipoint_z(cell):
    # ogr_s57_5: soundings as MultiPoint25D, depth = VE3D / SOMF
    props, wkb = cell.layer("SOUNDG")[0]
    assert props["RCID"] == 20
    assert props["OBJL"] == 129
    g = CU.decode_geom(wkb)
    assert g.kind == 4 and g.has_z
    pts = np.vstack([p.coords for p in g.parts])
    exp = np.array([[60.981644, -32.49449, 3.4],
                    [60.981344, -32.496424, 1.4],
                    [60.978142, -32.494874, -3.2],
                    [60.980712, -32.495196, 1.2]])
    assert np.abs(pts - exp).max() < 1e-9


def test_fogsig_national_attributes():
    # ogr_s57_6: INFORM + UCS-2 NINFOM (lexical level 2)
    cell = open_s57(f"{D}/bug1526.000")
    props, _ = cell.layer("FOGSIG")[0]
    assert props["INFORM"] == ("During South winds nautophone is not "
                               "always heard in S direction from lighthouse")
    assert len(props["NINFOM"]) >= 1


def test_roadwy_multilinestring():
    # ogr_s57_7: 8-part multilinestring from chained edges
    cell = open_s57(f"{D}/bug2147_3R7D0889.000")
    _, wkb = cell.layer("ROADWY")[0]
    g = CU.decode_geom(wkb)
    assert g.kind == 5 and len(g.parts) == 8
    assert np.abs(g.parts[0].coords[0]
                  - [22.5659615, 44.5541942]).max() < 1e-9


def test_read_s57_spark(spark):
    df = read_s57(spark, f"{D}/1B5X02NE.000", "DEPARE")
    assert df.count() == 4
    rows = df.collect()
    assert all(r.geometry is not None for r in rows)
