"""EOSAT FAST reader vs the reference's autotest expectations
(autotest/gdrivers/fast.py fast_2..fast_8)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.formats import open_fast, read_fast
from gdal_spark.raster.model import to_array

DATA = "/root/reference/autotest/gdrivers/data"
HPN = f"{DATA}/L71118038_03820020111_HPN.FST"

pytestmark = pytest.mark.skipif(
    not os.path.exists(HPN), reason="reference autotest data not present")


def test_fast_2_checksum(spark):
    df, meta, _ = read_fast(spark, HPN)
    arr = to_array(df, meta)
    assert py_checksum(arr[:1, :5000]) == 60323


def test_fast_3_metadata():
    md = open_fast(HPN)["metadata"]
    assert md["ACQUISITION_DATE"] == "20020111"
    assert md["SATELLITE"] == "LANDSAT7"
    assert md["SENSOR"] == "ETM+"
    assert abs(float(md["GAIN1"]) - -6.199999809265137) < 1e-4
    assert abs(float(md["BIAS1"]) - 0.775686297697179) < 1e-4


def test_fast_4_geotransform():
    gt = open_fast(HPN)["gt"]
    want = (280342.5, 15.0, 0.0, 3621457.5, 0.0, -15.0)
    assert max(abs(a - b) for a, b in zip(gt, want)) < 0.01


def test_fast_5_two_bands(spark):
    df, meta, info = read_fast(spark, f"{DATA}/L71230079_07920021111_HTM.FST")
    assert len(info["bands"]) == 2
    arr = to_array(df, meta, band=1)
    assert py_checksum(arr[:1, :7000]) == 19110
    want = (528417.25, 30.0, 0.0, 7071187.0, 0.0, -30.0)
    assert max(abs(a - b) for a, b in zip(info["gt"], want)) < 0.01


# fast_6/7/8: Euromap IRS conventions; geotransforms include rotation
@pytest.mark.parametrize("name,nbands,want", [
    ("n0o0y867.0fl", 4, (14640936.89174916, 1.008817518246492,
                         24.9876841746236, 664274.3912497687,
                         24.98828832116786, -0.9907878581173808)),
    ("h0o0y867.1ah", 1, (676565.09, 5.0, 0.0, 5348341.5, 0.0, -5.0)),
    ("w0y13a4t.010", 2, (-336965.0150603952, 176.0817495260164,
                         -37.35662873563219, 484122.7765089957,
                         -37.35622603749736, -176.081791954023)),
])
def test_euromap(name, nbands, want):
    info = open_fast(f"{DATA}/{name}")
    assert len(info["bands"]) == nbands
    assert max(abs(a - b) for a, b in zip(info["gt"], want)) < 0.01
