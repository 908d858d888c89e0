"""SEG-Y reader vs the reference's autotest expectations
(autotest/ogr/ogr_segy.py ogr_segy_1)."""

import os

import numpy as np
import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.segy import _ibm_to_float, open_segy, read_segy

PATH = "/root/reference/autotest/ogr/data/testsegy.segy"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PATH), reason="reference autotest data not present")


def test_layers():
    f = open_segy(PATH)
    assert len(f.trace_field_names()) == 71      # rev 0: 70 + SAMPLE_ARRAY
    assert len(f.header_field_names()) == 32
    traces = f.traces()
    assert len(traces) == 1
    assert wkt_from_wkb(traces[0][1]) == "POINT (500000 4500000)"


def test_ibm_float():
    # classic worked example: 0xC276A000 = -118.625
    assert _ibm_to_float(np.array([0xC276A000], np.uint32))[0] == -118.625
    assert _ibm_to_float(np.array([0x42640000], np.uint32))[0] == 100.0


def test_read_segy_spark(spark):
    assert read_segy(spark, PATH).count() == 1
    assert read_segy(spark, PATH, layer="header").count() == 1
