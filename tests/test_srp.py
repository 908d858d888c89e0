"""SRP (ASRP/USRP) reader vs the reference's autotest goldens
(autotest/gdrivers/srp.py srp_1..srp_6)."""

import os

import pytest

from gdal_spark.raster.checksum import py_checksum
from gdal_spark.raster.model import to_array
from gdal_spark.raster.srp import open_srp, read_srp, srp_subdatasets

DATA = "/root/reference/autotest/gdrivers/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/USRP_PCB0/FKUSRP01.IMG"),
    reason="reference autotest data not present")

EXPECTED_MD = {"SRP_CLASSIFICATION": "U", "SRP_CREATIONDATE": "20120505",
               "SRP_EDN": "0", "SRP_NAM": "FKUSRP",
               "SRP_PRODUCT": "USRP", "SRP_REVISIONDATE": "20120505",
               "SRP_SCA": "50000", "SRP_ZNA": "17"}


@pytest.mark.parametrize("pcb", [0, 4, 8])
def test_srp_1_2_3(spark, pcb):
    # srp_1..3: PCB 0 (uncompressed), 4, 8 all checksum 24576
    df, meta, srp = read_srp(spark, f"{DATA}/USRP_PCB{pcb}/FKUSRP01.IMG")
    assert py_checksum(to_array(df, meta)) == 24576
    assert meta.gt == (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0)
    assert srp.epsg() == 32617
    assert len(srp.color_table) == 4
    assert srp.color_table[0] == (0, 0, 0, 255)
    assert srp.color_table[1] == (255, 0, 0, 255)
    for k, v in EXPECTED_MD.items():
        assert srp.metadata[k] == v, k


def test_srp_4_thf(spark):
    # srp_4: open through the transmittal header
    df, meta, srp = read_srp(spark, f"{DATA}/USRP_PCB0/TRANSH01.THF")
    assert py_checksum(to_array(df, meta)) == 24576


def test_srp_5_thf_metadata():
    # srp_5: THF subdatasets + VDR metadata
    thf = f"{DATA}/USRP_PCB0/TRANSH01.THF"
    subs = srp_subdatasets(thf)
    assert len(subs) == 1
    assert subs[0].endswith("FKUSRP01.GEN,"
                            f"{DATA}/USRP_PCB0/FKUSRP01.IMG")
    srp = open_srp(thf)
    assert srp.metadata["SRP_EDN"] == "1"
    assert srp.metadata["SRP_VOO"] == "           "
    assert srp.metadata["SRP_CLASSIFICATION"] == "U"
    assert srp.metadata["SRP_CREATIONDATE"] == "20120505"


def test_srp_6_subdataset_name(spark):
    # srp_6: SRP:gen,img subdataset syntax
    name = (f"SRP:{DATA}/USRP_PCB4/FKUSRP01.GEN,"
            f"{DATA}/USRP_PCB4/FKUSRP01.IMG")
    df, meta, srp = read_srp(spark, name)
    assert py_checksum(to_array(df, meta)) == 24576
