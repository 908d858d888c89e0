"""NAS (ALKIS) reader vs the reference's own local fixtures
(autotest/ogr/ogr_nas.py ogr_nas_3 / ogr_nas_4 / the replace test)."""

import os

import pytest

from gdal_spark.functions.geometry import wkt_from_wkb
from gdal_spark.sources.nas import nas_layers, read_nas

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/delete_nas.xml"),
    reason="reference autotest data not present")


def test_empty_nas_layer_count():
    # ogr_nas_3: one layer (the always-present relation layer)
    assert nas_layers(f"{DATA}/empty_nas.xml") == ["ALKIS_beziehungen"]


def test_delete_nas(spark):
    # ogr_nas_4: 2 layers; Delete has 3 features with checked values
    layers = nas_layers(f"{DATA}/delete_nas.xml")
    assert len(layers) == 2 and layers[-1] == "Delete"
    df = read_nas(spark, f"{DATA}/delete_nas.xml", "Delete")
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["context"] == "Delete"
    assert rows[0]["typeName"] == "AX_Namensnummer"
    assert rows[0]["FeatureId"] == "DENW44AL00000HJU20100730T092847Z"


def test_replace_nas(spark):
    p = f"{DATA}/replace_nas.xml"
    layers = nas_layers(p)
    assert len(layers) == 3 and layers[-1] == "Delete"

    row = read_nas(spark, p, "Delete").collect()[0]
    assert row["context"] == "Replace"
    assert row["replacedBy"] == "DENW44AL00003IkM20110429T070635Z"
    assert row["safeToIgnore"] == "false"
    assert row["typeName"] == "AX_Flurstueck"
    assert row["FeatureId"] == "DENW44AL00003IkM20100809T071726Z"

    feat = read_nas(spark, p, "AX_Flurstueck").collect()[0]
    assert feat["gml_id"] == "DENW44AL00003IkM20110429T070635Z"
    assert feat["stelle"] == 5212
    # the parcel surface came through as a polygon
    wkt = wkt_from_wkb(bytes(feat["geometry"]))
    assert wkt.startswith("POLYGON")


def test_relations(spark):
    df = read_nas(spark, f"{DATA}/replace_nas.xml", "ALKIS_beziehungen")
    rows = df.collect()
    assert len(rows) > 0
    # every relation row points from the replacing parcel
    assert all(r["beziehung_von"] == "DENW44AL00003IkM20110429T070635Z"
               for r in rows)
    tos = {r["beziehung_zu"] for r in rows}
    assert "DENW44AL00003UOQ" in tos           # urn:adv:oid xlink target
