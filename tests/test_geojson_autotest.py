"""Ports of autotest/ogr/ogr_geojson.py cases 2..8 (standalone geometry
documents: type + extent) and 26 (64-bit integers)."""

import json
import os

import pytest

from gdal_spark.functions.geometry import geometry_envelope, wkt_from_wkb
from gdal_spark.sources.formats import read_geojson

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/point.geojson"),
    reason="reference autotest data not present")

# (fixture, wkt prefix, (xmin, xmax, ymin, ymax)) per validate_layer
CASES = [
    ("point.geojson", "POINT", (100.0, 100.0, 0.0, 0.0)),
    ("linestring.geojson", "LINESTRING", (100.0, 101.0, 0.0, 1.0)),
    ("polygon.geojson", "POLYGON", (100.0, 101.0, 0.0, 1.0)),
    ("geometrycollection.geojson", "GEOMETRYCOLLECTION",
     (100.0, 102.0, 0.0, 1.0)),
    ("multipoint.geojson", "MULTIPOINT", (100.0, 101.0, 0.0, 1.0)),
    ("multilinestring.geojson", "MULTILINESTRING",
     (100.0, 103.0, 0.0, 3.0)),
    ("multipolygon.geojson", "MULTIPOLYGON", (100.0, 103.0, 0.0, 3.0)),
]


@pytest.mark.parametrize("fixture,prefix,extent", CASES)
def test_standalone_geometries(spark, fixture, prefix, extent):
    rows = read_geojson(spark, f"{DATA}/{fixture}").collect()
    assert len(rows) == 1
    wkb = bytes(rows[0]["geometry"])
    assert wkt_from_wkb(wkb).startswith(prefix + " ")
    x0, y0, x1, y1 = geometry_envelope(wkb)
    assert (x0, x1, y0, y1) == extent


def test_64bit_integers(spark, tmp_path):
    # ogr_geojson_26
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": 1,
         "geometry": {"type": "Point", "coordinates": [1, 2]},
         "properties": {"intvalue": 1, "int64": 1234567890123,
                        "intlist": [1]}},
        {"type": "Feature", "id": 1234567890123,
         "geometry": {"type": "Point", "coordinates": [3, 4]},
         "properties": {"intvalue": 1234567890123,
                        "intlist": [1, 1234567890123]}},
    ]}
    p = str(tmp_path / "big.geojson")
    with open(p, "w") as f:
        json.dump(doc, f)
    rows = read_geojson(spark, p).orderBy("fid").collect()
    assert [r["fid"] for r in rows] == [1, 1234567890123]
    p0 = json.loads(rows[0]["properties"])
    p1 = json.loads(rows[1]["properties"])
    assert p0["int64"] == 1234567890123
    assert p1["intvalue"] == 1234567890123
    assert p1["intlist"] == [1, 1234567890123]
