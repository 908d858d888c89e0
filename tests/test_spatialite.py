"""SQLite/SpatiaLite vector reader vs the reference's own fixtures.

The two fixtures (autotest/ogr/data/poly_spatialite.sqlite, legacy
metadata; poly_spatialite4.sqlite, SpatiaLite-4 integer geometry_type
metadata) hold the same 10 poly.shp features the reference's
ogr_sqlite.py round-trips (ogr_sqlite_2's poly layer), so the shapefile
read of poly.shp is an exact coordinate oracle."""

import json
import os
import struct

import pytest

from gdal_spark.functions.geometry import polygon_area, wkt_from_wkb
from gdal_spark.sources.formats import read_shapefile
from gdal_spark.sources.spatialite import (read_sqlite, spatialite_to_wkb,
                                           sqlite_layers)

DATA = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/poly_spatialite.sqlite"),
    reason="reference autotest data not present")

EAS_IDS = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]


def test_layer_discovery():
    for f in ("poly_spatialite.sqlite", "poly_spatialite4.sqlite"):
        layers = sqlite_layers(f"{DATA}/{f}")
        assert [l["name"] for l in layers] == ["poly"]
        assert layers[0]["format"] == "SPATIALITE"
        assert layers[0]["geom_col"].lower() == "geometry"


@pytest.mark.parametrize("fixture", ["poly_spatialite.sqlite",
                                     "poly_spatialite4.sqlite"])
def test_poly_matches_shapefile(spark, fixture):
    rows = (read_sqlite(spark, f"{DATA}/{fixture}")
            .orderBy("fid").collect())
    assert len(rows) == 10
    assert [int(json.loads(r["properties"])["eas_id"]) for r in rows] == \
        EAS_IDS
    shp = read_shapefile(spark, f"{DATA}/poly.shp").orderBy("fid").collect()
    for got, want in zip(rows, shp):
        # identical vertices: the sqlite DB was loaded from this shapefile
        assert wkt_from_wkb(bytes(got["geometry"])) == \
            wkt_from_wkb(bytes(want["geometry"]))


def _splite_blob(class_code: int, body: bytes, srid: int = 0) -> bytes:
    return (b"\x00\x01" + struct.pack("<i", srid) + b"\x00" * 32 + b"\x7c"
            + struct.pack("<i", class_code) + body + b"\xfe")


def test_blob_point_z_and_srid():
    srid, wkb = spatialite_to_wkb(
        _splite_blob(1001, struct.pack("<3d", 1.0, 2.0, 3.0), srid=4326))
    assert srid == 4326
    assert wkt_from_wkb(wkb) == "POINT (1 2 3)"


def test_blob_xym_drops_m():
    srid, wkb = spatialite_to_wkb(
        _splite_blob(2001, struct.pack("<3d", 5.0, 6.0, 9.0)))
    assert wkt_from_wkb(wkb) == "POINT (5 6)"


def test_blob_compressed_linestring():
    # first/last full doubles, intermediate float32 deltas
    body = struct.pack("<i", 3)
    body += struct.pack("<2d", 0.0, 0.0)
    body += struct.pack("<2f", 1.5, 2.5)
    body += struct.pack("<2d", 4.0, 4.0)
    srid, wkb = spatialite_to_wkb(_splite_blob(1000002, body))
    assert wkt_from_wkb(wkb) == "LINESTRING (0 0,1.5 2.5,4 4)"


def test_blob_multipolygon_markers():
    ring = struct.pack("<i", 1) + struct.pack("<i", 4) + struct.pack(
        "<8d", 0, 0, 1, 0, 1, 1, 0, 0)
    body = struct.pack("<i", 2)
    for _ in range(2):
        body += b"\x69" + struct.pack("<i", 3) + ring
    srid, wkb = spatialite_to_wkb(_splite_blob(6, body))
    assert abs(polygon_area(wkb) - 1.0) < 1e-12
    assert wkt_from_wkb(wkb).startswith("MULTIPOLYGON")


def test_corrupt_blob_is_none():
    assert spatialite_to_wkb(b"\x01" * 50) is None
    assert spatialite_to_wkb(None) is None
