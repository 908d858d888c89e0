"""Layer-algebra port of the reference's own ogr_layer_algebra.py
cases (autotest/ogr/ogr_layer_algebra.py algebra_setup +
intersection/union/symdifference/identity): layer A (two unit
rectangles with attribute A=1/2), layer B (one spanning rectangle,
attribute B='first'), and the D1==D2 self cases."""

import pytest

from gdal_spark.functions.geometry import (polygon_area, wkb_from_wkt,
                                           wkt_from_wkb)
from gdal_spark.operators.layer_algebra import (clip_polygons_to_cells,
                                                layer_identity_polygons,
                                                layer_symdifference,
                                                layer_union)

A1 = "POLYGON ((1 2,1 3,3 3,3 2,1 2))"
A2 = "POLYGON ((5 2,5 3,7 3,7 2,5 2))"
B1 = "POLYGON ((2 1,2 4,6 4,6 1,2 1))"
D1 = "POLYGON ((1 2,1 3,3 3,3 2,1 2))"
D2 = "POLYGON ((3 2,3 3,4 3,4 2,3 2))"


@pytest.fixture()
def layers(spark):
    a = spark.createDataFrame(
        [(1, 1, bytearray(wkb_from_wkt(A1))),
         (2, 2, bytearray(wkb_from_wkt(A2)))],
        "fid bigint, A int, geometry binary")
    b = spark.createDataFrame(
        [(1, "first", bytearray(wkb_from_wkt(B1)))],
        "cell_id bigint, B string, wkb binary")
    return a, b


def test_algebra_intersection(spark, layers):
    a, b = layers
    pieces = clip_polygons_to_cells(a, b).collect()
    # two rectangles: A1 n B = (2..3)x(2..3), A2 n B = (5..6)x(2..3)
    assert len(pieces) == 2
    by_id = {p["poly_id"]: p for p in pieces}
    assert abs(by_id[1]["piece_area"] - 1.0) < 1e-12
    assert abs(by_id[2]["piece_area"] - 1.0) < 1e-12
    for pid, xlo in ((1, 2.0), (2, 5.0)):
        import numpy as np

        from gdal_spark.functions.geometry import decode_polygons
        rings = decode_polygons(bytes(by_id[pid]["piece_wkb"]))[0]
        xs = rings[0][:, 0]
        ys = rings[0][:, 1]
        assert (xs.min(), xs.max()) == (xlo, xlo + 1.0)
        assert (ys.min(), ys.max()) == (2.0, 3.0)
    # attribute merge: join the ids back (the reference copies A and B
    # fields onto each intersection feature)
    joined = (spark.createDataFrame(
        [(p["poly_id"], p["cell_id"]) for p in pieces],
        "fid bigint, cell_id bigint")
        .join(a.select("fid", "A"), "fid")
        .join(layers[1].select("cell_id", "B"), "cell_id"))
    rows = {(r["A"], r["B"]) for r in joined.collect()}
    assert rows == {(1, "first"), (2, "first")}


def test_algebra_union_count(spark, layers):
    a, b = layers
    # Union: 2 intersections + 2 A-remainders + 1 B-remainder = 5
    out = layer_union(a, b).collect()
    assert len(out) == 5
    inter = [r for r in out if r["poly_id"] is not None
             and r["cell_id"] is not None]
    a_only = [r for r in out if r["cell_id"] is None]
    b_only = [r for r in out if r["poly_id"] is None]
    assert (len(inter), len(a_only), len(b_only)) == (2, 2, 1)
    # areas: A remainders 1 each; B remainder = 12 - 2 = 10
    assert abs(sum(r["piece_area"] for r in a_only) - 2.0) < 1e-9
    assert abs(b_only[0]["piece_area"] - 10.0) < 1e-9


def test_algebra_symdifference(spark, layers):
    a, b = layers
    out = layer_symdifference(a, b).collect()
    assert len(out) == 3
    assert all(r["poly_id"] is None or r["cell_id"] is None for r in out)


def test_algebra_identity(spark, layers):
    a, b = layers
    out = layer_identity_polygons(a, b).collect()
    # input split by method: 2 intersections + 2 input remainders
    assert len(out) == 4
    assert all(r["poly_id"] is not None for r in out)


def test_algebra_self(spark):
    d1 = spark.createDataFrame(
        [(1, bytearray(wkb_from_wkt(D1))),
         (2, bytearray(wkb_from_wkt(D2)))],
        "fid bigint, geometry binary")
    d2 = spark.createDataFrame(
        [(1, bytearray(wkb_from_wkt(D1))),
         (2, bytearray(wkb_from_wkt(D2)))],
        "cell_id bigint, wkb binary")
    # intersection with self reproduces the inputs
    pieces = clip_polygons_to_cells(d1, d2).collect()
    matched = [p for p in pieces if p["poly_id"] == p["cell_id"]]
    assert {(p["poly_id"], round(p["piece_area"], 9))
            for p in matched} == {(1, 2.0), (2, 1.0)}
    # symdifference with self: only zero-area artifacts at most
    sd = layer_symdifference(d1, d2).collect()
    assert all(r["piece_area"] < 1e-9 for r in sd)
