"""Selafin reader/writer, mirroring the reference autotest scenario
(autotest/ogr/ogr_selafin.py: 5x5 node grid with value=i*5+j, quad
elements, element attribute = mean of node values — e.g. element 5's
value is 9 and element 10's is 15)."""

import json

import numpy as np
import pytest

from gdal_spark.functions.geometry import polygon_area, wkt_from_wkb
from gdal_spark.sources.selafin import (SelafinMesh, read_selafin,
                                        read_selafin_mesh,
                                        write_selafin_mesh)


def _grid_mesh():
    # 5x5 nodes at integer coords, value = i*5+j (x=i, y=j)
    xs, ys, vals = [], [], []
    for i in range(5):
        for j in range(5):
            xs.append(float(i))
            ys.append(float(j))
            vals.append(float(i * 5 + j))
    # 4x4 quads, 1-based node ids; node (i,j) has id i*5+j+1
    conn = []
    for i in range(4):
        for j in range(4):
            n = i * 5 + j + 1
            conn.append([n, n + 1, n + 6, n + 5])
    m = SelafinMesh("name", ["value"], xs, ys, np.array(conn),
                    epsg=4326)
    m.steps = [[np.array(vals)]]
    m.step_dates = [0.0]
    return m


def test_roundtrip(tmp_path):
    m = _grid_mesh()
    p = str(tmp_path / "tmp.slf")
    write_selafin_mesh(m, p)
    m2 = read_selafin_mesh(p)
    assert m2.title.strip() == "name"
    assert m2.var_names[0].strip() == "value"
    assert m2.n_points == 25 and m2.n_elements == 16
    assert m2.points_per_element == 4
    assert m2.epsg == 4326
    np.testing.assert_allclose(m2.x, m.x)
    np.testing.assert_allclose(m2.y, m.y)
    np.testing.assert_array_equal(m2.connectivity, m.connectivity)
    np.testing.assert_allclose(m2.steps[0][0], m.steps[0][0])


def test_element_attribute_means(spark, tmp_path):
    # ogr_selafin_create_elements: element 5 -> 9, element 10 -> 15
    m = _grid_mesh()
    p = str(tmp_path / "tmp.slf")
    write_selafin_mesh(m, p)
    els = read_selafin(spark, p, "elements").orderBy("fid").collect()
    assert len(els) == 16
    assert abs(json.loads(els[5]["properties"])["value"] - 9) < 0.01
    assert abs(json.loads(els[10]["properties"])["value"] - 15) < 0.01
    for r in els:
        assert abs(polygon_area(bytes(r["geometry"])) - 1.0) < 1e-9


def test_points_layer(spark, tmp_path):
    m = _grid_mesh()
    p = str(tmp_path / "tmp.slf")
    write_selafin_mesh(m, p)
    pts = read_selafin(spark, p, "points").orderBy("fid").collect()
    assert len(pts) == 25
    assert wkt_from_wkb(bytes(pts[0]["geometry"])) == "POINT (0 0)"
    assert json.loads(pts[7]["properties"])["value"] == 7.0
