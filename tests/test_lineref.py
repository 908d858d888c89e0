"""Linear referencing (ogrlineref analog) — kernel parity vs scalar
transcriptions of OGRSimpleCurve::Value/Project/getSubLine, plus the
Spark operators."""

import numpy as np

from gdal_spark.functions.geometry import decode_linestring, wkb_from_wkt
from gdal_spark.operators import lineref as LR

LINE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 0.0], [10.0, 5.0],
                 [4.0, 5.0]])  # includes a zero-length segment
TOTAL = 10.0 + 5.0 + 6.0


def test_line_value_semantics():
    assert LR.line_value(LINE, -3.0) == (0.0, 0.0)       # negative -> start
    assert LR.line_value(LINE, 0.0) == (0.0, 0.0)
    assert LR.line_value(LINE, 5.0) == (5.0, 0.0)
    assert LR.line_value(LINE, 12.5) == (10.0, 2.5)      # skips zero-length
    assert LR.line_value(LINE, 18.0) == (7.0, 5.0)
    assert LR.line_value(LINE, 99.0) == (4.0, 5.0)       # beyond -> end


def test_line_project_semantics():
    assert LR.line_project(LINE, 0.0, 0.0) == 0.0        # start short-circuit
    assert LR.line_project(LINE, 4.0, 5.0) == TOTAL      # end short-circuit
    assert LR.line_project(LINE, 5.0, -2.0) == 5.0       # below first segment
    assert LR.line_project(LINE, 11.0, 2.0) == 12.0      # right of second leg
    assert LR.line_project(LINE, 6.0, 4.0) == 10.0 + 5.0 + 4.0
    # equidistant from two segments: first minimal segment wins
    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]])
    assert LR.line_project(sq, 2.0, 2.0) == 2.0


def test_line_subline_semantics():
    # the reference duplicates the start vertex when from == 0 (it adds
    # point 0, leaves i = 0, and the tail loop re-adds vertex 0) — the
    # kernel replicates that quirk for parity
    sub = LR.line_subline(LINE, 0.0, 5.0)
    np.testing.assert_allclose(sub, [[0, 0], [0, 0], [5, 0]])
    sub = LR.line_subline(LINE, 2.0, 12.0)
    np.testing.assert_allclose(sub, [[2, 0], [10, 0], [10, 0], [10, 2]])
    sub = LR.line_subline(LINE, 12.0, 99.0)              # clamp to end
    np.testing.assert_allclose(sub, [[10, 2], [10, 5], [4, 5]])
    assert LR.line_subline(LINE, 9.0, 3.0) is None       # inverted
    assert LR.line_subline(LINE, TOTAL, TOTAL + 1) is None  # from >= length
    # whole line (start vertex duplicated per the from == 0 quirk)
    sub = LR.line_subline(LINE, 0.0, TOTAL)
    np.testing.assert_allclose(sub[0], [0, 0])
    np.testing.assert_allclose(sub[1], [0, 0])
    np.testing.assert_allclose(sub[-1], [4, 5])


def test_subline_lengths_partition_total():
    step = 4.0
    begins = np.arange(0.0, TOTAL, step)
    total = 0.0
    for b in begins:
        sub = LR.line_subline(LINE, b, min(b + step, TOTAL))
        d = np.diff(sub, axis=0)
        total += np.hypot(d[:, 0], d[:, 1]).sum()
    assert abs(total - TOTAL) < 1e-9


def test_with_measure_and_point_at(spark):
    wkb = wkb_from_wkt("LINESTRING (0 0,10 0,10 5,4 5)")
    df = spark.createDataFrame(
        [(1, bytearray(wkb), 11.0, 2.0, 12.5)],
        "id int, wkb binary, x double, y double, m double")
    row = LR.with_point_at(LR.with_measure(df), measure="m").collect()[0]
    assert row["measure"] == 12.0
    assert (row["ix"], row["iy"]) == (10.0, 2.5)


def test_milepost_parts_operator(spark):
    wkb = wkb_from_wkt("LINESTRING (0 0,10 0,10 5,4 5)")
    df = spark.createDataFrame([(7, bytearray(wkb))], "line_id int, wkb binary")
    rows = LR.milepost_parts(df, step=8.0).orderBy("part_id").collect()
    assert [r["part_id"] for r in rows] == [0, 1, 2]
    assert [r["begin"] for r in rows] == [0.0, 8.0, 16.0]
    assert rows[-1]["end"] == TOTAL
    assert abs(sum(r["part_len"] for r in rows) - TOTAL) < 1e-9
    # part geometry is the exact sub-line
    coords = decode_linestring(bytes(rows[1]["part_wkb"]))
    np.testing.assert_allclose(coords, [[8, 0], [10, 0], [10, 5], [9, 5]])
