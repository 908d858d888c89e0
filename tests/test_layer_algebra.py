"""Layer algebra + mosaic/reblock + constructive geometry tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geometry as G
from gdal_spark.operators import layer_algebra as LA
from gdal_spark.raster import model as M
from gdal_spark.raster import mosaic as MO
from gdal_spark.sources import polygons as PG


# ---------------------------------------------------------------------------
# constructive geometry kernels
# ---------------------------------------------------------------------------

def test_centroid_square_and_hole():
    sq = G.encode_polygon([np.array([[0, 0], [4, 0], [4, 4], [0, 4]])])
    assert G.polygon_centroid(sq) == pytest.approx((2.0, 2.0))
    holed = G.encode_polygon([
        np.array([[0, 0], [4, 0], [4, 4], [0, 4]]),
        np.array([[2, 2], [4, 2], [4, 4], [2, 4]])])  # cut top-right quarter
    cx, cy = G.polygon_centroid(holed)
    # remaining L-shape centroid: 3 unit-16/3... compute directly
    # squares (0..4,0..2) area 8 c=(2,1); (0..2,2..4) area 4 c=(1,3)
    assert (cx, cy) == pytest.approx(((8 * 2 + 4 * 1) / 12, (8 * 1 + 4 * 3) / 12))


def test_segmentize():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = G.segmentize(line, 3.0)
    assert len(out) == 5  # 4 sub-segments of 2.5
    assert np.allclose(np.diff(out[:, 0]), 2.5)


def test_clip_convex_exact():
    tri = np.array([[0.0, 0.0], [8.0, 0.0], [0.0, 8.0]])
    win = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
    out = G.clip_ring_convex(tri, win)
    # clipped piece is the polygon x>=2, y>=2, x+y<=8 → triangle (2,2)(6,2)(2,6)
    area = G.ring_area(np.vstack([out, out[:1]]))
    assert area == pytest.approx(8.0)


def test_polygon_clip_area_partition(spark):
    """Partition-of-unity: clipping by a disjoint covering grid must
    reproduce each polygon's exact area."""
    polys = PG.poly_fixture(spark)
    grid = PG.admin_grid(spark, nx=16, ny=3, lon_min=-2.0, lon_max=202.0,
                         lat_min=-1.0, lat_max=11.0)
    pieces = LA.clip_polygons_to_cells(polys, grid)
    got = {r["poly_id"]: r["total"] for r in
           pieces.groupBy("poly_id").agg(F.sum("piece_area").alias("total"))
           .collect()}
    for fid, want in [(0, 100.0), (3, 72.0), (7, 96.0), (9, 100.0)]:
        assert got[fid] == pytest.approx(want, abs=1e-9), fid
    # pieces carry valid WKB whose area matches the reported area
    for r in pieces.limit(20).collect():
        assert G.polygon_area(bytes(r["piece_wkb"])) == pytest.approx(
            r["piece_area"], abs=1e-9)


def test_points_algebra(spark):
    pts = spark.createDataFrame(
        [(i, float(i * 7 % 40), float(i * 3 % 20)) for i in range(50)],
        "pid long, lon double, lat double")
    grid = PG.admin_grid(spark, nx=2, ny=1, lon_min=0.0, lon_max=30.0,
                         lat_min=0.0, lat_max=15.0)
    inner = LA.points_intersection(pts, grid, strategy="broadcast")
    erased = LA.points_erase(pts, grid, strategy="broadcast")
    assert inner.count() + erased.count() == 50
    ident = LA.points_identity(pts, grid, strategy="broadcast")
    assert ident.count() == 50
    clip = LA.points_clip(pts, grid, strategy="broadcast")
    assert clip.count() == inner.select("pid").distinct().count()
    # update: patch replaces same-key rows
    patch = spark.createDataFrame([(1, 999.0, 999.0)],
                                  "pid long, lon double, lat double")
    upd = LA.points_update(pts, patch, "pid")
    assert upd.count() == 50
    assert upd.filter("pid = 1").collect()[0]["lon"] == 999.0


# ---------------------------------------------------------------------------
# mosaic / reblock
# ---------------------------------------------------------------------------

def test_mosaic_last_on_top_nodata(spark):
    meta = M.RasterMeta("a", 40, 30, nodata=0.0, block=16)
    a = np.zeros((30, 40), dtype=np.uint8); a[5:15, 5:15] = 3
    b = np.zeros((30, 40), dtype=np.uint8); b[10:20, 10:25] = 7
    out, om = MO.mosaic([(M.from_array(spark, a, meta), meta),
                         (M.from_array(spark, b, meta), meta)], "m")
    got = M.to_array(out, om)
    want = a.copy()
    want[b != 0] = b[b != 0]   # later paints over, nodata doesn't
    np.testing.assert_array_equal(got, want)
    assert got[6, 6] == 3 and got[12, 12] == 7


def test_reblock_roundtrip(spark):
    arr = ((np.arange(50 * 70).reshape(50, 70)) % 251).astype(np.uint8)
    meta = M.RasterMeta("r", 70, 50, block=16)
    tiles = M.from_array(spark, arr, meta)
    out, om = MO.reblock(tiles, meta, 24)
    assert om.block == 24
    got = M.to_array(out, om)
    np.testing.assert_array_equal(got, arr)
    # block count changes as expected
    assert out.count() == ((70 + 23) // 24) * ((50 + 23) // 24)


# ---------------------------------------------------------------------------
# polygon-layer Union / SymDifference (ogrlayer.cpp:2282, 2626)
# ---------------------------------------------------------------------------

def _rect_layer(spark, rows, id_name="fid", wkb_name="geometry"):
    import numpy as np
    recs = []
    for rid, x0, y0, x1, y1 in rows:
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                        dtype=float)
        recs.append((rid, bytearray(G.encode_polygon([ring]))))
    return spark.createDataFrame(recs, f"{id_name} long, {wkb_name} binary")


def test_layer_union_three_families(spark):
    """One overlapping pair: A=[0,10]^2, B=[5,-5..15]: A∩B=25, A−B=75,
    B−A=75; a second disjoint A (fid 2) and disjoint B (cell 9) emit whole."""
    a = _rect_layer(spark, [(1, 0, 0, 10, 10), (2, 100, 0, 110, 10)])
    b = _rect_layer(spark, [(5, 5, 5, 15, 15), (9, 200, 0, 210, 10)],
                    id_name="cell_id", wkb_name="wkb")
    rows = LA.layer_union(a, b).collect()
    got = {(r["poly_id"], r["cell_id"]): r["piece_area"] for r in rows}
    assert got == {(1, 5): 25.0, (1, None): 75.0, (2, None): 100.0,
                   (None, 5): 75.0, (None, 9): 100.0}
    # geometry sanity: every piece decodes and area matches ring math
    for r in rows:
        assert abs(G.polygon_area(bytes(r["piece_wkb"])) - r["piece_area"]) < 1e-9


def test_layer_symdiff_drops_intersection(spark):
    a = _rect_layer(spark, [(1, 0, 0, 10, 10)])
    b = _rect_layer(spark, [(5, 5, 5, 15, 15)], id_name="cell_id",
                    wkb_name="wkb")
    got = {(r["poly_id"], r["cell_id"]): r["piece_area"]
           for r in LA.layer_symdifference(a, b).collect()}
    assert got == {(1, None): 75.0, (None, 5): 75.0}


def test_layer_union_hole_piece(spark):
    """Method cell strictly inside the subject → A−B piece is a ring with a
    hole; B−A empty; A∩B = the cell."""
    a = _rect_layer(spark, [(1, 0, 0, 10, 10)])
    b = _rect_layer(spark, [(5, 4, 4, 6, 6)], id_name="cell_id",
                    wkb_name="wkb")
    rows = {(r["poly_id"], r["cell_id"]): r for r in LA.layer_union(a, b).collect()}
    assert set(rows) == {(1, 5), (1, None)}
    piece = rows[(1, None)]
    assert piece["piece_area"] == 96.0
    polys = G.decode_polygons(bytes(piece["piece_wkb"]))
    assert len(polys) == 1 and len(polys[0]) == 2  # exterior + hole


def test_layer_identity_polygons(spark):
    """Identity = intersection pieces + uncovered input remainder, no
    method-only pieces (ogrlayer.cpp:2937)."""
    a = _rect_layer(spark, [(1, 0, 0, 10, 10)])
    b = _rect_layer(spark, [(5, 5, 5, 15, 15)], id_name="cell_id",
                    wkb_name="wkb")
    got = {(r["poly_id"], r["cell_id"]): r["piece_area"]
           for r in LA.layer_identity_polygons(a, b).collect()}
    assert got == {(1, 5): 25.0, (1, None): 75.0}


def test_layer_union_rotated_concave(spark):
    """Non-rectilinear operands end-to-end: 45°-rotated holed/concave
    subjects × concave L-shaped rotated cells through the Martinez–Rueda
    kernel. Exact identity: Σ pieces partitions area(A ∪ B)."""
    from gdal_spark.sources import polygons as PG
    polys = PG.rot_poly_fixture(spark)
    grid = PG.diamond_grid(spark, nx=8, ny=2, u_min=-2.0, u_max=98.0,
                           v_min=-1.0, v_max=7.0, concave=True)
    rows = LA.layer_union(polys, grid).collect()
    # subjects: 10 diamonds area 50 each, minus notch 14 (fid3) / hole 2
    # (fid7) → total (10*100 - 28 - 4)/2 = 484; cells: 16 L's of 18.75
    a_total = 484.0
    b_total = 16 * 18.75
    inter = sum(r["piece_area"] for r in rows
                if r["poly_id"] is not None and r["cell_id"] is not None)
    a_only = sum(r["piece_area"] for r in rows
                 if r["poly_id"] is not None and r["cell_id"] is None)
    b_only = sum(r["piece_area"] for r in rows
                 if r["poly_id"] is None and r["cell_id"] is not None)
    assert inter > 0 and a_only > 0 and b_only > 0
    assert inter + a_only == pytest.approx(a_total, abs=1e-9)
    assert inter + b_only == pytest.approx(b_total, abs=1e-9)
    # every piece's stored area matches its geometry
    for r in rows:
        assert abs(G.polygon_area(bytes(r["piece_wkb"])) - r["piece_area"]) < 1e-9
