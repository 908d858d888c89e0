"""Tile counts + pyramid rollup invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdal_spark.functions import tiles as T
from gdal_spark.operators import tiling
from gdal_spark.sources import pages as P


def test_tile_counts_match_python(spark):
    pts = P.extract_points(P.pages(spark, 300, n_hosts=60)).persist()
    out = tiling.tile_counts(pts, zoom=7).collect()
    rows = pts.collect()
    expected = {}
    for r in rows:
        key = T.py_latlon_to_tile(r["lat"], r["lon"], 7)
        expected[key] = expected.get(key, 0) + 1
    got = {(r["tx"], r["ty"]): r["n"] for r in out}
    assert got == expected
    for r in out:
        assert r["quadkey"] == T.py_quadkey(r["tx"], r["ty"], 7)
        assert r["zoom"] == 7


def test_pyramid_conserves_counts_and_matches_direct(spark):
    pts = P.extract_points(P.pages(spark, 500, n_hosts=80)).persist()
    base = tiling.tile_counts(pts, zoom=8)
    pyr = tiling.pyramid(base, zoom=8, min_zoom=4).persist()
    total = pts.count()
    for z in range(4, 9):
        lvl = pyr.filter(F.col("zoom") == z)
        assert lvl.agg(F.sum("n")).collect()[0][0] == total, z
        # rolled-up level must equal direct assignment at that zoom
        direct = {(r["tx"], r["ty"]): r["n"]
                  for r in tiling.tile_counts(pts, zoom=z).collect()}
        rolled = {(r["tx"], r["ty"]): r["n"] for r in lvl.collect()}
        assert rolled == direct, z
