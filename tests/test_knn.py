"""kNN: cell-ring expansion must equal brute force exactly (FIXTURES.md §7:
ties broken by (dist, id))."""

from __future__ import annotations

import pytest

from gdal_spark.operators import knn as K
from gdal_spark.sources import pages as P
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pts_queries(spark):
    pts = (P.extract_points(P.pages(spark, 600, n_hosts=150))
           .withColumn("pid", F.xxhash64("url"))
           .select("pid", "lon", "lat").persist())
    qs = (P.extract_points(P.pages(spark, 4000, n_hosts=1000))
          .limit(25)
          .withColumn("qid", F.monotonically_increasing_id())
          .select("qid", "lon", "lat").persist())
    return pts, qs


@pytest.mark.parametrize("k", [1, 3, 5])
def test_cell_ring_equals_bruteforce(spark, pts_queries, k):
    pts, qs = pts_queries
    brute = {(r["qid"], r["rank"]): r["pid"]
             for r in K.knn_bruteforce(qs, pts, k).collect()}
    ring = {(r["qid"], r["rank"]): r["pid"]
            for r in K.knn_cell_ring(qs, pts, k, zoom=5).collect()}
    assert ring == brute


def test_cell_ring_dense_zoom(spark, pts_queries):
    """High zoom => many empty rings before settling; result must not change."""
    pts, qs = pts_queries
    brute = {(r["qid"], r["rank"]): r["pid"]
             for r in K.knn_bruteforce(qs, pts, 2).collect()}
    ring = {(r["qid"], r["rank"]): r["pid"]
            for r in K.knn_cell_ring(qs, pts, 2, zoom=8, max_rings=300).collect()}
    assert ring == brute
