"""Scattered points → regular grid (gdal_grid), cell-partitioned, zero-UDF.

Reference: GDALGridCreate dispatch (gdal/alg/gdalgrid.cpp:1470) with
algorithms invdist (:119 — search ellipse, power/smoothing, singularity
short-circuit when r² < 1e-13, min_points/nodata rule), moving average
(:366), nearest (:461), and the data metrics (min/max/range/count/
average-distance, gdal/alg/gdal_alg.h:358-368). Node coordinates are cell
centers: ``x = x0 + (i + 0.5)·dx`` (gdalgrid.cpp GDALGridCreate loop).
Circular search only (radius1 = radius2, no rotation).

Spark shape: the search radius becomes the partition cell size — points
get a cell key (pure floor arithmetic), every grid node probes its 3×3
neighbor cells via a static 9-offset explode, one equi-join on the cell
key, then a plain groupBy(node). Everything is Catalyst column math — the
SIMD inner loop of the reference (gdalgridsse.cpp:46) becomes whole-stage
codegen. Skew: dense point cells fan out to ≤9 node cells; AQE skew-join
splits oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.raster.model import RasterMeta

_EPS = 0.0000000000001  # gdalgrid.cpp:184 singularity threshold


def _node_df(spark, meta: RasterMeta):
    g = meta.gt
    nodes = spark.range(meta.width * meta.height).select(
        (F.col("id") % meta.width).cast("long").alias("px"),
        (F.col("id") / meta.width).cast("long").alias("py"))
    return nodes.select(
        "px", "py",
        (F.lit(g[0]) + (F.col("px") + 0.5) * F.lit(g[1])).alias("nx"),
        (F.lit(g[3]) + (F.col("py") + 0.5) * F.lit(g[5])).alias("ny"))


def _candidate_pairs(points: DataFrame, meta: RasterMeta, radius: float,
                     x="x", y="y"):
    """Nodes × nearby points: cell-key equi-join with 3×3 node fan-out."""
    spark = points.sparkSession
    c = float(radius)
    pts = points.withColumn("_cx", F.floor(F.col(x) / c).cast("long")) \
                .withColumn("_cy", F.floor(F.col(y) / c).cast("long"))
    nodes = _node_df(spark, meta)
    off = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("long").alias("_ox"),
        (F.floor(F.col("id") / 3) - 1).cast("long").alias("_oy"))
    nodes9 = (nodes.crossJoin(F.broadcast(off))
              .withColumn("_cx", F.floor(F.col("nx") / c).cast("long") + F.col("_ox"))
              .withColumn("_cy", F.floor(F.col("ny") / c).cast("long") + F.col("_oy"))
              .drop("_ox", "_oy"))
    pairs = nodes9.join(pts, on=["_cx", "_cy"], how="inner")
    dx = F.col(x) - F.col("nx")
    dy = F.col(y) - F.col("ny")
    return (pairs.withColumn("_d2", dx * dx + dy * dy)
            .filter(F.col("_d2") <= F.lit(c * c)))


def grid_invdist(points: DataFrame, meta: RasterMeta, radius: float,
                 power: float = 2.0, smoothing: float = 0.0,
                 min_points: int = 0, nodata: float = 0.0,
                 x="x", y="y", z="z") -> DataFrame:
    """Inverse-distance-to-a-power (gdalgrid.cpp:119). Returns node rows
    (px, py, val). Nodes with no candidate in radius are omitted when
    ``nodata`` would apply and min_points == 0 keeps them absent — callers
    needing dense output scatter into blocks afterwards."""
    pairs = _candidate_pairs(points, meta, radius, x, y)
    r2 = F.col("_d2") + F.lit(smoothing * smoothing)
    w = F.pow(r2, F.lit(power / 2.0))
    inv_w = F.lit(1.0) / w
    near = r2 < F.lit(_EPS)
    agg = (pairs.groupBy("px", "py").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(~near, inv_w * F.col(z)).otherwise(0.0)).alias("_nom"),
        F.sum(F.when(~near, inv_w).otherwise(0.0)).alias("_den"),
        F.max(F.when(near, F.col(z))).alias("_nearz")))
    val = (F.when(F.col("_nearz").isNotNull(), F.col("_nearz"))
           .when((F.col("_n") < min_points) | (F.col("_den") == 0.0),
                 F.lit(nodata))
           .otherwise(F.col("_nom") / F.col("_den")))
    return agg.select("px", "py", val.alias("val"))


def grid_nearest(points: DataFrame, meta: RasterMeta, radius: float,
                 x="x", y="y", z="z", order: str = "pid") -> DataFrame:
    """GDALGridNearestNeighbor (:461): value of the closest point within the
    radius; ``order`` breaks exact-distance ties deterministically."""
    from pyspark.sql import Window
    pairs = _candidate_pairs(points, meta, radius, x, y)
    win = Window.partitionBy("px", "py").orderBy(F.col("_d2"), F.col(order))
    return (pairs.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .select("px", "py", F.col(z).alias("val")))


def grid_metric(points: DataFrame, meta: RasterMeta, radius: float,
                metric: str = "count", x="x", y="y", z="z") -> DataFrame:
    """Data metrics (gdal/alg/gdal_alg.h:358-368 / gdalgrid.cpp:461+):
    minimum | maximum | range | count | average_distance | average
    (moving-average, gdalgrid.cpp:366)."""
    pairs = _candidate_pairs(points, meta, radius, x, y)
    exprs = {
        "minimum": F.min(z),
        "maximum": F.max(z),
        "range": F.max(z) - F.min(z),
        "count": F.count(F.lit(1)).cast("double"),
        "average_distance": F.avg(F.sqrt("_d2")),
        "average": F.avg(z),
    }
    if metric not in exprs:
        raise ValueError(f"unknown metric {metric!r}")
    return (pairs.groupBy("px", "py")
            .agg(exprs[metric].cast("double").alias("val")))


def grid_avg_distance_pts(points: DataFrame, meta: RasterMeta, radius: float,
                          x="x", y="y", pid="pid") -> DataFrame:
    """GDALGridDataMetricAverageDistancePts (gdalgrid.cpp:1171-1263):
    mean distance over all unordered PAIRS of points inside the node's
    search circle (the reference's i<j double loop — pair distance is
    point-to-point, not point-to-node). Nodes with fewer than two
    in-radius points have no pairs and are omitted (the reference writes
    nodata there). The per-node pair count is quadratic in neighborhood
    size — bounded by the radius/cell geometry the same way the
    reference's ellipse search is."""
    cand = _candidate_pairs(points, meta, radius, x, y)
    a = cand.select("px", "py", F.col(pid).alias("_pa"),
                    F.col(x).alias("_xa"), F.col(y).alias("_ya"))
    b = cand.select("px", "py", F.col(pid).alias("_pb"),
                    F.col(x).alias("_xb"), F.col(y).alias("_yb"))
    dx = F.col("_xa") - F.col("_xb")
    dy = F.col("_ya") - F.col("_yb")
    return (a.join(b, on=["px", "py"])
            .filter(F.col("_pa") < F.col("_pb"))
            .groupBy("px", "py")
            .agg(F.avg(F.sqrt(dx * dx + dy * dy)).cast("double").alias("val")))
