"""Temporal/range join operators (SURVEY §2.3) — as-of union-merge-window
and bucket-explode range joins."""

import datetime as dt

from pyspark.sql import functions as F

from gdal_spark.operators import joins as J


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_basic_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 20, _ts(9))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(2), 100), (10, _ts(5), 101), (20, _ts(30), 200)],
        "user_id long, ts timestamp, view_id long")
    out = {r.event_id: r.view_id for r in
           J.asof_join(left, right, "user_id", "ts", "ts",
                       ["view_id"], suffix="").collect()}
    assert out[1] == 101      # inclusive: right at equal ts matches
    assert out[2] is None     # no earlier right row
    assert out[3] is None     # right row is later only


def test_asof_tie_takes_highest(spark):
    left = spark.createDataFrame([(1, 5, _ts(9))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(5, _ts(3), 7), (5, _ts(3), 9), (5, _ts(3), 8)],
        "user_id long, ts timestamp, view_id long")
    out = J.asof_join(left, right, "user_id", "ts", "ts",
                      ["view_id"], suffix="").collect()[0]
    assert out.view_id == 9


def test_range_join_boundaries(spark):
    rows = spark.createDataFrame([(1, 0.0), (2, 1.99), (3, 2.0), (4, 7.5)],
                                 "id long, value double")
    bands = spark.createDataFrame([("a", 0.0, 2.0), ("b", 2.0, 8.0)],
                                  "band string, lo double, hi double")
    out = {r.id: r.band for r in
           J.range_join_bucketed(rows, "value", bands, "lo", "hi",
                                 bucket_width=1.0).collect()}
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}  # lo inclusive, hi exclusive


def test_range_join_matches_theta(spark):
    rows = spark.range(200).select(
        F.col("id"), (F.col("id") % 37 * 0.7).alias("value"))
    bands = spark.createDataFrame(
        [("x", 0.0, 5.0), ("y", 5.0, 11.3), ("z", 11.3, 40.0)],
        "band string, lo double, hi double")
    fast = J.range_join_bucketed(rows, "value", bands, "lo", "hi", 3.0) \
        .groupBy("band").count().collect()
    slow = rows.crossJoin(bands) \
        .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))) \
        .groupBy("band").count().collect()
    assert {r.band: r["count"] for r in fast} == \
           {r.band: r["count"] for r in slow}
