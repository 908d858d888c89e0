"""Temporal / range join operators (SURVEY §2.3: theta, range, as-of,
interval joins).

The reference has no dedicated operators for these — OGR SQL evaluates
arbitrary theta predicates inside its nested-loop join
(gdal/ogr/ogr_gensql.cpp join evaluation) — but a nested loop is exactly
what cannot ship at 100 TB. Spark-first shapes:

- :func:`asof_join` — the union-merge-window form: tag both inputs, one
  shuffle on the join key, one ordered window carrying the last-seen
  right value forward. No cross product, no range explosion; cost is a
  single exchange + sort, identical to a groupBy on the key.
- :func:`range_join_bucketed` — value-interval (band) join via bucket
  explode + equi-join + exact filter: each interval explodes to the
  fixed-width buckets it covers (intervals are the small side), rows
  compute their bucket in column math, and the equi-join on bucket
  replaces the theta join. With AQE the bucket join broadcasts when the
  interval side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              right_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row, the right row with the greatest
    ``right_time <= left_time`` in the same ``key`` group (backward
    inclusive as-of, pandas ``merge_asof`` semantics; right ties on time
    resolve to the row latest in ``right_cols[0]`` order).

    Union-merge-window: single shuffle on ``key``; the window carries
    each right value forward to the left rows that follow it in time."""
    lcols = left.columns
    tag_l = left.select(
        *lcols, F.col(left_time).alias("_t"), F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols])
    tag_r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != key],
        F.col(key),
        F.col(right_time).alias("_t"), F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols])
    merged = tag_l.unionByName(tag_r)
    # right rows sort before left rows at equal time (inclusive match);
    # ties among right rows resolve by the first right column ascending,
    # so last() picks the greatest
    w = (Window.partitionBy(key)
         .orderBy("_t", "_tag", f"_r_{right_cols[0]}")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.select(
        *lcols, "_tag",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c + suffix)
          for c in right_cols])
    return carried.filter(F.col("_tag") == 1).drop("_tag")


def range_join_bucketed(rows: DataFrame, val_col: str,
                        intervals: DataFrame, lo: str, hi: str,
                        bucket_width: float) -> DataFrame:
    """Join each row to every interval with ``lo <= val < hi`` —
    bucket-explode equi-join instead of a theta join. ``bucket_width``
    trades explode volume (intervals side) against candidate filtering;
    pick ~ the median interval width."""
    bw = float(bucket_width)
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(lo) / bw).cast("long"),
            F.floor((F.col(hi) - 1e-12) / bw).cast("long"))))
    keyed = rows.withColumn("_b", F.floor(F.col(val_col) / bw).cast("long"))
    out = keyed.join(iv, on="_b", how="inner") \
        .filter((F.col(val_col) >= F.col(lo)) & (F.col(val_col) < F.col(hi)))
    return out.drop("_b")
