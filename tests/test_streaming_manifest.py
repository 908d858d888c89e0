"""Streaming pipelines (AvailableNow over the events/documents tables must
equal the batch twin) and checkpoint-manifest resume semantics."""

import os

import pytest
from pyspark.sql import functions as F

from gdal_spark import queries as Q
from gdal_spark.plans import manifest as MF
from gdal_spark.streaming import pipelines as SP

SF = "/root/testdata/sf0.001"


def _stream_table(spark, name, tmp_path):
    """File-source stream over one parquet table. The file stream source
    needs a directory, so link the single-file table into a tmp dir."""
    d = tmp_path / f"src_{name}"
    d.mkdir(exist_ok=True)
    link = d / f"{name}.parquet"
    if not link.exists():
        link.symlink_to(f"{SF}/{name}.parquet")
    batch = spark.read.parquet(f"{SF}/{name}.parquet")
    return spark.readStream.schema(batch.schema).parquet(str(d))


def test_stream_event_window_equals_batch(spark, tmp_path):
    stream = SP.stream_event_window(_stream_table(spark, "events", tmp_path))
    SP.run_available_now(stream, str(tmp_path / "ck"), "ev_win", output_mode="complete")
    got = spark.table("ev_win").collect()
    want = Q.q_event_window(spark, SF).collect()
    assert sorted([tuple(r) for r in got]) == sorted([tuple(r) for r in want])


def test_stream_tile_counts(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # batch twin over the same derived points
    pts_sql = Q.POINTS_SQL
    docs.createOrReplaceTempView("documents")
    batch_pts = spark.sql(pts_sql).withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id")))
    stream_pts = _stream_table(spark, "documents", tmp_path)
    stream_pts.createOrReplaceTempView("documents_s")
    stream_pts = spark.sql(pts_sql.replace("FROM documents", "FROM documents_s")) \
        .withColumn("warc_ts", F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id")))
    out = SP.stream_tile_counts(stream_pts, zoom=6)
    SP.run_available_now(out, str(tmp_path / "ck2"), "tile_stream", output_mode="complete")
    got = {(r["win_start"], r["tx"], r["ty"]): r["n"]
           for r in spark.table("tile_stream").collect()}
    from gdal_spark.functions import tiles
    want_df = (tiles.with_tile_columns(batch_pts, zoom=6)
               .groupBy(F.window("warc_ts", "1 hour").alias("w"), "tx", "ty")
               .agg(F.count(F.lit(1)).alias("n")))
    want = {(r["w"]["start"], r["tx"], r["ty"]): r["n"] for r in want_df.collect()}
    assert got == want


def test_stream_sessionize_runs(spark, tmp_path):
    stream = SP.stream_sessionize(_stream_table(spark, "events", tmp_path))
    SP.run_available_now(stream, str(tmp_path / "ck3"), "sess", output_mode="complete")
    rows = spark.table("sess").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


# ---------------------------------------------------------------------------
# manifest / resume
# ---------------------------------------------------------------------------

def _tile_job(spark):
    pts = Q.doc_points(spark, SF)
    from gdal_spark.functions import tiles
    return (tiles.with_tile_columns(pts, zoom=4)
            .select("doc_id", "lon", "lat", "tx", "ty"))


def test_resumable_write_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    df = _tile_job(spark)
    full_keys = df.select("tx", "ty").distinct().count()
    total_rows = df.count()

    # first run: partial (simulate a crash after processing tx < 8)
    r1 = MF.resumable_write(df.filter(F.col("tx") < 8), out, ["tx", "ty"])
    assert r1["done_keys"] == 0 and r1["pending_keys"] > 0

    # resume with the full work list: only the missing keys are written
    r2 = MF.resumable_write(df, out, ["tx", "ty"])
    assert r2["done_keys"] == r1["pending_keys"]
    assert r2["pending_keys"] == full_keys - r1["pending_keys"]

    # third run: everything done, nothing recomputed
    r3 = MF.resumable_write(df, out, ["tx", "ty"])
    assert r3["pending_keys"] == 0

    # final output is complete and exactly-once
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == total_rows
    assert data.select("doc_id").distinct().count() == total_rows

    # lineage verification: no mismatches
    bad = MF.verify_manifest(spark, out)
    assert bad.count() == 0


def test_manifest_detects_corruption(spark, tmp_path):
    out = str(tmp_path / "c")
    df = _tile_job(spark)
    MF.resumable_write(df, out, ["tx"])
    # corrupt: append duplicate rows for one tx without touching the manifest
    dup = df.filter(F.col("tx") == df.select(F.min("tx")).collect()[0][0]).limit(1)
    dup.write.mode("append").partitionBy("tx").parquet(os.path.join(out, "data"))
    bad = MF.verify_manifest(spark, out)
    assert bad.count() == 1


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """Stateful dedup must remember hashes ACROSS micro-batches: batch 2
    re-sends every batch-1 text (new ids) plus genuinely new texts —
    only the new texts may come out of batch 2."""
    rows1 = [(i, f"text-{i % 5}") for i in range(10)]        # 5 distinct
    rows2 = ([(100 + i, f"text-{i % 5}") for i in range(10)]  # all dups
             + [(200 + i, f"fresh-{i}") for i in range(3)])   # 3 new
    d = tmp_path / "src_dedup"
    d.mkdir()
    spark.createDataFrame(rows1, "doc_id long, text string") \
        .coalesce(1).write.parquet(str(d / "b1.parquet"))
    spark.createDataFrame(rows2, "doc_id long, text string") \
        .coalesce(1).write.parquet(str(d / "b2.parquet"))
    batch = spark.read.parquet(str(d / "b1.parquet"))
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(d) + "/*/"))
    out = SP.stream_dedup_first_seen(stream)
    SP.run_available_now(out, str(tmp_path / "ck_dd"), "dedup_out")
    got = spark.table("dedup_out").collect()
    # exactly 5 + 3 first-seen rows, one per distinct text
    assert len(got) == 8
    assert len({r.content_hash for r in got}) == 8
    # every batch-1 text emitted a doc_id < 100; fresh texts from batch 2
    emitted_ids = sorted(r.doc_id for r in got)
    assert sum(1 for i in emitted_ids if i < 100) == 5
    assert [i for i in emitted_ids if i >= 200] == [200, 201, 202]
    # hash matches the JVM xxhash64 of the text column
    want = {r.doc_id: r.h for r in spark.read.parquet(str(d) + "/*/")
            .withColumn("h", F.xxhash64("text")).collect()}
    assert all(want[r.doc_id] == r.content_hash for r in got)
