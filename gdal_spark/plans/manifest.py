"""Checkpoint manifests, per-partition lineage, and exact resume.

Reference analog: ``gdal2tiles --resume`` skips tiles whose output file
already exists (gdal/swig/python/scripts/gdal2tiles.py:1200-1205), and
GDAL's progress-callback contract reports per-chunk completion
(GDALProgressFunc, used by every long op, e.g. ogrlayer.cpp:2057-2068).

Distributed translation (SURVEY.md §2.10): outputs are *partition-
addressed and idempotent* — the job key space is a set of key columns
(tile key, block key, cell prefix); each completed key writes exactly one
manifest row::

    (job_id, <keys...>, n_rows, checksum, batch_id)

Resume = anti-join the work list against the manifest: only keys with no
manifest row are recomputed, giving exact at-least-once→exactly-once
semantics as long as per-key output is deterministic (every operator in
this engine is). The checksum is an order-independent BIT_XOR of row
hashes, so it is stable under any shuffle order — a cheap end-to-end
integrity check per partition.

Scale: the manifest is ~one row per output partition (millions of rows at
10^12-pixel scale) — itself a partitioned parquet table, never collected
to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _manifest_dir(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def lineage_rows(df: DataFrame, keys: list[str], job_id: str,
                 batch_id: int = 0) -> DataFrame:
    """Per-key lineage: row count + order-independent row checksum."""
    data_cols = [c for c in df.columns if c not in keys]
    row_hash = F.xxhash64(*[F.col(c) for c in data_cols]) if data_cols \
        else F.lit(0).cast("long")
    return (df.withColumn("_h", row_hash)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(_h)").alias("checksum"))
            .withColumn("job_id", F.lit(job_id))
            .withColumn("batch_id", F.lit(batch_id)))


def resumable_write(df: DataFrame, out_dir: str, keys: list[str],
                    job_id: str = "job") -> dict:
    """Write ``df`` partitioned by ``keys`` with manifest-gated resume.

    Returns {"pending_keys": n, "done_keys": n, "rows_written": n}.
    Completed keys (present in the manifest) are skipped entirely — their
    input partitions are pruned before any compute, the distributed
    equivalent of the reference's existing-file skip.
    """
    spark = df.sparkSession
    man = read_manifest(spark, out_dir)
    if man is not None:
        done = man.filter(F.col("job_id") == job_id).select(*keys).distinct()
        n_done = done.count()
        pending = df.join(F.broadcast(done), on=keys, how="left_anti")
        batch_id = (man.agg(F.max("batch_id")).collect()[0][0] or 0) + 1
    else:
        n_done = 0
        pending = df
        batch_id = 0

    pending = pending.cache()
    new_man = lineage_rows(pending, keys, job_id, batch_id).cache()
    n_pending = new_man.count()
    rows = 0
    if n_pending:
        # Crash safety: the manifest is written LAST, and the data write uses
        # dynamic partition overwrite so a retry after a crash between the
        # two writes REPLACES the orphaned key partitions instead of
        # appending duplicate rows (exactly-once per key).
        conf = spark.conf
        prev_mode = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (pending.write.mode("overwrite").partitionBy(*keys).parquet(
                os.path.join(out_dir, "data")))
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        rows = new_man.agg(F.sum("n_rows")).collect()[0][0]
        new_man.write.mode("append").parquet(_manifest_dir(out_dir))
    pending.unpersist()
    return {"pending_keys": n_pending, "done_keys": n_done,
            "rows_written": int(rows)}


def verify_manifest(spark: SparkSession, out_dir: str, job_id: str = "job"
                    ) -> DataFrame:
    """Recompute per-key lineage from the written data and join against the
    manifest — rows where counts/checksums disagree indicate corruption
    (empty result = verified)."""
    man = read_manifest(spark, out_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    man = man.filter(F.col("job_id") == job_id)
    keys = [c for c in man.columns
            if c not in ("n_rows", "checksum", "job_id", "batch_id")]
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    actual = lineage_rows(data, keys, job_id)
    return (man.alias("m")
            .join(actual.alias("a"), on=keys, how="full")
            .filter((F.col("m.n_rows") != F.col("a.n_rows"))
                    | (F.col("m.checksum") != F.col("a.checksum"))
                    | F.col("m.n_rows").isNull() | F.col("a.n_rows").isNull())
            .select(*keys))
