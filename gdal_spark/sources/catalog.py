"""Table source registry: Iceberg-first with bare-parquet fallback.

The north-rule input is an Iceberg table of Common-Crawl-style pages
(BASELINE.json input_hint). On a cluster with iceberg-spark-runtime on
the classpath this registry reads and writes through the Iceberg
DataSource — ``spark.read.format("iceberg")`` / ``df.writeTo(...)`` —
which provides snapshot isolation, hidden partitioning, and time travel;
the checkpoint manifest (gdal_spark/plans/manifest.py) then records the
committing snapshot id per batch so resume maps onto Iceberg snapshots
instead of raw parquet directories.

The test container ships no Iceberg runtime jar (and no network to fetch
one), so the registry probes the classpath and falls back to the bare
parquet layout the driver's testdata provides. The seam — ``load_table``
/ ``write_table`` / ``table_snapshot`` — is identical either way, and
every engine operator goes through it, so swapping the storage layer is
a ref-string change, not a code change.

Reference analog: GDALOpen's driver registry probing formats in order
(gdal/gcore/gdaldataset.cpp GDALOpenEx) — here the "drivers" are Spark
DataSources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark DataSource is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "iceberg ref given but iceberg-spark-runtime is not on the "
            "classpath; add the runtime jar (spark.jars.packages "
            "org.apache.iceberg:iceberg-spark-runtime-...) or use a "
            "parquet path")


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Open a table by reference.

    - ``iceberg:<catalog.db.table>`` → Iceberg DataSource (snapshot reads;
      pass time-travel options through ``spark.read.format("iceberg")
      .option(...)`` by appending ``@<snapshot-id>``).
    - anything else → parquet path (the sandbox testdata layout).
    """
    if ref.startswith(ICEBERG_PREFIX):
        _require_iceberg(spark)
        name = ref[len(ICEBERG_PREFIX):]
        reader = spark.read.format("iceberg")
        if "@" in name:
            name, snap = name.rsplit("@", 1)
            reader = reader.option("snapshot-id", snap)
        return reader.load(name)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Write a table by reference. Iceberg refs commit one snapshot
    (atomic — the property resumable_write's staged parquet overwrite
    emulates by hand); parquet refs use the plain directory writer."""
    if ref.startswith(ICEBERG_PREFIX):
        _require_iceberg(df.sparkSession)
        name = ref[len(ICEBERG_PREFIX):]
        writer = df.writeTo(name)
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.createOrReplace()
        else:
            raise ValueError(f"unsupported iceberg mode {mode!r}")
        return
    df.write.mode(mode).parquet(ref)


def table_snapshot(spark: SparkSession, ref: str) -> int | None:
    """Current snapshot id of an Iceberg table (None for parquet refs) —
    recorded by resumable writes so a resume can pin the exact input
    version it planned against."""
    if not ref.startswith(ICEBERG_PREFIX):
        return None
    _require_iceberg(spark)
    name = ref[len(ICEBERG_PREFIX):]
    rows = (spark.read.format("iceberg").load(f"{name}.snapshots")
            .orderBy("committed_at", ascending=False).limit(1)
            .select("snapshot_id").collect())
    return int(rows[0][0]) if rows else None
