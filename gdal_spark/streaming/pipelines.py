"""Structured Streaming twins of the engine's batch operators.

The reference is a batch library (SURVEY.md §2.10 — GDAL has no streaming
model; its nearest concepts are windowed reads and gdal2tiles --resume).
These pipelines are the capability upgrade the north rule's operational
requirements imply: the same tile-assignment / windowed-aggregation logic
expressed over an unbounded pages/events stream with event-time windows,
watermarks for late data, and checkpointed exactly-once sinks.

Each builder takes a streaming DataFrame (``spark.readStream...``) and
returns the transformed streaming DataFrame; the caller owns the sink.
All transformations are the *same column expressions* as the batch path —
tile math stays zero-UDF, so a 10^12-row backfill and the live stream run
identical logic (kappa-style).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions import tiles


def stream_tile_counts(points: DataFrame, zoom: int,
                       ts: str = "warc_ts",
                       watermark: str = "10 minutes",
                       window: str = "1 hour") -> DataFrame:
    """Per (event-time window, tile) point counts over a point stream —
    the streaming twin of operators.tiling.tile_counts. Late rows beyond
    the watermark are dropped; state is bounded by watermark horizon ×
    active tiles."""
    df = tiles.with_tile_columns(points, zoom=zoom)
    df = df.withColumn(ts, F.col(ts).cast("timestamp"))  # NTZ → event-time
    return (df.withWatermark(ts, watermark)
            .groupBy(F.window(F.col(ts), window).alias("w"), "tx", "ty")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "tx", "ty", "n"))


def stream_event_window(events: DataFrame,
                        ts: str = "ts",
                        watermark: str = "30 minutes",
                        window: str = "1 hour") -> DataFrame:
    """Streaming twin of queries.q_event_window (tumbling window agg)."""
    vdec = F.col("value").cast("decimal(18,2)")
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (events.withWatermark(ts, watermark)
            .groupBy(F.window(F.col(ts), window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(vdec).cast("double").alias("sum_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("win_start"),
                    "event_type", "n", "sum_value"))


def stream_sessionize(events: DataFrame,
                      ts: str = "ts",
                      watermark: str = "30 minutes",
                      gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user via the built-in session_window
    (state-store backed; the streaming twin of queries.q_sessionize)."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (events.withWatermark(ts, watermark)
            .groupBy(F.session_window(F.col(ts), gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("sess_start"),
                    F.col("w.end").alias("sess_end"), "n_events"))


def run_available_now(stream_df: DataFrame, checkpoint: str,
                      out_table: str = "stream_out",
                      output_mode: str = "append"):
    """Drain all currently-available input through the streaming engine into
    an in-memory sink and stop — the deterministic test/backfill harness
    (Trigger.AvailableNow + checkpoint = resumable exactly-once)."""
    q = (stream_df.writeStream.format("memory")
         .queryName(out_table)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def stream_dedup_first_seen(docs: DataFrame, text: str = "text",
                            id_col: str = "doc_id",
                            n_buckets: int = 64) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): exact
    first-seen dedup of a document stream ACROSS micro-batches — the
    streaming twin of operators.dedup.exact_dup_groups, for dedup-at-
    ingest of a rolling crawl.

    Content hashes (JVM xxhash64, no Python in the hash path) shard into
    ``n_buckets`` state groups; each group's state is its set of seen
    hashes, so the per-group state row stays small and the shuffle key is
    the bucket, not the hash. Within a batch pandas ``drop_duplicates``
    keeps the first occurrence (stream order within the group); a row is
    emitted iff its hash is new to both the batch and the state. At
    production scale the state set would be bounded with a TTL timeout
    (state.setTimeoutDuration) or an RVQ sketch; unbounded here because
    the tests drain finite streams.

    Output: (id_col, content_hash) of first occurrences only."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = (docs.withColumn("_h", F.xxhash64(F.col(text)))
              .withColumn("_b", F.pmod(F.col("_h"),
                                       F.lit(n_buckets)).cast("int"))
              .select("_b", F.col(id_col), "_h"))

    def fn(key, pdfs, state):
        import pandas as pd  # noqa: F401 (worker-side import)
        seen = set(state.get[0]) if state.exists else set()
        outs = []
        for pdf in pdfs:
            pdf = pdf.drop_duplicates(subset=["_h"], keep="first")
            fresh = pdf[~pdf["_h"].isin(seen)]
            if len(fresh):
                outs.append(fresh[[id_col, "_h"]])
                seen.update(int(h) for h in fresh["_h"])
        state.update((sorted(seen),))
        for o in outs:
            yield o.rename(columns={"_h": "content_hash"})

    return hashed.groupBy("_b").applyInPandasWithState(
        fn, f"{id_col} long, content_hash long", "seen array<bigint>",
        "append", GroupStateTimeout.NoTimeout)
