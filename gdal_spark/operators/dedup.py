"""Deduplication operators for web-scale corpora.

- ``exact_dup_groups``      — hash-groupBy exact dedup (one shuffle on the
  content hash; at 10^12 docs the hash is 32 bytes/row vs full text).
- ``minhash_signatures``    — MinHash over word shingles. Hash family =
  md5(salt + shingle) compared lexicographically (strings): deterministic,
  portable, and exactly reproducible in any SQL engine for oracles —
  no engine-specific 64-bit hash needed.
- ``lsh_candidate_pairs``   — banding: split the signature into bands,
  group by (band index, band key); docs sharing any band become candidate
  pairs. Shuffle is on the band key, so near-dup clusters co-locate.
- ``ngram_jaccard_pairs``   — exact shingle-set Jaccard for candidate pairs
  via explode + distinct + count joins (set semantics).
- ``simhash64``             — 64-bit SimHash from md5 nibbles of shingles
  (vectorized pandas UDF; Hamming-distance dedup path).

At 100 TB: signatures are ~n_hashes × 8-byte strings per doc (tiny vs the
text); candidate pairs after banding are a small fraction of n^2, and the
Jaccard verify join only touches candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.functions.text import word_shingles


def exact_dup_groups(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, min_doc_id)."""
    return (
        df.select(F.md5(F.col(text)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def _minhash_col(shingles, salt: int):
    return F.array_min(F.transform(
        shingles, lambda s: F.md5(F.concat(F.lit(f"{salt}:"), s))))


def minhash_signatures(df: DataFrame, text: str = "text", id_col: str = "doc_id",
                       n_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """(id, sig_0..sig_{n-1}) — min md5-hex over shingles per salt.
    Docs with no shingles (shorter than shingle_n words) get null sigs."""
    sh = word_shingles(F.col(text), shingle_n)
    cols = [F.col(id_col)]
    cols += [_minhash_col(sh, j).alias(f"sig_{j}") for j in range(n_hashes)]
    return df.select(*cols)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        n_bands: int = 4, rows_per_band: int = 2) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band."""
    bands = []
    for b in range(n_bands):
        key = F.concat_ws("|", *[F.col(f"sig_{b * rows_per_band + r}")
                                 for r in range(rows_per_band)])
        bands.append(sigs.select(F.col(id_col).alias("_id"), F.lit(b).alias("_band"),
                                 key.alias("_key")).filter(F.col("_key") != ""))
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    a = allb.select(F.col("_id").alias("id_a"), "_band", "_key")
    b_ = allb.select(F.col("_id").alias("id_b"), "_band", "_key")
    return (a.join(b_, on=["_band", "_key"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, text: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3) -> DataFrame:
    """Exact Jaccard over distinct word shingles for the given id pairs.
    Output: (id_a, id_b, inter, size_a, size_b, jaccard)."""
    sh = (df.select(F.col(id_col).alias("_id"),
                    F.explode(F.array_distinct(word_shingles(F.col(text), shingle_n)))
                    .alias("_sh")))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_size"))
    inter = (pairs.join(sh.withColumnRenamed("_id", "id_a"), on="id_a")
             .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "_shb"),
                   on="id_b")
             .filter(F.col("_sh") == F.col("_shb"))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter")))
    out = (pairs.join(inter, on=["id_a", "id_b"], how="left")
           .na.fill({"inter": 0})
           .join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_size", "size_a"),
                 on="id_a")
           .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_size", "size_b"),
                 on="id_b"))
    return out.withColumn(
        "jaccard",
        F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6))


def winnow_fingerprints(df: DataFrame, text: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): k-gram hashes,
    per-window minima, distinct minima = the fingerprint set. All column
    math (md5 → 60-bit int via conv), so oracles reproduce it exactly.
    Output: (id, fp) exploded fingerprint rows."""
    from pyspark.sql import Window as W
    grams = df.select(
        F.col(id_col),
        F.posexplode(word_shingles(F.col(text), k)).alias("_i", "_g"))
    h = F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10).cast("long")
    grams = grams.withColumn("_h", h)
    part = W.partitionBy(id_col)
    win = part.orderBy("_i").rowsBetween(0, window - 1)
    grams = (grams.withColumn("_n", F.count(F.lit(1)).over(part))
             .withColumn("_m", F.min("_h").over(win))
             .filter(F.col("_i") <= F.greatest(F.col("_n") - window, F.lit(0))))
    return grams.select(F.col(id_col), F.col("_m").alias("fp")).distinct()


def simhash64(df: DataFrame, text: str = "text", id_col: str = "doc_id",
              shingle_n: int = 2) -> DataFrame:
    """64-bit SimHash per doc from md5 bit-votes of word shingles —
    vectorized in one Arrow pass (no per-row Python loops over bits)."""
    import hashlib

    base = df.select(F.col(id_col), F.array_distinct(word_shingles(F.col(text), shingle_n)).alias("_sh"))
    schema = f"{id_col} long, simhash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.uint64)
            for i, shingles in enumerate(pdf["_sh"]):
                if shingles is None or len(shingles) == 0:
                    continue
                # vectorized bit votes: unpack md5-first-8-bytes per shingle
                hs = np.frombuffer(
                    b"".join(hashlib.md5(s.encode()).digest()[:8] for s in shingles),
                    dtype=">u8")
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
                # signed! uint64 sums would wrap on negative vote totals
                votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hs)
                out[i] = np.bitwise_or.reduce(
                    (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out.astype(np.int64)})

    return base.mapInPandas(run, schema=schema)
