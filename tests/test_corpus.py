"""Deterministic scaled-corpus generator (sources/corpus.py) — the
sf>=1 pipeline-bench input. Checks determinism, the planted duplicate
structure the dedup operators rely on, and embedding cluster shape."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.sources import corpus as C


def test_documents_deterministic(spark):
    a = C.documents(spark, 2000).orderBy("doc_id").collect()
    b = C.documents(spark, 2000, partitions=7).orderBy("doc_id").collect()
    assert len(a) == 2000
    assert all(tuple(x) == tuple(y) for x, y in zip(a, b))
    # schema matches the driver testdata documents table
    assert [f.name for f in C.documents(spark, 10).schema.fields] == \
        ["doc_id", "text", "lang", "source", "n_chars"]


def test_documents_duplicate_structure(spark):
    d = C.documents(spark, 5000).cache()
    n = d.count()
    groups = (d.groupBy("text").count().filter("count > 1"))
    n_dup_groups = groups.count()
    n_dup_docs = groups.agg(F.sum("count")).first()[0]
    # ~10% of docs are exact duplicates of an earlier original
    assert 0.04 * n < n_dup_docs - n_dup_groups < 0.2 * n
    # length bounds: 30-150 tokens of the 48-word vocabulary
    sizes = d.select(F.size(F.split("text", " ")).alias("s")) \
        .agg(F.min("s"), F.max("s")).first()
    assert sizes[0] >= 30 and sizes[1] <= 150
    d.unpersist()


def test_near_duplicates_in_lsh_band(spark):
    # near dups mutate ~1/12 of positions: 3-shingle Jaccard against
    # the parent should mostly land in the MinHash sweet spot
    from gdal_spark.operators import dedup as DD
    docs = C.documents(spark, 3000)
    sigs = DD.minhash_signatures(docs, n_hashes=8, shingle_n=3)
    pairs = DD.lsh_candidate_pairs(sigs, n_bands=4, rows_per_band=2)
    jac = DD.ngram_jaccard_pairs(docs, pairs.cache(), shingle_n=3)
    near = jac.filter((F.col("jaccard") >= 0.3) & (F.col("jaccard") < 1.0))
    assert near.count() > 20          # the planted near-dup population


def test_embeddings(spark):
    e = C.embeddings(spark, 3000, dim=32, n_clusters=16).cache()
    assert e.count() == 3000
    r = e.agg(F.max(F.size("embedding")),
              F.min("label"), F.max("label")).first()
    assert (r[0], r[1], r[2]) == (32, 0, 15)
    # same-cluster vectors are closer to each other than cross-cluster
    rows = e.filter(F.col("label").isin(0, 1)).limit(200).collect()
    by_lab = {}
    for row in rows:
        by_lab.setdefault(row["label"], []).append(
            np.array(row["embedding"]))
    a, b = by_lab[0][:20], by_lab[1][:20]
    intra = np.mean([np.linalg.norm(x - y) for x in a for y in a[:5]])
    inter = np.mean([np.linalg.norm(x - y) for x in a for y in b[:5]])
    assert inter > intra
