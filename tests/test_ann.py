"""ANN multi-probe LSH: recall vs the brute-force twin."""

import numpy as np

from gdal_spark.operators import ann as ANN


def _embeddings(spark, n, dim, seed, id_name):
    rng = np.random.RandomState(seed)
    rows = [(i, rng.standard_normal(dim).astype(float).tolist())
            for i in range(n)]
    return spark.createDataFrame(rows, f"{id_name} long, embedding array<double>")


def test_multiprobe_improves_recall(spark):
    """Planted-neighbor data (each query has 10 perturbed copies): the true
    top-5 live in the query's bucket or a Hamming-1 neighbor, so probing
    flipped buckets must recover what single-probe misses."""
    rng = np.random.RandomState(2)
    qvecs = rng.standard_normal((12, 16))
    rows, vid = [], 0
    for qv in qvecs:
        for _ in range(10):                      # 10 near-duplicates per query
            rows.append((vid, (qv + 0.15 * rng.standard_normal(16)).tolist()))
            vid += 1
    for _ in range(180):                         # background noise
        rows.append((vid, rng.standard_normal(16).tolist()))
        vid += 1
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    queries = spark.createDataFrame(
        [(i, qv.tolist()) for i, qv in enumerate(qvecs)],
        "qid long, embedding array<double>").cache()
    truth = {}
    for r in ANN.cosine_topk_bruteforce(queries, data, k=5).collect():
        truth.setdefault(r["qid"], set()).add(r["vec_id"])

    def recall(n_probes):
        got = {}
        res = ANN.cosine_topk_lsh(queries, data, k=5, n_planes=6,
                                  n_probes=n_probes).collect()
        for r in res:
            got.setdefault(r["qid"], set()).add(r["vec_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1, r4, r7 = recall(1), recall(4), recall(7)
    assert r4 >= r1
    assert r7 >= r4
    assert r7 >= 0.6          # 6 extra Hamming-1 probes recover most of top-5
    assert r1 < 1.0           # single-probe genuinely misses some


def test_probe_buckets_shape(spark):
    q = _embeddings(spark, 5, 8, 3, "qid")
    pb = ANN.srp_probe_buckets(q, "qid", "embedding", n_planes=6, n_probes=4)
    rows = pb.collect()
    assert len(rows) == 5 * 4
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], set()).add(r["bucket"])
    # all probes distinct per query (base + 3 distinct bit flips)
    assert all(len(v) == 4 for v in per_q.values())


def test_ivf_structure_and_recall(spark):
    """IVF-flat: every data vector lands in exactly one inverted list;
    4-probe recall@5 on planted-neighbor data beats 1-probe; with
    n_probe = n_centroids the result equals brute force exactly."""
    rng = np.random.RandomState(7)
    qvecs = rng.standard_normal((8, 16))
    rows, vid = [], 0
    for qv in qvecs:
        for _ in range(8):
            rows.append((vid, (qv + 0.12 * rng.standard_normal(16)).tolist()))
            vid += 1
    for _ in range(120):
        rows.append((vid, rng.standard_normal(16).tolist()))
        vid += 1
    data = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    queries = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(qvecs)],
        "qid long, embedding array<double>")

    exact = ANN.cosine_topk_bruteforce(queries, data, k=5)
    truth = {(r.qid, r.vec_id) for r in exact.collect()}

    full = ANN.cosine_topk_ivf(queries, data, k=5, n_centroids=12,
                               n_probe=12)
    assert {(r.qid, r.vec_id) for r in full.collect()} == truth

    r4 = ANN.cosine_topk_ivf(queries, data, k=5, n_centroids=12, n_probe=4)
    hits4 = len({(r.qid, r.vec_id) for r in r4.collect()} & truth)
    r1 = ANN.cosine_topk_ivf(queries, data, k=5, n_centroids=12, n_probe=1)
    hits1 = len({(r.qid, r.vec_id) for r in r1.collect()} & truth)
    assert hits4 >= hits1
    assert hits4 >= int(0.6 * len(truth))


def test_embedding_neardup_pairs(spark):
    """Near-dup pairs: planted duplicates (cos ~ 1) are always found,
    every reported pair truly passes the threshold, ids are ordered,
    and no pair is reported twice."""
    rng = np.random.RandomState(11)
    base = rng.standard_normal((20, 16))
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # plant 5 exact-ish duplicates of vectors 0..4 as ids 100..104
    for i in range(5):
        rows.append((100 + i, (base[i] + 1e-4 * rng.standard_normal(16)).tolist()))
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = ANN.embedding_neardup_pairs(data, threshold=0.95, n_planes=4,
                                      n_bands=3, seed=1).collect()
    got = {(r.id_a, r.id_b) for r in out}
    assert all(a < b for a, b in got)
    assert len(got) == len(out)          # no duplicate pairs across bands
    assert all(r.sim >= 0.95 for r in out)
    # planted pairs are near-identical -> same bucket in every band
    assert {(i, 100 + i) for i in range(5)} <= got
