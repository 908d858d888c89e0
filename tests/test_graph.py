"""Connected components (operators/graph.py) vs a union-find reference."""

import numpy as np
import pytest

from gdal_spark.operators.graph import connected_components


def uf_components(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min vertex in component
    comp_min = {}
    for v in range(n_vertices):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_vertices)}


def run_cc(spark, n, edges):
    edf = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "src long, dst long")
    vdf = spark.range(n).withColumnRenamed("id", "id")
    got = connected_components(edf, vertices=vdf).collect()
    return {r["id"]: r["component"] for r in got}


def test_random_graph_matches_union_find(spark):
    rng = np.random.RandomState(11)
    n = 300
    edges = [(int(a), int(b))
             for a, b in rng.randint(0, n, size=(200, 2)) if a != b]
    assert run_cc(spark, n, edges) == uf_components(n, edges)


def test_chain_worst_case_diameter(spark):
    # a 200-node path: diameter 199, but star-contraction needs only
    # O(log n) rounds — max_rounds=40 must be plenty
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    got = run_cc(spark, n, edges)
    assert set(got.values()) == {0}
    assert len(got) == n


def test_isolated_vertices_and_self_loops(spark):
    edges = [(1, 1), (2, 3)]
    got = run_cc(spark, 6, edges)
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 4, 5: 5}


def test_two_clusters_and_duplicate_edges(spark):
    edges = [(5, 9), (9, 5), (5, 9), (9, 12), (1, 2), (2, 1)]
    got = run_cc(spark, 13, edges)
    assert got[5] == got[9] == got[12] == 5
    assert got[1] == got[2] == 1
    assert got[0] == 0
