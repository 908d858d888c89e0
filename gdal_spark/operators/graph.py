"""Distributed connected components — the clustering stage of the
near-dup dedup pipeline (LSH candidate pairs -> duplicate clusters ->
one representative per cluster).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014 — public paper; re-derived here as DataFrame
ops). Each round is two narrow shuffle stages (a groupBy-min over the
symmetrized edge list and an equi-join back); the edge set contracts
monotonically and the paper proves O(log n) rounds to the fixpoint,
where every component is a star rooted at its minimum vertex id. That
is the 100-TB-safe shape: no per-vertex driver state, no collect — the
only per-round action is a count+checksum convergence probe on the
(shrinking) edge list.

The reference (GDAL) has no graph stage; this serves SURVEY.md's
LLM-pipeline family (dedup clustering over the Common-Crawl-style
documents table). GDAL's nearest analog is the two-phase connected-
component labeling inside polygonize (gdal/alg/polygonize.cpp), which
raster/polygonize.py implements for the raster case; this operator is
the general graph case.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set as (u < v) pairs, loops dropped."""
    return (e.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"))
            .distinct())


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _neighborhood_min(sym: DataFrame) -> DataFrame:
    """m(u) = min(Gamma(u) ∪ {u}) — one map-side-combinable shuffle."""
    return (sym.groupBy("u").agg(F.min("v").alias("_nbr"))
            .select("u", F.least("u", "_nbr").alias("m")))


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u)."""
    sym = _symmetrize(e)
    j = sym.join(_neighborhood_min(sym), "u")
    out = (j.filter(F.col("v") > F.col("u"))
           .select(F.col("v").alias("u"), F.col("m").alias("v")))
    return _canonical(out)


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every not-larger neighbor of u, and u itself, to m(u)."""
    sym = _symmetrize(e)
    j = sym.join(_neighborhood_min(sym), "u")
    out = (j.filter(F.col("v") <= F.col("u"))
           .select(F.col("v").alias("u"), F.col("m").alias("v"))
           .union(j.select("u", F.col("m").alias("v"))))
    return _canonical(out)


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         vertices: Optional[DataFrame] = None,
                         id_col: str = "id",
                         max_rounds: int = 40) -> DataFrame:
    """Label every vertex with its component's minimum vertex id.

    ``edges``: any (src, dst) pair DataFrame (direction ignored).
    ``vertices``: optional vertex universe — isolated vertices (no
    edges) come back labeled with themselves; without it only vertices
    that appear in ``edges`` are labeled.

    Returns (id, component) with component = min id in the component.
    """
    # localCheckpoint per round: an iterative DataFrame loop nests each
    # round's logical plan inside the next (cache truncates recompute, NOT
    # analysis), so without truncation Catalyst re-analyzes an
    # exponentially deeper plan every round. Eager localCheckpoint cuts
    # the lineage to a leaf — the standard iterative-algorithm shape.
    e = _canonical(edges.select(F.col(src).alias("u"),
                                F.col(dst).alias("v")))
    e = e.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        # lazy checkpoint: the convergence agg below is the action that
        # materializes it, so each round runs exactly ONE job (the r3
        # eager+agg pair was two)
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # Checksum in decimal(38,0): sum of 64-bit hashes overflows
        # long (ANSI mode raises); decimal is exact at any edge count.
        sig = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                       F.lit(0).cast("decimal(38,0)")).alias("h")
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        e.unpersist()
        e = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in "
                           f"{max_rounds} rounds")

    # Fixpoint edges form stars (root=u < leaf=v): leaves + roots.
    labels = (e.select(F.col("v").alias(id_col),
                       F.col("u").alias("component"))
              .union(e.select(F.col("u").alias(id_col),
                              F.col("u").alias("component")).distinct()))
    if vertices is not None:
        iso = (vertices.select(F.col(id_col))
               .join(labels, id_col, "left_anti")
               .select(F.col(id_col), F.col(id_col).alias("component")))
        labels = labels.union(iso)
    return labels.distinct()
