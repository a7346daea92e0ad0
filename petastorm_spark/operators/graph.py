"""Iterative graph analytics over DataFrames: PageRank by power
iteration.

Connected components (operators/dedup.py:connected_components) covers
the clustering side; PageRank is the centrality side — used in data
pipelines to rank hosts/documents in a link graph (e.g. harmonic-
centrality or PageRank features in web-corpus quality filters, as in
Common Crawl host-level ranking).

Design for scale: edges are the only large state. Each power
iteration is one equi-join (edges x current ranks, shuffled on the
rank key) plus one partial-aggregated groupBy(dst); ranks are
node-sized, re-persisted per round with the previous round's cache
dropped, so lineage stays flat and no driver state exceeds one count.
A fixed iteration count (the common production choice) makes results
deterministic and lets an external SQL oracle unroll the exact same
ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list, ``iters`` power iterations
    from the uniform vector. Output: (node, rank) with rank rounded to
    6 decimals (engine-portable summation). Nodes = src ∪ dst; edges
    are de-duplicated. Dangling nodes (no out-edges) simply contribute
    nothing — feed an undirected (symmetrized) edge list when every
    node should both give and receive (then no mass dangles).

    r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u) / outdeg(u)

    The returned ranks are node-sized and stay cached (they were
    materialized to cut iteration lineage); unpersist via
    ``spark.catalog.clearCache()`` — or collect and move on — when the
    result has been consumed.
    """
    from pyspark import StorageLevel

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .unionByName(ed.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ranks.count()
    try:
        for _ in range(iters):
            contrib = (
                ed.join(ranks, ed.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("_in"))
            )
            new_ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                    ).alias("rank"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_ranks.count()  # materialize before dropping the old cache
            ranks.unpersist()
            ranks = new_ranks
        return ranks.select("node", F.round("rank", 6).alias("rank"))
    finally:
        ed.unpersist()
        nodes.unpersist()
