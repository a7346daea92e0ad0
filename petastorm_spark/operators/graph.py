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
node-sized. With a FIXED iteration count the rank chain is linear
(each table read exactly once), so no per-round materialization is
needed — the whole ladder compiles into ONE lazy plan and ONE job,
with edges and the node table cached because every round re-reads
them. Past ``checkpoint_interval`` rounds the chain is persisted and
cut so plan depth stays bounded for deep iteration counts. A fixed
count (the common production choice) also makes results
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
    checkpoint_interval: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list, ``iters`` power iterations
    from the uniform vector. Output: (node, rank) with rank rounded to
    6 decimals (engine-portable summation). Nodes = src ∪ dst; edges
    are de-duplicated. Dangling nodes (no out-edges) simply contribute
    nothing — feed an undirected (symmetrized) edge list when every
    node should both give and receive (then no mass dangles).

    r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u) / outdeg(u)

    Edge/node caches are dropped on error; after a normal return they
    back the (lazy) result — unpersist via
    ``spark.catalog.clearCache()`` once the result is consumed.
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
    interim: list[DataFrame] = []
    try:
        n = nodes.count()  # the only driver-side action before the result
        if n == 0:
            raise ValueError("pagerank: empty edge list (no nodes)")
        base = (1.0 - damping) / n
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for i in range(iters):
            contrib = (
                ed.join(ranks, ed.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") / F.col("deg")).alias("_in"))
            )
            ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            # the chain is linear (each round read once), so rounds need
            # no cache — only cut plan DEPTH for deep iteration counts
            if (i + 1) % checkpoint_interval == 0 and (i + 1) < iters:
                ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
                interim.append(ranks)
                ranks.count()
        return ranks.select("node", F.round("rank", 6).alias("rank"))
    except Exception:
        ed.unpersist()
        nodes.unpersist()
        for t in interim:
            t.unpersist()
        raise
