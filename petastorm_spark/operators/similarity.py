"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (cross join against a
broadcast query set — linear in corpus size, embarrassingly parallel).
The scale path is random-hyperplane LSH bucketing: corpus and queries
hash to sign-pattern buckets; only same-bucket pairs are scored, so the
join is bucket-local instead of all-pairs.

All math is built-in (zip_with/aggregate) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Element-wise dot product of two array columns, computed in
    double (float32 inputs are widened first — keeps engines' sums
    comparable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).
    Output: query_id, neighbor_id, rank, cos_sim.

    Scale: broadcast the (small) query set; corpus scan is a single
    pass; per-query top-k via window over the scored rows. For large
    query sets, swap the window for a groupBy + max_by-heap pattern or
    the LSH variant below."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane LSH: append a ``bucket`` int column — the sign
    pattern of ``n_planes`` fixed random projections. Cosine-similar
    vectors collide with high probability."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates. Recall
    trades off with n_planes; multi-probe (flip one bit) would raise it.
    Scale: the cross join becomes an equi-join on ``bucket`` — shuffle
    instead of broadcast-everything."""
    from pyspark.sql import Window

    cb = hyperplane_buckets(corpus, vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "bucket",
    )
    qb = hyperplane_buckets(queries, vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    scored = (
        cb.join(qb, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 4).alias("cos_sim"))
    )
