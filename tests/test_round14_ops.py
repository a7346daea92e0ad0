"""Round-14 operators: IVF-family auto-sizing default (sqrt(N) cells
everywhere, not just knn_graph), write-time dataset manifests, the
curation contract gate, and the l-diversity streaming twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from petastorm_spark.session import arrow_local_df


@pytest.fixture(scope="module")
def corpus400(spark):
    """400 deterministic vectors, dim 8 — big enough that
    auto_n_cells(400) = 20 differs from the old fixed-16 default."""
    rng = np.random.default_rng(14)
    vecs = rng.normal(size=(400, 8)).astype(np.float64)
    return arrow_local_df(
        spark,
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [list(map(float, v)) for v in vecs],
        },
        "vec_id bigint, embedding array<double>",
    )


def test_ivf_build_auto_default_is_sqrt_n(spark, corpus400):
    """n_cells=None (now the DEFAULT) derives auto_n_cells(N) cells —
    the r13 verdict's #4: a fixed 16-cell quantizer is a toy constant
    at corpus scale; sqrt(N) keeps candidate work ~N^1.5."""
    from petastorm_spark.operators.similarity import auto_n_cells, ivf_build

    cent, assigned = ivf_build(corpus400, "vec_id", "embedding")
    assert cent.count() == auto_n_cells(400) == 20
    # every corpus vector assigned exactly once
    assert assigned.count() == 400
    assert assigned.select("cell").distinct().count() <= 20


def test_cosine_topk_ivf_auto_equals_explicit_sqrt_n(spark, corpus400):
    """The auto default must be EXACTLY explicit n_cells=sqrt(N) with
    the same deterministic lowest-id quantizer — auto changes sizing,
    never semantics (oracle queries keep passing explicit n_cells)."""
    from petastorm_spark.operators.similarity import cosine_topk_ivf

    q = corpus400.where(F.col("vec_id") < 8)
    auto = cosine_topk_ivf(corpus400, q, k=3, n_probe=2)
    explicit = cosine_topk_ivf(corpus400, q, k=3, n_cells=20, n_probe=2)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_ivfpq_and_semantic_dedup_auto_defaults(spark, corpus400):
    """ivfpq_build and semantic_dedup (both single- and multi-probe
    branches) inherit the sqrt(N) auto default."""
    from petastorm_spark.operators.similarity import (
        ivfpq_build,
        semantic_dedup,
    )

    cent, _, coded = ivfpq_build(corpus400, dim=8, m=4, k_codes=8)
    assert cent.count() == 20
    assert coded.count() == 400

    both = corpus400.unionByName(
        corpus400.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    )
    # auto sizing: 800 rows -> 29 cells; every synthetic copy must
    # still surface exactly once (copies share their original's cell)
    removed = semantic_dedup(both, "vec_id", "embedding", threshold=0.999)
    assert removed.count() == 400
    removed_mp = semantic_dedup(
        both, "vec_id", "embedding", threshold=0.999, n_probe=2
    )
    assert removed_mp.count() == 400


def test_train_kmeans_auto_default(spark, corpus400):
    """train_kmeans_centroids n_cells=None -> sqrt(N) clusters."""
    pytest.importorskip("pyspark.ml")
    from petastorm_spark.operators.similarity import train_kmeans_centroids

    cent = train_kmeans_centroids(corpus400, seed=3, max_iter=2)
    assert cent.count() == 20
