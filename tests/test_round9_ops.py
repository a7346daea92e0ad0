"""Round-9 regression tests: vectorized IVF/SemDeDup assignment.

The assignment stage moved to one Arrow-batched numpy pass
(similarity._probe_cells_numpy) after profiling showed every Catalyst
formulation of the n x n_cells cosine stage losing by 1-2 orders of
magnitude (BroadcastNestedLoopJoin disables codegen; HOF folds are
interpreted; unrolled chains blow the JIT method-size limit). These
tests pin the two things that change could break:

1. row-for-row agreement with the Catalyst fold formulation (same
   argmax, same top-n_probe sets, same tie-breaks) on the real fixture;
2. the float-safety margin: numpy's pairwise summation may differ from
   an engine's sequential fold by ~1 ulp, which could only flip a cell
   choice if two DISTINCT cells' cosines tie within ~1e-15 at the probe
   boundary — measure the fixture's actual minimal boundary gap and
   assert it is orders of magnitude wider.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

COPY_SHIFT = 100_000


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return emb.unionByName(
        emb.select((F.col("vec_id") + COPY_SHIFT).alias("vec_id"), "embedding")
    )


def _catalyst_probe(corpus, cent, n_probe):
    """The reference formulation: interpreted fold cosines + window."""
    from pyspark.sql import Window

    from petastorm_spark.operators.similarity import cosine

    scored = (
        corpus.crossJoin(F.broadcast(cent))
        .withColumn("_cos", cosine(F.col("embedding"), F.col("cent_vec")))
        .select("vec_id", "_cos", "cell")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), "cell")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_probe)
        .groupBy("vec_id")
        .agg(F.sort_array(F.collect_list("cell")).alias("_cells"))
    )


@pytest.mark.parametrize("n_cells,n_probe", [(16, 1), (64, 2)])
def test_numpy_assignment_matches_catalyst(spark, corpus, n_cells, n_probe):
    from petastorm_spark.operators.similarity import _probe_cells_numpy

    cent = (
        corpus.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cent_vec"))
    )
    crows = cent.collect()
    got = {
        r.vec_id: tuple(r._cells)
        for r in _probe_cells_numpy(
            corpus, crows, "vec_id", "embedding", n_probe
        ).collect()
    }
    want = {
        r.vec_id: tuple(r._cells)
        for r in _catalyst_probe(corpus, cent, n_probe).collect()
    }
    assert got == want and len(got) == corpus.count()


@pytest.mark.parametrize("n_cells,n_probe", [(16, 1), (64, 2)])
def test_probe_boundary_margin_dwarfs_float_drift(corpus, n_cells, n_probe):
    """min over vectors of (cos at probe rank n) - (cos at rank n+1),
    excluding EXACT ties (which every summation order agrees on and the
    cell-ascending tie-break resolves identically everywhere). A
    summation-order flip needs a gap ~1e-15; require 9 orders of
    magnitude of headroom."""
    rows = corpus.collect()
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    C = V[np.argsort(ids)[:n_cells]]  # the lowest-id default quantizer
    cos = (V @ C.T) / (
        np.linalg.norm(V, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
    )
    s = -np.sort(-cos, axis=1)  # descending scores per row
    gaps = s[:, n_probe - 1] - s[:, n_probe]
    nonzero = gaps[gaps > 0]
    assert nonzero.size, "degenerate fixture: all boundary scores tied"
    assert nonzero.min() > 1e-6, (
        f"probe boundary gap {nonzero.min():.2e} too small — summation-"
        "order drift between engines could flip a cell assignment"
    )


def test_semantic_dedup_synthetic_copies_all_removed(spark, corpus):
    """Every shifted copy has its original at cosine 1.0 in its own
    cell, so exactly the copy half must be removed with max_cos 1.0."""
    from petastorm_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        corpus, "vec_id", "embedding", n_cells=16, threshold=0.95
    ).collect()
    removed = {r.removed_id for r in out}
    n = corpus.count() // 2
    assert removed >= {i + COPY_SHIFT for i in range(0, n, 7)}  # spot set
    assert all(r.max_cos == 1.0 or r.max_cos > 0.95 for r in out)
    assert len(removed) == n
