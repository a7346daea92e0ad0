"""Tests for the round-6 second-session additions: semantic dedup
(SemDeDup), hash-feature quality classifier, distributed BPE-merge
learning, dataset version diff."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


def _emb_fixture(spark):
    # 2-D vectors, n_cells=2 -> centroids are id 0 ([1,0]) and id 1
    # ([0,1]); ids 2/5 are near-dups of the x-axis, 3 of the y-axis,
    # 4 is kept (no neighbor >= 0.95 in its cell), 6/7 straddle the
    # 45-degree cell boundary at cos 0.995 -- semantically near-dup but
    # in DIFFERENT cells, so cluster-scoped dedup must NOT see them.
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0]),
        Row(vec_id=2, embedding=[1.0, 0.01]),
        Row(vec_id=3, embedding=[0.02, 1.0]),
        Row(vec_id=4, embedding=[0.93, 0.37]),
        Row(vec_id=5, embedding=[0.99, 0.012]),
        Row(vec_id=6, embedding=[0.74, 0.67]),
        Row(vec_id=7, embedding=[0.67, 0.74]),
    ]
    return spark.createDataFrame(rows)


def test_semantic_dedup_removes_within_cell_neighbors(spark):
    from petastorm_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        _emb_fixture(spark), "vec_id", "embedding", n_cells=2, threshold=0.95
    ).collect()
    got = {r.removed_id: (r.witness_id, r.n_witnesses) for r in out}
    assert got == {2: (0, 1), 3: (1, 1), 5: (0, 2)}
    for r in out:
        assert r.max_cos >= 0.95


def test_semantic_dedup_is_cell_scoped(spark):
    # 6 and 7 are cosine 0.995 apart but assigned to different cells:
    # the pair is invisible by design (SemDeDup's tractability trade).
    from petastorm_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        _emb_fixture(spark), "vec_id", "embedding", n_cells=2, threshold=0.95
    ).collect()
    assert 7 not in {r.removed_id for r in out}


def test_semantic_dedup_custom_centroids(spark):
    # With ONE cell everything is comparable: 7 joins the removed set
    # (witness 6), and boundary-blindness disappears.
    from petastorm_spark.operators.similarity import semantic_dedup

    cent = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 1.0])])
    out = semantic_dedup(
        _emb_fixture(spark),
        "vec_id",
        "embedding",
        threshold=0.95,
        centroids=cent,
    ).collect()
    got = {r.removed_id for r in out}
    assert 7 in got
