"""Regression tests for the round-1 code-review findings."""

import os

import pytest
from pyspark.sql import functions as F

from petastorm_spark.reader import make_reader


def test_user_cache_dir_survives_close_and_is_reused(spark, sf_dir, tmp_path):
    """Finding: close() rmtree'd a user-supplied cache_location."""
    cache = str(tmp_path / "my_cache")
    # force the materialization path with a JVM-only (non-DNF-compilable)
    # Column filter — plain comparisons now compile to DNF and stream
    with make_reader(
        f"{sf_dir}/nation.parquet",
        spark=spark,
        filters=(F.col("n_nationkey") % 100) < 10,
        cache_dir=cache,
    ) as r:
        assert len(list(r)) == 10
    assert os.path.isdir(cache), "user cache dir must survive close()"
    before = sorted(os.listdir(cache))
    # second reader reuses the cache without rewriting
    with make_reader(
        f"{sf_dir}/nation.parquet",
        spark=spark,
        filters=(F.col("n_nationkey") % 100) < 10,
        cache_dir=cache,
    ) as r:
        assert len(list(r)) == 10
    assert sorted(os.listdir(cache)) == before


def test_selector_combined_with_filters(spark, tmp_path):
    """Finding: selector against materialized-cache paths never matched."""
    from petastorm_spark.etl.rowgroup_indexing import (
        SingleFieldIndexer,
        SingleIndexSelector,
        build_rowgroup_index,
    )

    url = str(tmp_path / "selds")
    spark.range(100).select(
        "id", (F.col("id") % 5).alias("b")
    ).repartition(5, "b").write.parquet(url)
    build_rowgroup_index(spark, url, [SingleFieldIndexer("by_b", "b")])
    sel = SingleIndexSelector("by_b", [2])
    with make_reader(
        url, spark=spark, rowgroup_selector=sel, filters=F.col("id") < 50
    ) as r:
        rows = list(r)
    ids = sorted(x.id for x in rows if x.b == 2)
    assert ids == [i for i in range(50) if i % 5 == 2]


def test_ngram_rejects_drop_partitions(spark, sf_dir):
    from petastorm_spark.operators.ngram import NGram

    ng = NGram(fields={0: ["ts"], 1: ["ts"]}, delta_threshold=10, timestamp_field="ts")
    with pytest.raises(ValueError, match="shuffle_row_drop_partitions"):
        make_reader(
            f"{sf_dir}/events.parquet",
            spark=spark,
            schema_fields=ng,
            shuffle_row_drop_partitions=2,
        )


def test_lsh_bands_must_divide(spark):
    from petastorm_spark.operators.dedup import lsh_candidate_pairs

    sig = spark.createDataFrame([(1, 2, 3)], ["doc_id", "mh_0", "mh_1"])
    with pytest.raises(ValueError, match="must divide"):
        lsh_candidate_pairs(sig, "doc_id", num_hashes=16, bands=5)


def test_converter_cache_respects_parent_dir(spark, sf_dir, tmp_path):
    from petastorm_spark.converter import make_spark_converter

    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    c1 = make_spark_converter(df, dtype=None)
    c2 = make_spark_converter(df, dtype=None, parent_cache_dir=str(tmp_path / "p"))
    try:
        assert c1 is not c2
        assert c2.cache_path.startswith(str(tmp_path / "p"))
    finally:
        c1.delete()
        c2.delete()


def test_streaming_value_col_optional(spark, sf_dir):
    from petastorm_spark.streaming.feed import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").drop("value")
    out = windowed_event_counts(ev, window="6 hours")  # must not raise
    assert "n_events" in out.columns and "avg_value" not in out.columns


def test_weighted_sampling_renormalizes(spark, sf_dir, tmp_path):
    """Finding: exhausted readers skewed the mixture toward the first
    survivor. With a dominant small reader that drains early, the
    remaining draws must split ~evenly between the two equal-probability
    survivors (the old code sent nearly all of them to the first)."""
    from petastorm_spark.operators.sampling import WeightedSamplingReader

    small_url = str(tmp_path / "small")
    big = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    big.limit(20).write.parquet(small_url)  # same schema, 20 rows

    shifted_url = str(tmp_path / "shifted")
    big.selectExpr("c_custkey + 1000000 AS c_custkey").write.parquet(shifted_url)

    small = make_reader(small_url, spark=spark)
    b1 = make_reader(
        f"{sf_dir}/customer.parquet", spark=spark, schema_fields=["c_custkey"]
    )
    b2 = make_reader(shifted_url, spark=spark)  # distinguishable values
    with WeightedSamplingReader([small, b1, b2], [0.9, 0.05, 0.05], seed=5) as mixed:
        rows = [r.c_custkey for r in mixed]
    n = big.count()
    assert len(rows) == 20 + 2 * n  # full drain, nothing lost
    # after the dominant small reader drains (early), b1/b2 must
    # interleave ~50/50 — the old first-alive fallback sent ~90% of
    # draws to b1, emitting all of b1 long before b2
    tail = rows[len(rows) // 2 :]
    b1_tail = sum(1 for v in tail if v < 1000000)
    frac = b1_tail / len(tail)
    assert 0.3 < frac < 0.7, frac


def test_weighted_sampling_zero_probability_drains(spark, sf_dir):
    """Zero-probability readers must still drain (uniformly) after the
    weighted ones finish, not crash with NaN probabilities."""
    from petastorm_spark.operators.sampling import WeightedSamplingReader

    r0 = make_reader(f"{sf_dir}/region.parquet", spark=spark)
    r1 = make_reader(f"{sf_dir}/region.parquet", spark=spark)
    with WeightedSamplingReader([r0, r1], [1.0, 0.0], seed=2) as mixed:
        rows = list(mixed)
    assert len(rows) == 10  # both drained, no ValueError


# ---------------------------------------------------------------------------
# round-6 second review pass (prior-session operator range)
# ---------------------------------------------------------------------------


def test_connected_components_string_ids_both_paths(spark):
    from petastorm_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u2", "u3"), ("u5", "u6")], "id_a string, id_b string"
    )
    want = {"u1": ("u1", 3), "u2": ("u1", 3), "u3": ("u1", 3),
            "u5": ("u5", 2), "u6": ("u5", 2)}
    local = {r.doc_id: (r.cluster_id, r.cluster_size)
             for r in connected_components(pairs).collect()}
    dist = {r.doc_id: (r.cluster_id, r.cluster_size)
            for r in connected_components(pairs, local_threshold=0).collect()}
    assert local == dist == want


def test_grouped_rank_keeps_null_groups(spark):
    from pyspark.sql import functions as F

    from petastorm_spark.operators.rank import grouped_rank

    df = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3), ("a", 4)], "g string, v int"
    )
    out = grouped_rank(df, ["g"], ["v"], rank_col="r", count_col="n").collect()
    assert len(out) == 4  # NULL-group rows must survive the offset join
    nulls = sorted((r.v, r.r) for r in out if r.g is None)
    assert nulls == [(2, 1), (3, 2)]


def test_cm_estimate_absent_key_is_zero(spark):
    from petastorm_spark.operators.sketch import cm_estimate, cm_sketch

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "k string")
    sk = cm_sketch(df, "k", w=64, d=3)
    keys = spark.createDataFrame([("a",), ("never_seen_xyz",)], "k string")
    out = {r.k: r.cm_count for r in cm_estimate(sk, keys, "k", w=64, d=3).collect()}
    assert out["a"] >= 5
    assert out["never_seen_xyz"] == 0  # guaranteed-0, not collision noise


def test_excise_preserves_untouched_documents(spark):
    from petastorm_spark.operators.dedup import excise_dup_spans

    boiler = "click here to subscribe now"
    rows = [(i, f"w{i}a  w{i}b\tMixedCASE{i} w{i}c w{i}d") for i in range(3)]
    rows += [(10 + i, f"{boiler} body text {i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in excise_dup_spans(
        df, "text", "doc_id", k=4, min_count=3).collect()}
    for i in range(3):
        assert out[i].n_tokens_removed == 0
        # untouched docs keep original casing and whitespace verbatim
        assert out[i].cleaned_text == f"w{i}a  w{i}b\tMixedCASE{i} w{i}c w{i}d"
    assert out[10].n_tokens_removed >= 4  # the boilerplate span went


def test_length_bucketed_loader_keeps_float_dtype():
    import numpy as np

    from petastorm_spark.bridges.torch import LengthBucketedLoader

    rows = [
        {"feat": np.array([0.12, 0.87, 0.5], dtype=np.float32)},
        {"feat": np.array([0.99], dtype=np.float32)},
    ]
    loader = LengthBucketedLoader(iter(rows), length_field="feat",
                                  batch_size=2, boundaries=[4])
    batch = next(iter(loader))
    feat = np.asarray(batch["feat"])
    assert feat.dtype.kind == "f"
    assert abs(float(feat[0][1]) - 0.87) < 1e-6  # not truncated to 0
