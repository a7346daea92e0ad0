"""Round-7 operator tests: triangle census."""
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from petastorm_spark.session import get_spark

    return get_spark("round7-tests")


def _census(spark, edge_list):
    from petastorm_spark.operators.graph import triangle_census

    e = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    return triangle_census(e).collect()[0]


def test_triangle_census_k4(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, each node deg 3 ->
    # 4 * C(3,2) = 12 wedges, clustering = 3*4/12 = 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _census(spark, k4)
    assert (r.n_triangles, r.n_wedges, r.clustering_coeff) == (4, 12, 1.0)


def test_triangle_census_path_has_no_triangles(spark):
    r = _census(spark, [(1, 2), (2, 3), (3, 4)])
    assert r.n_triangles == 0
    assert r.n_wedges == 2
    assert r.clustering_coeff == 0.0


def test_triangle_census_canonicalizes_multigraph_input(spark):
    # duplicates, reversed orientation, and self-loops collapse to one
    # triangle
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    r = _census(spark, messy)
    assert r.n_triangles == 1
    assert r.n_wedges == 3
    assert r.clustering_coeff == 1.0


def test_triangle_census_hub_counts_once_per_triangle(spark):
    # star + one rim edge: hub 0 connects to 1..5, rim edge (1,2)
    # closes exactly one triangle; degree orientation must not
    # double-count it from different pivots
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    r = _census(spark, star)
    assert r.n_triangles == 1
    # hub deg 5 -> 10 wedges, nodes 1,2 deg 2 -> 1 each
    assert r.n_wedges == 12


def test_triangle_census_empty_graph(spark):
    from petastorm_spark.operators.graph import triangle_census

    e = spark.createDataFrame([], "src bigint, dst bigint")
    r = triangle_census(e).collect()[0]
    assert (r.n_triangles, r.n_wedges, r.clustering_coeff) == (0, 0, 0.0)


# ---------------------------------------------------------------------------
# kcore_decompose
# ---------------------------------------------------------------------------


def test_kcore_keeps_k4_peels_chain(spark):
    from petastorm_spark.operators.graph import kcore_decompose

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13)]
    e = spark.createDataFrame(k4 + chain, "src bigint, dst bigint")
    out = {r.node: r.deg for r in kcore_decompose(e, k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_peeling_cascades_across_rounds(spark):
    # path a-b-c-d under k=2: endpoints peel first, then the middle
    # unravels - requires MULTIPLE rounds, not one degree filter
    from petastorm_spark.operators.graph import kcore_decompose

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    assert kcore_decompose(e, k=2, max_rounds=5).collect() == []


def test_kcore_respects_max_rounds(spark):
    # one round of the same path only removes the endpoints' edges
    from petastorm_spark.operators.graph import kcore_decompose

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    one = {r.node for r in kcore_decompose(e, k=2, max_rounds=1).collect()}
    assert one == {2, 3}


def test_kcore_rejects_bad_k(spark):
    from petastorm_spark.operators.graph import kcore_decompose

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="k must be"):
        kcore_decompose(e, k=0)


# ---------------------------------------------------------------------------
# project_embeddings / embedding_centroids
# ---------------------------------------------------------------------------


def test_project_embeddings_deterministic_and_jl_shaped(spark):
    import numpy as np
    from petastorm_spark.operators.similarity import project_embeddings

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = project_embeddings(df, out_dim=8, dim=64, seed=7)
    a = {r.vec_id: r.projected for r in out.collect()}
    b = {r.vec_id: r.projected for r in
         project_embeddings(df, out_dim=8, dim=64, seed=7).collect()}
    assert a == b  # same seed -> bit-identical
    # JL: norms preserved in expectation (loose band, 200 vectors)
    ratios = []
    for i, vec in rows:
        ratios.append(
            float(np.linalg.norm(a[i])) / float(np.linalg.norm(vec))
        )
    m = sum(ratios) / len(ratios)
    assert 0.8 < m < 1.2
    # different seed -> different projection
    c = {r.vec_id: r.projected for r in
         project_embeddings(df, out_dim=8, dim=64, seed=8).collect()}
    assert a != c


def test_embedding_centroids_exact_small(spark):
    from petastorm_spark.operators.similarity import embedding_centroids

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("b", [10.0, 0.0])],
        "src string, embedding array<double>",
    )
    out = {r.src: (r.n_vecs, r.centroid)
           for r in embedding_centroids(df, "src").collect()}
    assert out["a"] == (2, [2.0, 3.0])
    assert out["b"] == (1, [10.0, 0.0])


# ---------------------------------------------------------------------------
# zipf_fit / degree_assortativity
# ---------------------------------------------------------------------------


def test_zipf_fit_recovers_power_law_slope(spark):
    from petastorm_spark.operators.text import zipf_fit

    # freq(rank r) = 1000 // r is Zipf s=1; build a corpus realizing it
    words = []
    for r in range(1, 21):
        words.extend([f"w{r:02d}"] * (1000 // r))
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_fit(df, "text", top_n=20).collect()[0]
    assert row.n_tokens_fit == 20
    assert -1.1 < row.zipf_slope < -0.9
    assert row.r2 > 0.99


def test_zipf_fit_flat_corpus_slope_zero(spark):
    from petastorm_spark.operators.text import zipf_fit

    df = spark.createDataFrame(
        [(" ".join(f"t{i}" for i in range(50)),)], "text string"
    )
    row = zipf_fit(df, "text", top_n=50).collect()[0]
    assert row.zipf_slope == 0.0  # every freq == 1
    assert row.r2 is None  # zero frequency variance -> fit undefined


def test_assortativity_star_is_minus_one(spark):
    from petastorm_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src bigint, dst bigint"
    )
    row = degree_assortativity(star).collect()[0]
    assert row.n_edges == 3
    assert row.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark):
    from petastorm_spark.operators.graph import degree_assortativity

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src bigint, dst bigint",
    )
    row = degree_assortativity(k4).collect()[0]
    assert row.n_edges == 6
    assert row.assortativity is None  # zero degree variance


# ---------------------------------------------------------------------------
# personalized pagerank
# ---------------------------------------------------------------------------


def test_personalized_pagerank_mass_stays_near_seeds(spark):
    from petastorm_spark.operators.graph import pagerank

    # two disconnected triangles; seeding in one leaves the other at 0
    tri1 = [(1, 2), (2, 3), (3, 1)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(
        tri1 + tri2 + [(b, a) for a, b in tri1 + tri2],
        "src bigint, dst bigint",
    )
    ranks = {r.node: r.rank for r in pagerank(e, seeds=[1]).collect()}
    assert ranks[10] == ranks[11] == ranks[12] == 0.0
    assert ranks[1] > ranks[2] > 0  # seed holds the most mass
    assert abs(sum(ranks.values()) - 1.0) < 1e-4  # mass conserved


def test_personalized_pagerank_uniform_seeds_equals_classic(spark):
    from petastorm_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)],
        "src bigint, dst bigint",
    )
    classic = {r.node: r.rank for r in pagerank(e).collect()}
    seeded = {r.node: r.rank for r in pagerank(e, seeds=[1, 2, 3]).collect()}
    assert classic == seeded  # all-nodes seed set IS the uniform restart


def test_personalized_pagerank_rejects_empty_seed_list(spark):
    from petastorm_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="seeds must be non-empty"):
        pagerank(e, seeds=[])


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def test_label_propagation_splits_two_cliques(spark):
    from petastorm_spark.operators.graph import label_propagation

    # two K4 cliques joined by ONE bridge edge: LPA keeps them as two
    # communities (CC would merge them into one component)
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    e = spark.createDataFrame(c1 + c2 + bridge, "src bigint, dst bigint")
    out = {r.node: r.label for r in label_propagation(e, rounds=3).collect()}
    left = {out[n] for n in range(4)}
    right = {out[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_label_propagation_deterministic_tiebreak(spark):
    from petastorm_spark.operators.graph import label_propagation

    # single edge: after round 1 both nodes hold the SMALLEST label
    e = spark.createDataFrame([(2, 1)], "src bigint, dst bigint")
    out = {r.node: r.label for r in label_propagation(e, rounds=1).collect()}
    assert out == {1: 2, 2: 1}  # each adopts its only neighbor's label
    out2 = {r.node: r.label for r in label_propagation(e, rounds=2).collect()}
    assert out2 == {1: 1, 2: 2}  # labels swap back (sync oscillation)


def test_label_propagation_rejects_bad_rounds(spark):
    from petastorm_spark.operators.graph import label_propagation

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="rounds must be"):
        label_propagation(e, rounds=0)


# ---------------------------------------------------------------------------
# log2_histogram / histogram_quantiles
# ---------------------------------------------------------------------------


def test_log2_histogram_buckets_and_bounds(spark):
    from petastorm_spark.operators.sketch import log2_histogram

    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 7, 8, 12, 100, 1000, 0, -5]], "v bigint"
    )
    h = {(r.p, r.m): (r.cnt, r.lower) for r in
         log2_histogram(df, "v").collect()}
    # values < sub-bit range get exact buckets; 0 and -5 are dropped
    assert h[(0, 1)] == (1, 1)
    assert h[(1, 2)] == (1, 2)
    assert h[(1, 3)] == (1, 3)
    assert h[(2, 7)] == (1, 7)
    assert h[(3, 8)] == (1, 8)
    assert h[(3, 12)] == (1, 12)
    # 100 = 0b1100100: p=6, m = 100 >> 3 = 12, lower = 96 <= 100
    assert h[(6, 12)] == (1, 96)
    assert sum(c for c, _ in h.values()) == 8


def test_histogram_quantiles_bounded_relative_error(spark):
    from petastorm_spark.operators.sketch import (
        histogram_quantiles,
        log2_histogram,
    )

    vals = list(range(1, 2001))
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    h = log2_histogram(df, "v")
    row = histogram_quantiles(h, probs_pct=[50, 90, 99]).collect()[0]
    assert row.n_values == 2000
    for pct, got in ((50, row.p50), (90, row.p90), (99, row.p99)):
        true = vals[int(len(vals) * pct / 100) - 1]
        assert got <= true  # lower-bound estimator never overshoots
        assert got >= true * 0.875 * 0.99  # <= 12.5% relative width


def test_log2_histogram_merges_by_count_sum(spark):
    from pyspark.sql import functions as F
    from petastorm_spark.operators.sketch import log2_histogram

    a = spark.createDataFrame([(v,) for v in range(1, 101)], "v bigint")
    b = spark.createDataFrame([(v,) for v in range(50, 201)], "v bigint")
    ha, hb = log2_histogram(a, "v"), log2_histogram(b, "v")
    merged = (
        ha.unionByName(hb)
        .groupBy("p", "m", "lower")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = log2_histogram(a.unionByName(b), "v")
    assert {(r.p, r.m, r.cnt, r.lower) for r in merged.collect()} == {
        (r.p, r.m, r.cnt, r.lower) for r in direct.collect()
    }


def test_log2_histogram_stream_matches_batch(spark, tmp_path_factory):
    from petastorm_spark.operators.sketch import log2_histogram
    from petastorm_spark.streaming.feed import (
        log2_histogram_stream,
        stream_dataset,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "n_chars")
    d = str(tmp_path_factory.mktemp("l2h") / "docs")
    docs.coalesce(1).write.parquet(d)
    q = (
        log2_histogram_stream(stream_dataset(spark, d), "n_chars", ["source"])
        .writeStream.format("memory")
        .queryName("l2h_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.source, r.p, r.m): (r.cnt, r.lower)
        for r in spark.table("l2h_out").collect()
    }
    want = {
        (r.source, r.p, r.m): (r.cnt, r.lower)
        for r in log2_histogram(docs, "n_chars", ["source"]).collect()
    }
    assert got == want and len(want) > 0


def test_attribution_stream_custom_id_columns(spark, tmp_path_factory):
    # round-6 advice: streams whose id column isn't named event_id must
    # work via left_id_col / right_id_col
    from pyspark.sql import functions as F
    from petastorm_spark.streaming.feed import (
        attribution_stream,
        stream_dataset,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    renamed = ev.withColumnRenamed("event_id", "evt")
    d = str(tmp_path_factory.mktemp("attr7") / "events")
    renamed.coalesce(1).write.parquet(d)
    s = stream_dataset(spark, d)
    q = (
        attribution_stream(
            s.where(F.col("event_type") == "click"),
            s.where(F.col("event_type") == "purchase"),
            window="30 minutes",
            watermark="2 hours",
            left_id_col="evt",
            right_id_col="evt",
        )
        .writeStream.format("memory")
        .queryName("attr7_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("attr7_out").collect()
    assert len(rows) > 0
    assert {"left_id", "right_id"} <= set(spark.table("attr7_out").columns)


def test_incremental_near_dup_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """The streaming gate (per-row map signatures + stream-static
    bucket join) must reproduce the batch incremental_near_dup pair
    set AND estimates exactly — the per-row array_min(transform(...))
    signature formulation has to be bit-identical to the batch
    explode+groupBy signatures for this to hold."""
    from petastorm_spark.operators.dedup import (
        incremental_near_dup,
        lsh_index_build,
    )
    from petastorm_spark.streaming.feed import (
        incremental_near_dup_stream,
        stream_dataset,
    )

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = corpus.select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat("text", F.lit(" tail drift tokens")).alias("text"),
    )
    buckets, sigs = lsh_index_build(corpus, "text", "doc_id")

    expected = {
        (r.new_id, r.old_id): r.est_jaccard
        for r in incremental_near_dup(
            batch, buckets, sigs, "text", "doc_id", min_est=0.5
        ).collect()
    }

    d = str(tmp_path_factory.mktemp("incr") / "docs")
    batch.coalesce(1).write.parquet(d)
    q = (
        incremental_near_dup_stream(
            stream_dataset(spark, d).select("doc_id", "text"),
            buckets, sigs, "text", "doc_id", min_est=0.5,
        )
        .writeStream.format("memory")
        .queryName("incr_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.new_id, r.old_id): r.est_jaccard
        for r in spark.sql("SELECT * FROM incr_out").collect()
    }
    assert got == expected and got
