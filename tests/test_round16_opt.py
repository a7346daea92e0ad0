"""Round-16 optimization pins: expensive shared subtrees feeding
self-joins execute ONCE. The r16 plan audit measured the fingerprint
pipeline executing up to 8x per banded-pair query (16 parquet scans /
16 MapInPandas in audio_dup_pairs) because a broadcast build side is
its own subtree — exchange reuse never applies to it. The fix pins
those self-joins to shuffle_hash (the embedding_near_dup_pairs
pattern): both sides hash on the same key over the same subtree, so
the executed plan carries a ReusedExchange and the fingerprint
pipeline runs once. (An A/B also rejected persist() for these sites:
cache write + un-coalesced cached partitions cost more than they
save at bench scale — see OPTIMIZATION_r16.md.) knn_graph's two
consumers need DIFFERENT projections of the probe pass, so there the
cut is a registered persist, pinned via InMemoryTableScan.

The ReusedExchange node only appears in the FINAL adaptive plan, so
each test executes the frame before reading the plan.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from petastorm_spark.session import arrow_local_df, release_persisted


def _final_plan(df) -> str:
    df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    release_persisted()


def test_simhash_pair_candidates_reuses_bucket_exchange(spark):
    from petastorm_spark.operators.dedup import simhash_dup_pairs

    docs = arrow_local_df(
        spark,
        {
            "doc_id": list(range(6)),
            "text": [
                "alpha beta gamma delta", "alpha beta gamma delta",
                "epsilon zeta eta theta", "epsilon zeta eta theta",
                "iota kappa lambda mu", "totally different words here",
            ],
        },
        "doc_id bigint, text string",
    )
    out = simhash_dup_pairs(docs, "text", "doc_id", bits=60, bands=4)
    plan = _final_plan(out)
    assert "ReusedExchange" in plan and "ShuffledHashJoin" in plan, (
        "banded self-join no longer shares one exchange across its "
        "sides:\n" + plan
    )
    assert "BroadcastHashJoin" not in plan, (
        "a broadcast build side re-executes the fingerprint pipeline:\n"
        + plan
    )
    rows = {(r.id_a, r.id_b) for r in out.collect()}
    # identical texts share the fingerprint -> hamming 0 pairs
    assert (0, 1) in rows and (2, 3) in rows


def test_lsh_candidate_pairs_reuses_bucket_exchange(spark):
    from petastorm_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = arrow_local_df(
        spark,
        {
            "doc_id": [1, 2, 3],
            "text": [
                "one two three four five six",
                "one two three four five six",
                "seven eight nine ten eleven twelve",
            ],
        },
        "doc_id bigint, text string",
    )
    sig = minhash_signatures(docs, "text", "doc_id", num_hashes=16)
    out = lsh_candidate_pairs(sig, "doc_id", num_hashes=16, bands=4)
    plan = _final_plan(out)
    assert "ReusedExchange" in plan and "ShuffledHashJoin" in plan, (
        "LSH self-join no longer shares one exchange across its "
        "sides:\n" + plan
    )
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}


def test_winnowing_single_exchange_and_window_df_cap(spark):
    from petastorm_spark.operators.dedup import winnowing_matches

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = arrow_local_df(
        spark,
        {"doc_id": [1, 2, 3], "text": [text, text, "unrelated words only"]},
        "doc_id bigint, text string",
    )
    out = winnowing_matches(docs, "text", "doc_id", min_shared=1, max_df=10)
    plan = _final_plan(out)
    assert "ReusedExchange" in plan and "ShuffledHashJoin" in plan, (
        "winnowing pair join no longer shares the selection exchange:\n"
        + plan
    )
    rows = {(r.id_a, r.id_b) for r in out.collect()}
    assert rows == {(1, 2)}


def test_winnowing_df_cap_still_drops_hot_fingerprints(spark):
    from petastorm_spark.operators.dedup import winnowing_matches

    # every doc identical: with max_df below the doc count every
    # fingerprint is hot, so the window-based cap must drop them all
    text = "common shared fingerprint text across every document here"
    docs = arrow_local_df(
        spark,
        {"doc_id": [1, 2, 3, 4], "text": [text] * 4},
        "doc_id bigint, text string",
    )
    out = winnowing_matches(docs, "text", "doc_id", min_shared=1, max_df=3)
    assert out.count() == 0


def test_ngram_novelty_single_tokenize_pass(spark):
    from petastorm_spark.operators.text import ngram_novelty

    docs = arrow_local_df(
        spark,
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon",
                "alpha beta gamma delta epsilon",
                "zeta eta theta iota kappa",
            ],
        },
        "doc_id bigint, text string",
    )
    out = ngram_novelty(docs, "text", "doc_id")
    plan = _final_plan(out)
    # df is a count window over the shingle hash: the tokenize/shingle
    # Generate runs once and no occurrence-scale table is broadcast
    # (the old df-table self-join tokenized per side and broadcast the
    # (id, hash) occurrence table — an OOM hazard beyond bench scale)
    final_tree = plan.split("== Initial Plan ==")[0]
    assert final_tree.count("Generate") == 1, (
        "shingle pipeline executes more than once:\n" + plan
    )
    assert "BroadcastHashJoin" not in plan and "Window" in plan, (
        "df no longer computed as a window over the shingle hash:\n"
        + plan
    )
    rows = {r.doc_id: (r.n_shingles, float(r.novelty)) for r in out.collect()}
    # docs 1/2 are identical (all shingles df=2 -> novelty 0); doc 3 is
    # fully novel (df=1 -> novelty 1); 5 tokens -> 3 distinct trigrams
    assert rows == {1: (3, 0.0), 2: (3, 0.0), 3: (3, 1.0)}


def test_simhash_packed_votes_match_reference(spark):
    """The packed-lane vote accumulators (3x20-bit count fields per
    long) must reproduce the signed-majority SimHash exactly,
    including the tie case (2*count == n_tokens -> bit UNSET, the old
    strict `vote > 0`)."""
    import hashlib

    from petastorm_spark.operators.dedup import simhash

    texts = {
        1: "alpha beta gamma delta",
        2: "alpha beta",                      # even token count -> ties
        3: "epsilon zeta eta theta iota kappa lambda mu",
        4: "single",
    }

    def h60(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    expected = {}
    for doc, text in texts.items():
        toks = sorted(set(text.lower().split()))
        sig = 0
        for b in range(60):
            count = sum((h60(t) >> b) & 1 for t in toks)
            if 2 * count > len(toks):
                sig |= 1 << b
        expected[doc] = sig

    docs = arrow_local_df(
        spark,
        {"doc_id": list(texts), "text": list(texts.values())},
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id").collect()}
    assert got == expected


def test_knn_graph_materializes_probe_pass_once(spark):
    from petastorm_spark.operators.similarity import knn_graph

    vecs = arrow_local_df(
        spark,
        {
            "vec_id": list(range(8)),
            "embedding": [
                [float(i % 4 == j) + 0.01 * i for j in range(4)]
                for i in range(8)
            ],
        },
        "vec_id bigint, embedding array<float>",
    )
    out = knn_graph(vecs, k=2, n_cells=4, n_probe=2)
    plan = _final_plan(out)
    assert plan.count("InMemoryTableScan") >= 2, (
        "knn_graph candidate/probe sides no longer share the persisted "
        "probe pass:\n" + plan
    )
    # every vector gets exactly k=2 neighbors on this dense fixture
    counts = (
        out.groupBy("query_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in counts] == [2]
