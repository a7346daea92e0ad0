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


def test_semantic_dedup_accepts_kmeans_centroid_shape(spark):
    # train_kmeans_centroids returns (cell, cent_vec); the documented
    # production path feeds that straight into semantic_dedup /
    # ivf_build, so both namings of centroids= must resolve (round-6
    # advice: the contract was inconsistent across the API).
    from petastorm_spark.operators.similarity import ivf_build, semantic_dedup

    km_shape = spark.createDataFrame(
        [Row(cell=0, cent_vec=[1.0, 0.0]), Row(cell=1, cent_vec=[0.0, 1.0])]
    )
    corpus_shape = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0]), Row(vec_id=1, embedding=[0.0, 1.0])]
    )
    emb = _emb_fixture(spark)
    got_km = {
        r.removed_id
        for r in semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.95, centroids=km_shape
        ).collect()
    }
    got_corpus = {
        r.removed_id
        for r in semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.95, centroids=corpus_shape
        ).collect()
    }
    assert got_km == got_corpus == {2, 3, 5}

    # multi-probe path takes the same contract
    got_probe = {
        r.removed_id
        for r in semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.95,
            centroids=km_shape, n_probe=2,
        ).collect()
    }
    assert {2, 3, 5} <= got_probe

    # ivf_build with both namings assigns identically
    _, a1 = ivf_build(emb, centroids=km_shape)
    _, a2 = ivf_build(emb, centroids=corpus_shape)
    assert {(r.vec_id, r.cell) for r in a1.collect()} == {
        (r.vec_id, r.cell) for r in a2.collect()
    }

    with pytest.raises(ValueError, match="centroids must have columns"):
        ivf_build(emb, centroids=spark.createDataFrame([Row(x=1)]))


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


# ---------------------------------------------------------------------------
# linear_classifier_score
# ---------------------------------------------------------------------------


def _qc_bucket(tok: str, n_features: int = 1024, seed: int = 0) -> int:
    import hashlib

    h = hashlib.md5(f"qc{seed}|{tok}".encode()).hexdigest()
    return int(h[:15], 16) % n_features


def test_linear_classifier_trained_weights(spark):
    from petastorm_spark.operators.text import linear_classifier_score

    weights = {_qc_bucket("good"): 1.0, _qc_bucket("bad"): -1.0}
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="good good good"),
            Row(doc_id=2, text="bad bad"),
            Row(doc_id=3, text="neutral words here"),
        ]
    )
    out = {
        r.doc_id: r
        for r in linear_classifier_score(
            df, "text", "doc_id", weights=weights
        ).collect()
    }
    assert out[1].label and out[1].score > 0.99  # sigmoid(8*1.0)
    assert not out[2].label and out[2].score < 0.01
    # unseen buckets carry weight 0 -> sigmoid(0) = 0.5, label True (>=)
    assert out[3].score == pytest.approx(0.5)
    assert out[3].n_tokens == 3


def test_linear_classifier_derived_weights_deterministic(spark):
    from petastorm_spark.operators.text import linear_classifier_score

    df = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma")])
    a = linear_classifier_score(df, "text", "doc_id").collect()[0]
    b = linear_classifier_score(df, "text", "doc_id").collect()[0]
    assert a.score == b.score
    c = linear_classifier_score(df, "text", "doc_id", seed=1).collect()[0]
    assert a.score != c.score  # different seed, different weight table


# ---------------------------------------------------------------------------
# BPE merge learning (differential vs a pure-Python reference)
# ---------------------------------------------------------------------------


def _ref_bpe(texts, num_merges, min_freq=2):
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_freq:
            break
        merges.append((a, b, freq))
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = out
    return merges, words


def test_bpe_learn_matches_reference_small(spark):
    # exercise BOTH paths: distributed rounds (local_threshold=0, at
    # merges_per_round=1 = classic BPE exactly) and the driver fast
    # path must produce identical merges and vocab
    from petastorm_spark.operators.bpe import bpe_learn

    texts = ["low low low lower lowest", "new newer newest low", "wider wide"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    ref_merges, ref_words = _ref_bpe(texts, 6)
    for thr, kwargs in ((0, {"merges_per_round": 1}), (200_000, {})):
        merges, vocab = bpe_learn(
            df, "text", num_merges=6, min_freq=2, local_threshold=thr, **kwargs
        )
        assert merges == ref_merges
        got = {r["word"]: r["syms"] for r in vocab.collect()}
        assert got == ref_words
        vocab.unpersist()


def _ref_bpe_batched(texts, num_merges, min_freq=2, k=16):
    # batched-greedy model: per round, rank pairs by pre-round counts
    # and accept up to k symbol-disjoint merges (products reserved
    # too), applying them sequentially - mirrors bpe_learn's
    # distributed rounds
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    while len(merges) < num_merges:
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        batch, used = [], set()
        for (a, b), freq in ranked:
            if len(batch) >= min(k, num_merges - len(merges)):
                break
            if freq < min_freq:
                break
            if a in used or b in used or (a + b) in used:
                continue
            batch.append((a, b, freq))
            used.update((a, b, a + b))
        if not batch:
            break
        merges.extend(batch)
        for a, b, _ in batch:
            for w, syms in words.items():
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                words[w] = out
    return merges, words


def test_bpe_learn_batched_rounds_match_batched_model(spark, monkeypatch):
    # default distributed path: batched-greedy semantics, one
    # pair-count round per <= merges_per_round accepted merges
    from petastorm_spark.operators import bpe as bpe_mod

    texts = ["low low low lower lowest", "new newer newest low", "wider wide"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for k in (2, 16):
        ref_merges, ref_words = _ref_bpe_batched(texts, 6, k=k)
        rounds = []
        orig = bpe_mod._select_disjoint_batch

        def spy(rows, remaining, min_freq, mpr):
            out = orig(rows, remaining, min_freq, mpr)
            rounds.append(len(out))
            return out

        monkeypatch.setattr(bpe_mod, "_select_disjoint_batch", spy)
        merges, vocab = bpe_mod.bpe_learn(
            df, "text", num_merges=6, min_freq=2,
            local_threshold=0, merges_per_round=k,
        )
        monkeypatch.undo()
        assert merges == ref_merges
        got = {r["word"]: r["syms"] for r in vocab.collect()}
        assert got == ref_words
        vocab.unpersist()
        # job-round economics: 6 merges in ceil(6/k)-ish rounds, never
        # one round per merge
        assert len([r for r in rounds if r]) <= -(-6 // k) + 1
        assert all(r <= k for r in rounds)


def test_bpe_learn_differential_sf0001(spark, sf_dir):
    from petastorm_spark.operators.bpe import bpe_learn

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in df.select("text").collect()]
    merges, vocab = bpe_learn(df, "text", num_merges=5)
    ref_merges, _ = _ref_bpe(texts, 5)
    assert merges == ref_merges
    vocab.unpersist()


def test_bpe_token_count(spark):
    from petastorm_spark.operators.bpe import bpe_learn, bpe_token_count

    texts = ["low low lower", "lowest newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges, vocab = bpe_learn(df, "text", num_merges=4, min_freq=1)
    _, ref_words = _ref_bpe(texts, 4, min_freq=1)
    out = {r.doc_id: r for r in bpe_token_count(df, "text", "doc_id", merges).collect()}
    for i, t in enumerate(texts):
        ws = t.split()
        assert out[i].n_words == len(ws)
        assert out[i].n_bpe_tokens == sum(len(ref_words[w]) for w in ws)
    vocab.unpersist()


# ---------------------------------------------------------------------------
# dataset_diff
# ---------------------------------------------------------------------------


def test_dataset_diff_statuses(spark):
    from petastorm_spark.operators.diagnostics import dataset_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k int, v string"
    )
    out = {r.k: r.status for r in dataset_diff(old, new, "k", ["v"]).collect()}
    # 2 is unchanged -> absent; 1 removed, 3 changed, 4 added
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_dataset_diff_null_vs_empty(spark):
    from petastorm_spark.operators.diagnostics import dataset_diff

    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "")], "k int, v string")
    out = dataset_diff(old, new, "k", ["v"]).collect()
    assert [r.status for r in out] == ["changed"]


# ---------------------------------------------------------------------------
# pagerank (differential vs a numpy power iteration)
# ---------------------------------------------------------------------------


def _ref_pagerank(edges, iters=4, d=0.85):
    from collections import defaultdict

    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        inc = defaultdict(float)
        for s, t in edges:
            inc[t] += r[s] / deg[s]
        r = {v: (1 - d) / n + d * inc[v] for v in nodes}
    return {v: round(r[v], 6) for v in nodes}


def _run_pagerank(spark, edges, iters):
    from petastorm_spark.operators.graph import pagerank

    e = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(e, iters=iters).collect()}


def test_pagerank_symmetric_pair_is_uniform(spark):
    out = _run_pagerank(spark, [("a", "b"), ("b", "a")], iters=3)
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_star_matches_reference(spark):
    edges = [("h", f"l{i}") for i in range(4)] + [
        (f"l{i}", "h") for i in range(4)
    ]
    out = _run_pagerank(spark, edges, iters=4)
    ref = _ref_pagerank(edges, iters=4)
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)  # no dangling mass
    assert all(out["h"] > out[f"l{i}"] for i in range(4))
    for v, r in ref.items():
        assert out[v] == pytest.approx(r, abs=2e-6)


def test_pagerank_dangling_node_matches_reference(spark):
    edges = [("a", "b")]  # b is dangling: its mass leaks, a bottoms out
    out = _run_pagerank(spark, edges, iters=4)
    ref = _ref_pagerank(edges, iters=4)
    for v, r in ref.items():
        assert out[v] == pytest.approx(r, abs=2e-6)
    assert out["a"] == pytest.approx(0.15 / 2, abs=1e-6)


# ---------------------------------------------------------------------------
# inverted_index / pmi_cooccurrence
# ---------------------------------------------------------------------------


def test_inverted_index_postings_and_cap(spark):
    from petastorm_spark.operators.text import inverted_index

    df = spark.createDataFrame(
        [
            (3, "apple banana"),
            (1, "apple cherry apple"),  # repeated token counts once
            (2, "banana apple"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.term: r
        for r in inverted_index(
            df, "text", "doc_id", min_df=2, max_postings=2
        ).collect()
    }
    assert set(out) == {"apple", "banana"}  # cherry has df=1
    assert out["apple"].df == 3  # exact df survives the cap
    assert out["apple"].postings == [1, 2]  # sorted, capped at 2
    assert out["banana"].postings == [2, 3]


def test_pmi_cooccurrence_known_counts(spark):
    import math

    from petastorm_spark.operators.text import pmi_cooccurrence

    # "x y" always adjacent, z independent filler
    df = spark.createDataFrame(
        [("x y z",), ("x y",), ("z x y",)], "text string"
    )
    out = {
        (r.a, r.b): r
        for r in pmi_cooccurrence(df, "text", window=2, min_pair_count=3).collect()
    }
    r = out[("x", "y")]
    assert r.pair_count == 3
    # totals: pairs = (2+1)+(1)+(2+1)=... count directly below
    tp = 3 + 1 + 3  # per doc: len-1 + len-2 adjacent/skip pairs
    tu = 8
    expected = math.log((3 / tp) / ((3 / tu) * (3 / tu)))
    assert r.pmi == pytest.approx(round(expected, 4), abs=1e-4)


# ---------------------------------------------------------------------------
# token_budget_mix / dedup_threshold_curve
# ---------------------------------------------------------------------------


def test_token_budget_mix_shares_and_epochs(spark):
    from petastorm_spark.operators.sampling_extra import token_budget_mix

    df = spark.createDataFrame(
        [("big", "a " * 900), ("small", "b " * 100)],
        "source string, text string",
    )
    out = {
        r.source: r
        for r in token_budget_mix(
            df, "text", "source", budget_tokens=1000, alpha=1.0
        ).collect()
    }
    # alpha=1: shares proportional to counts; budget == corpus size
    assert out["big"].weight == pytest.approx(0.9)
    assert out["small"].weight == pytest.approx(0.1)
    assert out["big"].keep_frac == pytest.approx(1.0)
    assert out["big"].epochs == pytest.approx(1.0)
    # alpha=0: uniform shares -> small source repeats 5x, big keeps half
    out0 = {
        r.source: r
        for r in token_budget_mix(
            df, "text", "source", budget_tokens=1000, alpha=0.0
        ).collect()
    }
    assert out0["small"].epochs == pytest.approx(5.0)
    assert out0["big"].keep_frac == pytest.approx(500 / 900, abs=1e-6)
    assert out0["big"].weight == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# stream-stream attribution join (twin of interval_attribution)
# ---------------------------------------------------------------------------


def test_attribution_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    from petastorm_spark.operators.temporal import interval_attribution
    from petastorm_spark.session import events_ts_us
    from petastorm_spark.streaming.feed import attribution_stream, stream_dataset

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = str(tmp_path_factory.mktemp("attr") / "events")
    ev.coalesce(1).write.parquet(d)

    s = stream_dataset(spark, d)
    q = (
        attribution_stream(
            s.where(F.col("event_type") == "click"),
            s.where(F.col("event_type") == "purchase"),
            window="30 minutes",
            watermark="2 hours",
        )
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r.user_id, r.left_id, r.right_id, r.left_ts_us, r.right_ts_us)
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }

    evb = ev.withColumn("ts_us", events_ts_us(ev))
    clicks = evb.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("left_id"),
        F.col("ts_us").alias("left_ts_us"),
    )
    purchases = evb.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("right_id"),
        F.col("ts_us").alias("right_ts_us"),
    )
    batch_rows = {
        (r.user_id, r.left_id, r.right_id, r.left_ts_us, r.right_ts_us)
        for r in interval_attribution(
            clicks, purchases, "user_id", "left_ts_us", "right_ts_us",
            window_us=30 * 60 * 1_000_000,
        ).collect()
    }
    assert stream_rows == batch_rows and stream_rows


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    from petastorm_spark.operators.sketch import kmv_overlap, kmv_sketch

    # 30 distinct elements each, 10 shared; k=64 > n -> sketches ARE
    # the full hash sets and the "estimate" is exact
    rows = [("a", f"s{i}") for i in range(30)] + [
        ("b", f"s{i}") for i in range(20, 50)
    ]
    df = spark.createDataFrame(rows, "g string, e string")
    sk = kmv_sketch(df, "g", "e", k=64)
    out = kmv_overlap(sk, "g", k=64).collect()[0]
    assert out.group_a == "a" and out.group_b == "b"
    assert out.est_distinct_a == 30.0 and out.est_distinct_b == 30.0
    assert out.est_jaccard == pytest.approx(10 / 50)


def test_kmv_estimate_accuracy_at_scale(spark):
    from petastorm_spark.operators.sketch import kmv_overlap, kmv_sketch

    # 4000 distinct per group, 2000 shared -> true J = 1/3; k=256
    rows = [("a", f"x{i}") for i in range(4000)] + [
        ("b", f"x{i}") for i in range(2000, 6000)
    ]
    df = spark.createDataFrame(rows, "g string, e string")
    sk = kmv_sketch(df, "g", "e", k=256)
    out = kmv_overlap(sk, "g", k=256).collect()[0]
    assert out.est_jaccard == pytest.approx(1 / 3, rel=0.25)
    assert out.est_distinct_a == pytest.approx(4000, rel=0.2)
    assert out.est_distinct_b == pytest.approx(4000, rel=0.2)


def test_kmv_sketch_mergeable(spark):
    from pyspark.sql import functions as FF

    from petastorm_spark.operators.sketch import kmv_sketch

    # sketch(A ∪ B) == cap(sort(union(sketch(A), sketch(B))))
    rows_a = [("g", f"m{i}") for i in range(500)]
    rows_b = [("g", f"m{i}") for i in range(300, 800)]
    k = 64
    both = kmv_sketch(
        spark.createDataFrame(rows_a + rows_b, "g string, e string"), "g", "e", k=k
    ).collect()[0].sketch
    sa = kmv_sketch(
        spark.createDataFrame(rows_a, "g string, e string"), "g", "e", k=k
    ).collect()[0].sketch
    sb = kmv_sketch(
        spark.createDataFrame(rows_b, "g string, e string"), "g", "e", k=k
    ).collect()[0].sketch
    merged = sorted(set(sa) | set(sb))[:k]
    assert merged == list(both)


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_stable_under_head_insertion(spark):
    from petastorm_spark.operators.packing import cdc_chunks

    base = " ".join(f"w{i}" for i in range(80))  # 80 distinct tokens
    edited = "INSERTED " + base  # one token prepended
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id int, text string"
    )
    out = cdc_chunks(df, "text", "doc_id", boundary_mod=4).collect()
    d1 = {r.digest for r in out if r.doc_id == 1}
    d2 = {r.digest for r in out if r.doc_id == 2}
    # content-defined boundaries: every chunk after the first boundary
    # is unchanged by the insertion -> all but at most one of doc 1's
    # chunks reappear verbatim in doc 2
    assert len(d1 - d2) <= 1 and len(d1) > 3


def test_cdc_chunks_cover_document(spark):
    from petastorm_spark.operators.packing import cdc_chunks

    text = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame([(7, text)], "doc_id int, text string")
    out = sorted(
        cdc_chunks(df, "text", "doc_id", boundary_mod=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    # chunks partition the token stream: counts sum to len, text
    # reassembles in order
    assert sum(r.n_tokens for r in out) == 10
    assert " ".join(r.chunk_text for r in out) == text.lower()


# ---------------------------------------------------------------------------
# curation pipeline classifier stage
# ---------------------------------------------------------------------------


def test_curate_classifier_stage(spark):
    from petastorm_spark.operators.pipeline import curate_corpus

    weights = {_qc_bucket("spammy"): -2.0}
    rows = [
        Row(doc_id=i, text=f"clean document number {i} with plain words")
        for i in range(6)
    ] + [Row(doc_id=10 + i, text="spammy spammy spammy") for i in range(3)]
    stages = curate_corpus(
        spark.createDataFrame(rows),
        "text",
        "doc_id",
        quality_floor=0.0,
        classifier_floor=0.4,
        classifier_weights=weights,
    )
    assert "classified" in stages
    kept = {r.doc_id for r in stages["classified"].collect()}
    assert kept == set(range(6))  # spam scored ~sigmoid(-16) -> dropped
    # stage absent (and report shape unchanged) when not requested
    stages2 = curate_corpus(
        spark.createDataFrame(rows), "text", "doc_id", quality_floor=0.0
    )
    assert "classified" not in stages2


def test_linear_classifier_broadcast_weight_table(spark):
    # past 10k buckets the weights ship as a broadcast table; scoring
    # must be identical to the map-literal path
    from petastorm_spark.operators.text import linear_classifier_score

    df = spark.createDataFrame(
        [Row(doc_id=1, text="good good"), Row(doc_id=2, text="bad mixed")]
    )
    small = {_qc_bucket("good"): 1.5, _qc_bucket("bad"): -1.5}
    big = {i: 0.0 for i in range(10_050) if i not in small}
    big.update(small)
    a = {r.doc_id: r.score for r in linear_classifier_score(
        df, "text", "doc_id", weights=small).collect()}
    b = {r.doc_id: r.score for r in linear_classifier_score(
        df, "text", "doc_id", weights=big).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# tree ensemble inference
# ---------------------------------------------------------------------------


def test_tree_ensemble_score_branches_and_nulls(spark):
    import math

    from petastorm_spark.operators.ml import tree_ensemble_score

    tree = {
        "feature": "x", "threshold": 1.0,
        "left": -2.0,
        "right": {"feature": "y", "threshold": 0.0, "left": 0.0, "right": 2.0},
    }
    df = spark.createDataFrame(
        [(1, 0.5, 99.0), (2, 3.0, 1.0), (3, None, -5.0)],
        "id int, x double, y double",
    )
    out = {
        r.id: r
        for r in tree_ensemble_score(
            df, "id", {"x": F.col("x"), "y": F.col("y")}, [tree]
        ).collect()
    }
    sig = lambda v: 1.0 / (1.0 + math.exp(-v))  # noqa: E731
    assert out[1].score == pytest.approx(round(sig(-2.0), 4))  # left leaf
    assert out[2].score == pytest.approx(round(sig(2.0), 4))  # right-right
    # NULL feature falls RIGHT (GBDT default direction): x NULL -> right
    # subtree, then y=-5 < 0 -> 0.0 -> sigmoid 0.5, label True
    assert out[3].score == pytest.approx(0.5) and out[3].label


def test_tree_sql_matches_column_compilation(spark):
    from petastorm_spark.operators.ml import ensemble_sql, tree_ensemble_score

    trees = [
        {"feature": "x", "threshold": 2.5, "left": -1.0, "right": 1.5},
        {"feature": "x", "threshold": 0.5, "left": 0.25, "right": -0.75},
    ]
    df = spark.createDataFrame([(i, float(i)) for i in range(5)], "id int, x double")
    a = {
        r.id: r.score
        for r in tree_ensemble_score(df, "id", {"x": F.col("x")}, trees).collect()
    }
    df.createOrReplaceTempView("tsql")
    sql = ensemble_sql(trees, {"x": "x"})
    b = {
        r.id: r.score
        for r in spark.sql(
            f"SELECT id, round({sql}, 4) AS score FROM tsql"
        ).collect()
    }
    assert a == b


def test_kmv_sketch_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming KMV over a static dir must reproduce the batch sketch
    value-for-value (min-k is mergeable, hashing identical)."""
    from petastorm_spark.operators.sketch import kmv_sketch
    from petastorm_spark.streaming.feed import kmv_sketch_stream, stream_dataset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    d = str(tmp_path_factory.mktemp("kmvs") / "docs")
    docs.coalesce(2).write.parquet(d)
    q = (
        kmv_sketch_stream(
            stream_dataset(spark, d, max_files_per_trigger=1),
            "source",
            "doc_id",
            k=16,
        )
        .writeStream.format("memory")
        .queryName("kmv_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: last emitted row per group is the final sketch
    snap = spark.sql(
        "SELECT source, sketch FROM kmv_out"
    ).toPandas().groupby("source").last()
    stream_sk = {s: list(r["sketch"]) for s, r in snap.iterrows()}
    batch_sk = {
        r.source: list(r.sketch)
        for r in kmv_sketch(docs, "source", "doc_id", k=16).collect()
    }
    assert stream_sk == batch_sk and stream_sk


def test_semantic_dedup_probe2_recovers_boundary_pair(spark):
    # at n_probe=2 the 6/7 pair (cos 0.995, split across the cell
    # boundary) becomes visible: both probe the other's cell
    from petastorm_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        _emb_fixture(spark), "vec_id", "embedding",
        n_cells=2, threshold=0.95, n_probe=2,
    ).collect()
    got = {r.removed_id: r.witness_id for r in out}
    assert got[7] == 6  # the boundary pair, recovered
    assert 2 in got and 3 in got and 5 in got  # n_probe=1 removals kept


# ---------------------------------------------------------------------------
# next_event_examples
# ---------------------------------------------------------------------------


def test_next_event_examples_windows(spark):
    from petastorm_spark.operators.packing import next_event_examples

    rows = [(1, i, 100 + i, f"e{i}") for i in range(7)]  # 7 events
    rows += [(2, 0, 200, "x"), (2, 1, 201, "y")]  # too short -> no rows
    df = spark.createDataFrame(rows, "u int, t bigint, i bigint, e string")
    out = sorted(
        next_event_examples(df, "u", "t", "i", "e", context_len=5).collect(),
        key=lambda r: (r.u, r.window_idx),
    )
    assert [r.u for r in out] == [1, 1]  # 7 events -> 2 windows
    assert out[0].context == ["e0", "e1", "e2", "e3", "e4"]
    assert out[0].label == "e5"
    assert out[1].context == ["e1", "e2", "e3", "e4", "e5"]
    assert out[1].label == "e6"


def test_next_event_examples_order_is_event_time(spark):
    from petastorm_spark.operators.packing import next_event_examples

    # rows arrive shuffled; windows must follow (ts, id) order
    rows = [(1, 5, 1, "late"), (1, 1, 2, "a"), (1, 2, 3, "b"),
            (1, 3, 4, "c"), (1, 4, 5, "d")]
    df = spark.createDataFrame(rows, "u int, t bigint, i bigint, e string")
    out = next_event_examples(df, "u", "t", "i", "e", context_len=4).collect()
    assert len(out) == 1
    assert out[0].context == ["a", "b", "c", "d"] and out[0].label == "late"


# ---------------------------------------------------------------------------
# SQ8 ANN
# ---------------------------------------------------------------------------


def test_sq8_matches_exact_topk_at_8_bits(spark, sf_dir):
    # 8-bit quantization + 4x rescore recovers the exact top-5 on the
    # real embedding fixture (the standard SQ8 recall claim)
    from petastorm_spark.operators.similarity import cosine_topk, cosine_topk_sq8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, q, k=5).collect()
    }
    sq8 = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_sq8(emb, q, k=5, rescore_factor=4).collect()
    }
    hits = sum(1 for key, n in exact.items() if sq8.get(key) == n)
    assert hits / len(exact) >= 0.9  # near-perfect agreement at 8 bits
    # and the reported cos_sim is the EXACT score (full-precision rescore)
    r0 = cosine_topk_sq8(emb, q, k=1).collect()[0]
    e0 = [r for r in cosine_topk(emb, q, k=1).collect()
          if r.query_id == r0.query_id][0]
    assert r0.cos_sim == e0.cos_sim


# ---------------------------------------------------------------------------
# blocked_fuzzy_join
# ---------------------------------------------------------------------------


def test_blocked_fuzzy_join_matches_within_block(spark):
    from petastorm_spark.operators.dedup import blocked_fuzzy_join

    left = spark.createDataFrame(
        [(1, "abcdef-12345"), (2, "zzzzzz-99999")], "k int, t string"
    )
    right = spark.createDataFrame(
        [(10, "abcdef-12395"),   # 1 edit, same block -> match
         (11, "Xbcdef-12345"),   # 1 edit INSIDE the prefix -> blocked away
         (12, "zzzzzz-00000")],  # 5 edits -> fails verify
        "rk int, t string",
    )
    out = blocked_fuzzy_join(
        left, right, "k", "rk", "t", "t", max_dist=2, block_prefix=6
    ).collect()
    assert [(r[0], r[1], r.edit_dist) for r in out] == [(1, 10, 1)]


def test_blocked_fuzzy_join_rejects_identical_key_names(spark):
    # identical output key names would be ambiguous downstream
    from petastorm_spark.operators.dedup import blocked_fuzzy_join

    df = spark.createDataFrame([(1, "abc")], "k int, t string")
    with pytest.raises(ValueError, match="left_key and right_key"):
        blocked_fuzzy_join(df, df, "k", "k", "t", "t")


def test_canonicalize_by_keeps_best_not_lowest(spark):
    from petastorm_spark.operators.dedup import canonicalize_by

    df = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (9, 5.0)],  # 9 unclustered
        "doc_id int, score double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id int, cluster_id int"
    )
    kept = {
        r.doc_id
        for r in canonicalize_by(df, "doc_id", clusters, "score").collect()
    }
    assert kept == {2, 9}  # highest score wins, not lowest id; 9 untouched
    kept_min = {
        r.doc_id
        for r in canonicalize_by(
            df, "doc_id", clusters, "score", keep="min"
        ).collect()
    }
    assert kept_min == {9, 1}  # keep-min flips to the lowest score


def test_next_event_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    from petastorm_spark.operators.packing import next_event_examples
    from petastorm_spark.session import events_ts_us
    from petastorm_spark.streaming.feed import next_event_stream, stream_dataset

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    evb = ev.withColumn("ts_us", events_ts_us(ev))
    d = str(tmp_path_factory.mktemp("nes") / "events")
    evb.select("user_id", "ts_us", "event_id", "event_type").coalesce(
        1
    ).write.parquet(d)

    q = (
        next_event_stream(
            stream_dataset(spark, d), "user_id", "ts_us", "event_id",
            "event_type", context_len=5,
        )
        .writeStream.format("memory")
        .queryName("nes_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r.user_id, r.window_idx, tuple(r.context), r.label)
        for r in spark.sql("SELECT * FROM nes_out").collect()
    }
    batch_rows = {
        (r.user_id, r.window_idx, tuple(r.context), r.label)
        for r in next_event_examples(
            evb, "user_id", "ts_us", "event_id", "event_type", context_len=5
        ).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_canonicalize_by_string_ids_and_scores(spark):
    # review fix: ids/scores need no numeric negation — strings work
    from petastorm_spark.operators.dedup import canonicalize_by

    df = spark.createDataFrame(
        [("a", "2024-01-01"), ("b", "2024-06-01"), ("c", "2024-03-01")],
        "doc_id string, updated string",
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "doc_id string, cluster_id string"
    )
    kept = {
        r.doc_id
        for r in canonicalize_by(df, "doc_id", clusters, "updated").collect()
    }
    assert kept == {"b"}  # keep-most-recent via string-ordered dates
    with pytest.raises(ValueError):
        canonicalize_by(df, "doc_id", clusters, "updated", keep="Max")


def test_curate_classifier_seed_independent_of_sampling_seed(spark):
    # review fix: varying the pipeline sampling seed must not rehash
    # trained classifier weights into a different feature space
    from petastorm_spark.operators.pipeline import curate_corpus

    weights = {_qc_bucket("spammy"): -2.0}
    rows = [
        Row(doc_id=i, text=f"clean document number {i} with plain words")
        for i in range(4)
    ] + [Row(doc_id=10, text="spammy spammy spammy")]
    df = spark.createDataFrame(rows)
    for pipeline_seed in (0, 7):
        stages = curate_corpus(
            df, "text", "doc_id",
            quality_floor=0.0, seed=pipeline_seed,
            classifier_floor=0.4, classifier_weights=weights,
        )
        assert {r.doc_id for r in stages["classified"].collect()} == {0, 1, 2, 3}


def test_blocked_fuzzy_join_ignores_empty_texts(spark):
    from petastorm_spark.operators.dedup import blocked_fuzzy_join

    left = spark.createDataFrame([(1, ""), (2, "  "), (3, "abcdef")],
                                 "k int, t string")
    right = spark.createDataFrame([(10, ""), (11, "abcdef")],
                                  "rk int, t string")
    out = blocked_fuzzy_join(left, right, "k", "rk", "t", "t",
                             max_dist=2, block_prefix=3).collect()
    assert [(r[0], r[1]) for r in out] == [(3, 11)]  # no empty-block cross matches
