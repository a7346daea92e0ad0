"""Round-10 operators: product quantization (PQ/ADC), reciprocal-rank
fusion, the oracle-exact multimodal family (image/audio/video dup
pairs, meta stats, resize / frame-sample pipelines, streaming twins),
margin bitext mining, incremental semantic dedup against a persisted
IVF index, and winnowing (MOSS) fingerprint matching."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from petastorm_spark.session import arrow_local_df


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    n, dim = 120, 16
    V = rng.standard_normal((n, dim))
    return arrow_local_df(
        spark,
        {"vec_id": list(range(n)), "embedding": [list(map(float, v)) for v in V]},
        "vec_id bigint, embedding array<double>",
    )


def test_pq_codebooks_deterministic_shape(spark, corpus):
    from petastorm_spark.operators.similarity import pq_codebooks

    cb = pq_codebooks(corpus, dim=16, m=4, k_codes=8)
    assert cb.shape == (4, 8, 4)
    # subspace j of code c == the c-th lowest-id vector's j-th subvector
    rows = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
    for c in range(8):
        np.testing.assert_allclose(cb[1][c], rows[c][4:8])


def test_pq_encode_matches_numpy_argmin(spark, corpus):
    from petastorm_spark.operators.similarity import pq_codebooks, pq_encode

    cb = pq_codebooks(corpus, dim=16, m=4, k_codes=8)
    coded = {r.vec_id: list(r.pq_codes) for r in pq_encode(corpus, cb).collect()}
    rows = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
    for vid, v in list(rows.items())[:25]:
        sub = v.reshape(4, 4)
        expect = [
            int(np.argmin(((cb[j] - sub[j]) ** 2).sum(axis=1))) for j in range(4)
        ]
        assert coded[vid] == expect, vid


def test_pq_topk_exact_rescore_and_recall(spark, corpus):
    """Shortlist comes from 8-byte codes, but emitted cosines are
    EXACT (bit-equal to brute force for the neighbors both return);
    recall@5 vs brute force stays high at 4x rescore."""
    from petastorm_spark.operators.similarity import cosine_topk, cosine_topk_pq

    q = corpus.where(F.col("vec_id") < 5)
    exact = cosine_topk(corpus, q, k=5).collect()
    approx = cosine_topk_pq(
        corpus, q, k=5, rescore_factor=4, dim=16, m=4, k_codes=8
    ).collect()
    ex = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    ap = {(r.query_id, r.neighbor_id): r.cos_sim for r in approx}
    hits = set(ex) & set(ap)
    assert len(hits) / len(ex) >= 0.6  # tiny random corpus, coarse codes
    for key in hits:
        assert ex[key] == ap[key]  # rescored cosine is the exact one


def test_pq_encode_paths_agree(spark, corpus):
    """The Arrow-numpy path (chosen above 256 distance trees) and the
    Catalyst expression path emit IDENTICAL codes for the same
    codebook — distances fold left-to-right in double and ties take
    the first minimum on both."""
    from petastorm_spark.operators.similarity import (
        _pq_encode_exprs,
        pq_codebooks,
        pq_encode,
    )

    cb = pq_codebooks(corpus, dim=16, m=4, k_codes=65)  # 260 trees
    via_numpy = {
        r.vec_id: list(r.pq_codes) for r in pq_encode(corpus, cb).collect()
    }
    via_exprs = {
        r.vec_id: list(r.pq_codes)
        for r in _pq_encode_exprs(corpus, cb, "embedding", "pq_codes").collect()
    }
    assert via_numpy == via_exprs


def test_pq_trained_codebooks_improve_or_match_recall(spark, corpus):
    """The production path: per-subspace k-means codebooks plug into
    the same encode/search, and shortlist recall vs brute force is at
    least as good as the deterministic lowest-id codebooks (k-means
    fits the data; lowest-id is an arbitrary sample)."""
    pytest.importorskip("pyspark.ml")
    from petastorm_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_pq,
        pq_codebooks,
        pq_train_codebooks,
    )

    q = corpus.where(F.col("vec_id") < 8)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(corpus, q, k=5).collect()}

    def recall(cb):
        got = {(r.query_id, r.neighbor_id)
               for r in cosine_topk_pq(
                   corpus, q, k=5, rescore_factor=4, dim=16, m=4,
                   k_codes=8, codebooks=cb).collect()}
        return len(exact & got) / len(exact)

    det = recall(pq_codebooks(corpus, dim=16, m=4, k_codes=8))
    trained = recall(pq_train_codebooks(corpus, dim=16, m=4, k_codes=8))
    assert trained >= det - 0.05  # never meaningfully worse
    assert trained >= 0.5


def test_pq_persistent_index_roundtrip(spark, corpus, tmp_path_factory):
    """Build-once / query-many: codes parquet + codebook JSON sidecar
    round-trip, the persisted-code query matches the inline
    cosine_topk_pq row for row, and the codes table carries NO vector
    column (the 32x-smaller artifact is the point)."""
    from petastorm_spark.operators.similarity import (
        cosine_topk_pq,
        pq_codebooks,
        pq_encode,
        pq_index_read,
        pq_index_write,
        pq_query,
    )

    url = str(tmp_path_factory.mktemp("pqidx") / "idx")
    cb = pq_codebooks(corpus, dim=16, m=4, k_codes=8)
    pq_index_write(url, cb, pq_encode(corpus, cb))
    cb2, coded2 = pq_index_read(spark, url)
    np.testing.assert_array_equal(cb, cb2)
    assert set(coded2.columns) == {"vec_id", "pq_codes"}  # vectors dropped

    q = corpus.where(F.col("vec_id") < 5)
    inline = sorted(
        map(tuple, cosine_topk_pq(
            corpus, q, k=5, rescore_factor=4, dim=16, m=4, k_codes=8
        ).collect())
    )
    persisted = sorted(
        map(tuple, pq_query(cb2, coded2, corpus, q, k=5, rescore_factor=4).collect())
    )
    assert inline == persisted


def test_ivfpq_exact_rescore_and_probe_recall(spark, corpus):
    """IVF-PQ: emitted cosines are exact (bit-equal to brute force for
    shared neighbors) and widening n_probe never loses recall — the
    same monotonicity contract as plain IVF."""
    from petastorm_spark.operators.similarity import cosine_topk, cosine_topk_ivfpq

    q = corpus.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in cosine_topk(corpus, q, k=5).collect()}

    def hits(n_probe):
        got = {(r.query_id, r.neighbor_id): r.cos_sim
               for r in cosine_topk_ivfpq(
                   corpus, q, k=5, rescore_factor=4, dim=16, n_cells=8,
                   n_probe=n_probe, m=4, k_codes=8).collect()}
        for key in set(exact) & set(got):
            assert exact[key] == got[key]  # rescored cosine is exact
        return len(set(exact) & set(got))

    h1, h3 = hits(1), hits(3)
    assert h3 >= h1
    assert h3 >= len(exact) * 0.5  # coarse fixture, but probes recover


def test_ivfpq_persistent_index_prunes_and_matches(spark, corpus, tmp_path_factory):
    """The persisted IVF-PQ index round-trips (cell-partitioned codes +
    centroids + codebook sidecar), the persisted query matches the
    inline path row for row, and cell pruning reads only the probed
    cells' partitions (pinned in the physical plan)."""
    from petastorm_spark.operators.similarity import (
        cosine_topk_ivfpq,
        ivfpq_build,
        ivfpq_index_read,
        ivfpq_index_write,
        ivfpq_query,
    )

    url = str(tmp_path_factory.mktemp("ivfpqidx") / "idx")
    cent, cb, coded = ivfpq_build(corpus, dim=16, n_cells=8, m=4, k_codes=8)
    ivfpq_index_write(url, cent, cb, coded)
    cent2, cb2, coded2 = ivfpq_index_read(spark, url)
    np.testing.assert_array_equal(cb, cb2)

    q = corpus.where(F.col("vec_id") < 5)
    inline = sorted(map(tuple, cosine_topk_ivfpq(
        corpus, q, k=5, rescore_factor=4, dim=16, n_cells=8,
        n_probe=2, m=4, k_codes=8).collect()))
    persisted = sorted(map(tuple, ivfpq_query(
        cent2, cb2, coded2, corpus, q, k=5, rescore_factor=4,
        n_probe=2).collect()))
    assert inline == persisted

    # partition pruning: the CODE scan (not the vector rescore scan)
    # carries the probed-cell isin as a PartitionFilter — the index
    # reads only those cells' directories
    plan = ivfpq_query(
        cent2, cb2, coded2, corpus, q, k=5, n_probe=2
    )._jdf.queryExecution().executedPlan().toString()
    code_scans = [
        ln for ln in plan.split("\n")
        if "FileScan parquet" in ln and "pq_codes" in ln
    ]
    assert code_scans and all(
        "PartitionFilters: [cell#" in ln and " IN (" in ln for ln in code_scans
    )


def test_pq_encode_streaming_twin_matches_batch(spark, corpus, tmp_path_factory):
    """PQ encoding is a pure per-row map, so it composes directly onto
    a readStream feed: availableNow over a static vector directory
    emits exactly the batch path's codes — the online half of a
    continuously-ingested ANN index (append codes as vectors arrive,
    search via pq_query)."""
    from petastorm_spark.operators.similarity import pq_codebooks, pq_encode
    from petastorm_spark.streaming.feed import stream_dataset

    d = str(tmp_path_factory.mktemp("pqstream") / "vecs")
    corpus.write.parquet(d)
    cb = pq_codebooks(corpus, dim=16, m=4, k_codes=8)

    qy = (
        pq_encode(stream_dataset(spark, d), cb)
        .selectExpr("vec_id", "cast(pq_codes as string) AS codes")
        .writeStream.format("memory")
        .queryName("pq_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    got = {
        (r.vec_id, r.codes)
        for r in spark.sql("SELECT * FROM pq_stream").collect()
    }
    want = {
        (r.vec_id, r.codes)
        for r in pq_encode(spark.read.parquet(d), cb)
        .selectExpr("vec_id", "cast(pq_codes as string) AS codes")
        .collect()
    }
    assert got == want and got


def test_rrf_fuse_arithmetic_and_ties(spark):
    from petastorm_spark.operators.sampling_extra import rrf_fuse

    a = arrow_local_df(
        spark, {"doc_id": [1, 2, 3], "rank": [1, 2, 3]}, "doc_id bigint, rank int"
    )
    b = arrow_local_df(
        spark, {"doc_id": [3, 4], "rank": [1, 2]}, "doc_id bigint, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse([a, b], "doc_id", k_const=60, k=10).collect()}
    assert out[3].n_systems == 2
    assert out[3].rrf_score == round(1 / 63 + 1 / 61, 6)
    assert out[3].rank == 1  # two-system doc outranks every single-system doc
    assert out[1].rrf_score == round(1 / 61, 6)
    # tie between doc 1 (rank 1 in a) and doc 4? 1/61 vs 1/62 — no tie;
    # equal-score ties break by id: give b's rank-1 to two docs
    c = arrow_local_df(
        spark, {"doc_id": [9, 7], "rank": [1, 1]}, "doc_id bigint, rank int"
    )
    d = arrow_local_df(
        spark, {"doc_id": [8], "rank": [2]}, "doc_id bigint, rank int"
    )
    fused = rrf_fuse([c, d], "doc_id", k=10).collect()
    by_rank = {r.rank: r.doc_id for r in fused}
    assert by_rank[1] == 7 and by_rank[2] == 9  # same score, lower id first


def test_image_dhash_pairs_semantics(spark, sf_dir):
    """The multimodal near-dup query end to end at sf0.001: every doc's
    copy (id + 100k) is hamming-0, copies of every 5th doc carry the
    one-pixel perturbation (hamming <= 1), and no cross-doc pair leaks
    in — md5-derived pixels kill the corpus-wide collisions every
    arithmetic image draft suffered."""
    from petastorm_spark.queries_llm import _MM_SHIFT, image_dhash_pairs

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_dhash_pairs(spark, sf_dir).collect()
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(pairs) == n_docs  # exactly one pair per (doc, copy)
    for (a, b), h in pairs.items():
        assert b == a + _MM_SHIFT
        # the +13 tweak flips the (0,0)<(0,1) bit only when it crosses
        # the comparison boundary — <=1, and only on every-5th copies
        assert h <= (1 if a % 5 == 0 else 0)
    assert any(h == 1 for h in pairs.values())


def test_image_dhash_generator_matches_oracle_math():
    """Pixel k of doc d is byte k%16 of md5(f"{d}_{k//16}") — the
    closed form the DuckDB oracle re-derives in integer SQL."""
    import hashlib

    digest = b"".join(hashlib.md5(f"7_{c}".encode()).digest() for c in range(5))
    p = np.frombuffer(digest, dtype=np.uint8)[:66].reshape(6, 11)
    # spot-check against the SQL formula for two (chunk, byte) spots
    for k in (0, 37):
        hexs = hashlib.md5(f"7_{k // 16}".encode()).hexdigest()
        assert p[k // 11, k % 11] == int(hexs[2 * (k % 16): 2 * (k % 16) + 2], 16)


@pytest.mark.parametrize("qname", ["audio_dup_pairs", "video_dup_pairs"])
def test_av_dup_pairs_semantics(spark, sf_dir, qname):
    """Audio and video near-dup queries end to end at sf0.001: one
    pair per (doc, copy), perturbed every-5th copies at hamming <= 1,
    clean copies at hamming 0, no cross-doc leakage."""
    from petastorm_spark import queries_llm

    q = getattr(queries_llm, qname)
    pairs = {(r.id_a, r.id_b): r.hamming for r in q(spark, sf_dir).collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(pairs) == n_docs
    for (a, b), h in pairs.items():
        assert b == a + queries_llm._MM_SHIFT
        assert h <= (1 if a % 5 == 0 else 0)


def test_envelope_dyadic_exactness():
    """The fixture's RMS envelope comparisons equal integer
    sum-of-squares comparisons — the property the SQL oracle relies
    on (window width 16 keeps every float64 step exactly dyadic)."""
    from petastorm_spark.operators.audio import audio_fingerprint60
    from petastorm_spark.queries_llm import _md5_values

    s = _md5_values(7, "w", 61).ravel()
    fp = audio_fingerprint60((s.astype("int16") / 32768.0)[:, None])
    sums = (s.reshape(61, 16) ** 2).sum(axis=1)
    want = 0
    for i in range(60):
        want = (want << 1) | int(sums[i] < sums[i + 1])
    assert fp == want


def test_meta_stats_queries_pin_real_containers(spark, sf_dir):
    """audio_meta_stats exercises stereo + 8k/16k WAVs through the
    chunk-walking parser; image_meta_stats pins that the pure-python
    PNG route (not RAW0) decoded every blob."""
    from petastorm_spark.queries_llm import audio_meta_stats, image_meta_stats

    a = audio_meta_stats(spark, sf_dir).collect()
    assert {(r.channels, r.sample_rate) for r in a} <= {
        (1, 8000), (1, 16000), (2, 8000), (2, 16000)
    }
    assert sum(r.n_clips for r in a) == spark.read.parquet(
        f"{sf_dir}/documents.parquet"
    ).count()

    i = image_meta_stats(spark, sf_dir).collect()
    assert all(r.fmt == "png" for r in i)
    assert all(r.sum_pixels == r.height * r.width * r.n_images for r in i)


def test_resize_and_frame_sample_pipelines(spark, sf_dir):
    """Spot-check the two kernel-pipeline queries against a pure-numpy
    rebuild for a handful of docs (the oracle gate checks all rows;
    this pins the kernels against an INDEPENDENT derivation)."""
    import hashlib

    from petastorm_spark.queries_llm import (
        _md5_values,
        image_resize_pipeline,
        video_frame_sample,
    )

    rs = {r.doc_id: r.resized_sum
          for r in image_resize_pipeline(spark, sf_dir).collect()}
    for d in (0, 7, 123):
        h, w = 6 + d % 3, 12 + d % 5
        img = _md5_values(d, "r", 8).ravel()[: h * w].reshape(h, w)
        ys = (np.arange(4) * h) // 4
        xs = (np.arange(4) * w) // 4
        assert rs[d] == int(img[np.ix_(ys, xs)].sum())

    fs = {r.doc_id: (r.n_kept, r.frame_sum)
          for r in video_frame_sample(spark, sf_dir).collect()}
    for d in (0, 7, 123):
        T = 13 + d % 7
        kept = list(range(0, T, 3))
        total = sum(
            int(np.frombuffer(
                hashlib.md5(f"{d}_v{t}".encode()).digest()[:4], dtype=np.uint8
            ).astype(np.int64).sum())
            for t in kept
        )
        assert fs[d] == (len(kept), total)


def test_bitext_margin_demotes_hub(spark):
    """The point of margin scoring: a hub target (similar to EVERY
    source) has the highest raw cosine but a high backward mean, so
    the specific target wins the margin — mined pair != argmax cosine."""
    from petastorm_spark.operators.similarity import bitext_margin_mine

    src = arrow_local_df(
        spark,
        {"vec_id": [0, 2, 4],
         "embedding": [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]},
        "vec_id bigint, embedding array<double>",
    )
    tgt = arrow_local_df(
        spark,
        {"vec_id": [1, 3],  # 1 = hub, 3 = specific
         "embedding": [[0.9, 0.6, 0.6, 0], [0.7, 0, 0, 0.7]]},
        "vec_id bigint, embedding array<double>",
    )
    out = bitext_margin_mine(
        src, tgt, src.where(F.col("vec_id") == 0), k=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src_id, r.tgt_id) == (0, 3)  # specific wins...
    hub_cos = 0.9 / np.sqrt(0.9**2 + 0.6**2 + 0.6**2)
    assert r.cos_sim < round(hub_cos, 4)  # ...despite lower raw cosine
    assert r.margin > 1.0


def test_image_dhash_streaming_twin(spark, sf_dir, tmp_path_factory):
    """Multimodal fingerprints are pure per-row maps, so they compose
    onto a readStream feed unchanged: availableNow over a directory of
    image blobs emits exactly the batch path's dhash values — the
    online half of a continuously-ingested near-dup index."""
    from petastorm_spark.operators.multimodal import image_dhash
    from petastorm_spark.queries_llm import _md5_values
    from petastorm_spark.streaming.feed import stream_dataset

    def gen(batches):
        import pandas as pd

        from petastorm_spark.operators.multimodal import encode_fake_image

        for pdf in batches:
            imgs = [
                encode_fake_image(
                    _md5_values(int(d), "", 5).ravel()[:66]
                    .reshape(6, 11).astype("uint8")
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "image": imgs})

    d = str(tmp_path_factory.mktemp("imgstream") / "imgs")
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .mapInPandas(gen, "doc_id bigint, image binary")
    )
    base.write.parquet(d)

    qy = (
        image_dhash(stream_dataset(spark, d), "image")
        .select("doc_id", "dhash")
        .writeStream.format("memory")
        .queryName("dhash_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    got = {
        (r.doc_id, r.dhash)
        for r in spark.sql("SELECT * FROM dhash_stream").collect()
    }
    want = {
        (r.doc_id, r.dhash)
        for r in image_dhash(spark.read.parquet(d), "image")
        .select("doc_id", "dhash").collect()
    }
    assert got == want and got


def test_incremental_semantic_dedup_persisted_index(
    spark, corpus, tmp_path_factory
):
    """The growing-corpus lifecycle: build -> write -> read ->
    incremental dedup against the persisted index (plan prunes to the
    batch's probed cells), then append the survivors; a duplicate-id
    append is refused."""
    import re

    from petastorm_spark.operators.similarity import (
        incremental_semantic_dedup,
        ivf_append,
        ivf_build,
        ivf_read,
        ivf_write,
    )

    url = str(tmp_path_factory.mktemp("ivfinc") / "idx")
    cent, assigned = ivf_build(corpus, "vec_id", "embedding", n_cells=8)
    ivf_write(url, cent, assigned)
    cent2, assigned2 = ivf_read(spark, url)

    new = corpus.where(F.col("vec_id") < 6).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    out = incremental_semantic_dedup(
        new, cent2, assigned2, threshold=0.95
    )
    got = {(r.new_id, r.old_id): r.cos for r in out.collect()}
    # each re-issued vector matches its original at cos 1.0
    for i in range(6):
        assert got[(i + 10_000, i)] == 1.0
    # the persisted scan prunes to the probed cells
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1)

    # in-memory and persisted paths agree row for row
    mem = {
        (r.new_id, r.old_id): r.cos
        for r in incremental_semantic_dedup(
            new, cent, assigned, threshold=0.95
        ).collect()
    }
    assert got == mem

    # append survivors (assigned against the INDEX'S OWN centroids);
    # re-appending the same ids is refused
    assert ivf_append(spark, url, new) == 6
    with pytest.raises(ValueError, match="already indexed"):
        ivf_append(spark, url, new)


def test_incremental_semantic_dedup_streaming_twin(
    spark, corpus, tmp_path_factory
):
    """Continuous-ingest shape: a readStream feed of new vectors
    deduped against the static index emits exactly the batch path's
    matches (availableNow == batch) — assignment is a pure per-row
    map and the index join is a stream-static equi-join, so the
    operator composes onto Structured Streaming unchanged."""
    from petastorm_spark.operators.similarity import (
        incremental_semantic_dedup,
        ivf_build,
    )
    from petastorm_spark.streaming.feed import stream_dataset

    cent, assigned = ivf_build(corpus, "vec_id", "embedding", n_cells=8)
    new = corpus.where(F.col("vec_id") < 6).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    d = str(tmp_path_factory.mktemp("semstream") / "vecs")
    new.write.parquet(d)

    qy = (
        incremental_semantic_dedup(
            stream_dataset(spark, d), cent, assigned, threshold=0.95,
            prune_cells=False,  # probed-cell collect() needs a batch plan
        )
        .writeStream.format("memory")
        .queryName("sem_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    got = {
        (r.new_id, r.old_id, r.cos)
        for r in spark.sql("SELECT * FROM sem_stream").collect()
    }
    want = {
        (r.new_id, r.old_id, r.cos)
        for r in incremental_semantic_dedup(
            spark.read.parquet(d), cent, assigned, threshold=0.95
        ).collect()
    }
    assert got == want and got


def test_bitext_mine_index_swappable(spark, corpus):
    """The margin algebra is search-strategy agnostic: plugging the
    IVF top-k in via topk_fn yields the same mined pairs as exact
    search whenever the approximate shortlists agree (high n_probe ->
    full agreement on this fixture)."""
    from functools import partial

    from petastorm_spark.operators.similarity import (
        bitext_margin_mine,
        cosine_topk_ivf,
    )

    src = corpus.where(F.col("vec_id") % 2 == 0)
    tgt = corpus.where(F.col("vec_id") % 2 == 1)
    q = src.where(F.col("vec_id") < 12)
    exact = {
        (r.src_id, r.tgt_id, r.margin)
        for r in bitext_margin_mine(src, tgt, q, k=3).collect()
    }
    via_ivf = {
        (r.src_id, r.tgt_id, r.margin)
        for r in bitext_margin_mine(
            src, tgt, q, k=3,
            topk_fn=partial(cosine_topk_ivf, n_cells=4, n_probe=4),
        ).collect()
    }
    assert via_ivf == exact and exact  # n_probe == n_cells -> exhaustive


def test_round10_query_plans_never_cartesian(spark, sf_dir):
    """Plan-shape pins for the round's new queries: the pair joins are
    equi-joins on band/cell keys and the only broadcast cross joins
    are bounded small sides — no unbounded CartesianProduct anywhere."""
    from petastorm_spark import queries_llm

    for qname in (
        "image_dhash_pairs",
        "audio_dup_pairs",
        "video_dup_pairs",
        "dedup_semantic_incremental",
    ):
        df = getattr(queries_llm, qname)(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, qname


def test_winnowing_guarantee_and_density(spark):
    """The winnowing contract (Schleimer et al. Thm 1): any shared
    substring of >= k + w - 1 tokens yields at least one SHARED
    selected fingerprint, while selection density stays well below 1.
    Two otherwise-disjoint documents share exactly one 6-token run."""
    from petastorm_spark.operators.dedup import winnow_fingerprints

    shared = "zeta eta theta iota kappa lambda"  # 6 tokens = k + w - 1
    docs = arrow_local_df(
        spark,
        {
            "doc_id": [1, 2],
            "text": [
                "alpha beta gamma " + shared + " delta epsilon",
                "one two three four " + shared + " five six seven",
            ],
        },
        "doc_id bigint, text string",
    )
    sel = winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)
    rows = sel.collect()
    by_doc = {1: set(), 2: set()}
    for r in rows:
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[1] & by_doc[2]  # the guarantee
    # density: far fewer selections than k-grams (the point of MOSS)
    n_kgrams_1 = len(docs.collect()[0].text.split()) - 2
    assert len([r for r in rows if r.doc_id == 1]) < n_kgrams_1


def test_webdataset_roundtrip_and_byte_stability(spark, tmp_path_factory):
    """The tar-shard sink: binary columns become {key}.{col} entries,
    scalars gather into {key}.json, shards stream one tar per distinct
    shard value, and output bytes are a pure function of the rows
    (zeroed mtimes + sorted keys) — two writes produce identical
    tars. read_webdataset inverts the layout."""
    import hashlib
    import json as _json
    import os

    from petastorm_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = arrow_local_df(
        spark,
        {
            "sample_id": [3, 1, 2, 4],
            "shard": [0, 0, 1, 1],
            "image": [b"\x89PNGx", b"raw", None, b"zz"],
            "label": ["cat", "dog", "bird", "fish"],
        },
        "sample_id bigint, shard int, image binary, label string",
    )
    d1 = str(tmp_path_factory.mktemp("wds") / "out1")
    d2 = str(tmp_path_factory.mktemp("wds") / "out2")
    assert write_webdataset(df, d1, "sample_id") == 2
    assert write_webdataset(df, d2, "sample_id") == 2
    for name in ("shard-000000.tar", "shard-000001.tar"):
        h1 = hashlib.md5(open(os.path.join(d1, name), "rb").read()).hexdigest()
        h2 = hashlib.md5(open(os.path.join(d2, name), "rb").read()).hexdigest()
        assert h1 == h2  # byte-stable artifacts

    back = read_webdataset(spark, d1).collect()
    rows = {(r.key, r.column): bytes(r.payload) for r in back}
    assert rows[("3", "image")] == b"\x89PNGx"
    assert ("3", "json") in rows and ("2", "image") not in rows  # null skipped
    meta = {k[0]: _json.loads(v) for k, v in rows.items() if k[1] == "json"}
    assert meta["1"] == {"label": "dog"} and len(meta) == 4


def test_compact_preserves_cell_partitioning(spark, corpus, tmp_path_factory):
    """Compacting an append-heavy IVF index with partition_by keeps
    the hive layout (one file per cell, pruning intact) and identical
    query results; this is the maintenance pass ivf_append points at."""
    import glob
    import re

    from petastorm_spark.etl.compact import compact_dataset
    from petastorm_spark.operators.similarity import (
        ivf_append,
        ivf_build,
        ivf_query,
        ivf_read,
        ivf_write,
    )

    url = str(tmp_path_factory.mktemp("ivfcompact") / "idx")
    base = corpus.where(F.col("vec_id") < 80)
    cent, assigned = ivf_build(base, "vec_id", "embedding", n_cells=4)
    ivf_write(url, cent, assigned)
    for lo, hi in ((80, 100), (100, 120)):  # two appends -> small files
        ivf_append(
            spark, url,
            corpus.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
        )

    out = str(tmp_path_factory.mktemp("ivfcompact") / "cells2")
    compact_dataset(spark, url + "/cells", out, partition_by=["cell"])
    per_cell = {
        d: len(glob.glob(f"{d}/*.parquet"))
        for d in glob.glob(f"{out}/cell=*")
    }
    assert per_cell and all(n == 1 for n in per_cell.values())

    cent2, _ = ivf_read(spark, url)
    compacted = spark.read.parquet(out)
    q = corpus.where(F.col("vec_id") >= 110)  # appended vectors as queries
    res = ivf_query(cent2, compacted, q, k=3, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1)  # pruning survives compaction
    orig = ivf_query(cent2, spark.read.parquet(url + "/cells"), q, k=3, n_probe=2)
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, orig.collect()))


def test_webdataset_to_frame_pivot(spark, tmp_path_factory):
    from petastorm_spark.sources.webdataset import (
        read_webdataset,
        webdataset_to_frame,
        write_webdataset,
    )

    df = arrow_local_df(
        spark,
        {"sample_id": [1, 2], "shard": [0, 0],
         "image": [b"a", b"b"], "label": ["x", "y"]},
        "sample_id bigint, shard int, image binary, label string",
    )
    d = str(tmp_path_factory.mktemp("wdsf") / "out")
    write_webdataset(df, d, "sample_id")
    wide = webdataset_to_frame(read_webdataset(spark, d))
    rows = {r.key: r for r in wide.collect()}
    assert bytes(rows["1"].image) == b"a"
    assert b'"label": "x"' in bytes(rows["1"].json)
    assert set(wide.columns) == {"key", "image", "json"}
