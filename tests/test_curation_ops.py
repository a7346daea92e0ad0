"""Temperature sampling, incremental dedup, unigram log-prob."""

import math

import pytest
from pyspark.sql import functions as F

from petastorm_spark.operators.dedup import incremental_dedup
from petastorm_spark.operators.sampling_extra import (
    sample_temperature,
    unigram_logprob,
)


def test_sample_temperature_flattens(spark):
    # 3 sources: 1000 / 250 / 40 rows. alpha=0.5 keeps the smallest
    # whole and downsamples larger ones toward sqrt proportions.
    rows = (
        [(i, "big") for i in range(1000)]
        + [(10_000 + i, "mid") for i in range(250)]
        + [(20_000 + i, "small") for i in range(40)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sample_temperature(df, "source", "doc_id", alpha=0.5, seed=0)
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["small"] == 40  # smallest stratum kept in full
    # expected keep rates: (n/40)^-0.5 -> big 0.2, mid 0.4
    assert 0.12 <= by_src["big"] / 1000 <= 0.28
    assert 0.28 <= by_src["mid"] / 250 <= 0.52
    # key-stable: same result on rerun
    again = {r["source"]: r["n"] for r in sample_temperature(df, "source", "doc_id", alpha=0.5, seed=0).groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == by_src


def test_sample_temperature_alpha_one_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(100)], ["doc_id", "source"]
    )
    assert sample_temperature(df, "source", "doc_id", alpha=1.0).count() == 100


def test_incremental_dedup_drops_seen_and_batch_dups(spark):
    store = spark.createDataFrame(
        [("seen one",), ("seen two",)], ["text"]
    ).select(F.md5("text").alias("digest"))
    batch = spark.createDataFrame(
        [
            (1, "seen one"),   # already in store -> dropped
            (2, "fresh a"),
            (3, "fresh b"),
            (4, "fresh a"),    # intra-batch dup -> keep min id (2)
            (5, "seen two"),   # dropped
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        r.doc_id
        for r in incremental_dedup(batch, store, "text", "doc_id").collect()
    )
    assert got == [2, 3]


def test_incremental_dedup_empty_store_is_exact_dedup(spark):
    store = spark.createDataFrame([], "digest string")
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["doc_id", "text"]
    )
    got = sorted(
        r.doc_id
        for r in incremental_dedup(batch, store, "text", "doc_id").collect()
    )
    assert got == [1, 3]


def test_unigram_logprob_matches_hand_computation(spark):
    # corpus: doc1 = "a a b", doc2 = "b c". counts: a=2 b=2 c=1, total 5
    df = spark.createDataFrame([(1, "a a b"), (2, "b c")], ["doc_id", "text"])
    got = {r.doc_id: (r.n_tokens, r.logprob) for r in unigram_logprob(df, "text", "doc_id").collect()}
    lp = lambda c: math.log(c / 5)  # noqa: E731
    exp1 = round((2 * lp(2) + lp(2)) / 3, 4)
    exp2 = round((lp(2) + lp(1)) / 2, 4)
    assert got[1] == (3, pytest.approx(exp1, abs=1e-4))
    assert got[2] == (2, pytest.approx(exp2, abs=1e-4))
    # rarer tokens -> lower score
    assert got[2][1] < got[1][1]


def test_keep_top_frac_rank_cut_and_ties(spark):
    from petastorm_spark.operators.sampling_extra import keep_top_frac

    rows = [
        ("a", 1, 0.9), ("a", 2, 0.7), ("a", 3, 0.5), ("a", 4, 0.3), ("a", 5, 0.1),
        ("b", 6, 0.4), ("b", 7, 0.4),  # tie: lower id ranks first
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "q"])
    kept = keep_top_frac(df, "source", "q", "doc_id", 0.5)
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}
    # group a: ceil(0.5*5)=3 -> top three scores; group b: ceil(0.5*2)=1
    assert got == {("a", 1), ("a", 2), ("a", 3), ("b", 6)}
    # full columns preserved, helper columns dropped
    assert set(kept.columns) == {"source", "doc_id", "q"}
    with pytest.raises(ValueError):
        keep_top_frac(df, "source", "q", "doc_id", 0.0)


def test_edit_distance_pairs_lsh_then_verify(spark):
    from petastorm_spark.operators.dedup import edit_distance_pairs

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu one two three four")
    mutated = base.replace("papa", "pafa")  # 1-char edit mid-document
    other = ("red orange yellow green blue indigo violet cyan magenta black "
             "white gray pink brown maroon olive navy teal lime aqua "
             "silver gold bronze copper iron zinc lead tin mercury nickel")
    df = spark.createDataFrame(
        [(1, base), (2, mutated), (3, other)], ["doc_id", "text"]
    )
    out = edit_distance_pairs(
        df, "text", "doc_id", max_dist=5, num_hashes=16, bands=8
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in out}
    assert pairs == {(1, 2): 1}


def test_curate_corpus_excise_and_rank_floor_stages(spark):
    from petastorm_spark.operators.pipeline import curate_corpus, curation_report

    rows = []
    # boilerplate-bearing docs across two sources
    for i in range(6):
        rows.append((i, f"legal header boilerplate block unique tail {i} "
                        "the a of to and in is it on for", "web"))
    for i in range(6, 10):
        rows.append((i, f"clean document {i} with the a of to and in is it "
                        f"plainly unique words number {i}", "books"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    stages = curate_corpus(
        df, "text", "doc_id",
        strata_col="source",
        quality_frac=0.5,
        excise_spans=True,
        excise_min_count=4,
    )
    assert list(stages) == ["input", "dedup", "excised", "quality", "capped", "output"]
    exc = {r["doc_id"]: r["text"] for r in stages["excised"].collect()}
    # every corpus-frequent span is gone (the shared header AND the
    # shared stopword run); only each doc's unique number survives
    assert all("legal header boilerplate" not in t for t in exc.values())
    assert exc[0] == "0" and exc[7] == "clean document 7 7"
    # rank floor keeps ceil(0.5*n) per source
    q = stages["quality"].groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in q}
    assert got == {"web": 3, "books": 2}
    rep = curation_report(stages).collect()
    assert [r["stage"] for r in sorted(rep, key=lambda r: r["stage_idx"])] == [
        "input", "dedup", "excised", "quality", "capped", "output"
    ]


def test_curate_corpus_lm_floor_stage(spark):
    """The CCNet-style LM gate: docs scored against a frozen reference
    model; in-distribution docs survive, word-salad (every bigram hits
    the unknown-word backoff floor) is dropped; attrition reported."""
    from petastorm_spark.operators.pipeline import curate_corpus, curation_report
    from petastorm_spark.operators.text import bigram_lm_score

    model = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat and the dog sat too") for i in range(3)],
        ["doc_id", "text"],
    )
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),        # in-distribution
            (2, "zq xv qqk wplj zzt mmo pqr ab"),  # word salad, all OOV
        ],
        ["doc_id", "text"],
    )
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_lm_score(df, "text", "doc_id", model_df=model).collect()
    }
    assert scores[1] > scores[2]
    floor = (scores[1] + scores[2]) / 2
    stages = curate_corpus(
        df, "text", "doc_id",
        quality_floor=0.0, lm_floor=floor, lm_model_df=model,
    )
    assert list(stages) == [
        "input", "dedup", "quality", "lm", "capped", "output"
    ]
    assert [r["doc_id"] for r in stages["lm"].collect()] == [1]
    rep = {
        r["stage"]: r["n_rows"] for r in curation_report(stages).collect()
    }
    assert rep["quality"] == 2 and rep["lm"] == 1 and rep["output"] == 1


def test_sample_weighted_biases_and_is_stable(spark):
    from petastorm_spark.operators.sampling_extra import sample_weighted

    # two weight classes: heavy rows (w=100) vastly outdraw light (w=1)
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = sample_weighted(df, "w", "doc_id", k=50)
    assert kept.count() == 50
    heavy = kept.where("doc_id < 50").count()
    assert heavy >= 35  # heavy class dominates the sample
    # deterministic: identical membership on rerun
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in sample_weighted(df, "w", "doc_id", k=50).collect())
    assert a == b
    # zero/negative weights never sampled
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], ["doc_id", "w"])
    assert [r.doc_id for r in sample_weighted(df2, "w", "doc_id", k=3).collect()] == [3]
    with pytest.raises(ValueError):
        sample_weighted(df, "w", "doc_id", k=0)


def test_token_psi_detects_shift_and_is_zero_for_identical(spark):
    from pyspark.sql import functions as F

    from petastorm_spark.operators.text import token_psi

    a = spark.createDataFrame(
        [(1, "alpha alpha alpha beta"), (2, "alpha beta beta gamma")],
        ["doc_id", "text"],
    )
    # identical corpora -> every psi term (floored at 1e-6) is ~0
    same = token_psi(a, a, "text").agg(F.sum("psi_term").alias("s")).collect()[0]["s"]
    assert abs(same) < 1e-4
    # shifted corpus: 'delta' floods side b
    b = spark.createDataFrame(
        [(1, "delta delta delta delta delta delta"), (2, "alpha beta")],
        ["doc_id", "text"],
    )
    shifted = token_psi(a, b, "text").agg(F.sum("psi_term").alias("s")).collect()[0]["s"]
    assert shifted > 0.25  # action threshold
    # every term is non-negative by construction
    assert all(
        r["psi_term"] >= -1e-6 for r in token_psi(a, b, "text").collect()
    )


def test_bigram_logprob_flags_word_salad(spark):
    import math

    from petastorm_spark.operators.sampling_extra import bigram_logprob

    # natural docs repeat transitions; the salad doc uses the same
    # tokens in transitions never seen elsewhere
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the cat sat on the mat"),
        (4, "mat the on sat cat the"),  # scrambled: same unigrams
        (5, "x"),                        # < 2 tokens: dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_logprob(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_bigrams"] == 5
    # scrambled doc scores strictly worse than every natural doc
    assert out[4]["logprob"] < min(out[i]["logprob"] for i in (1, 2, 3)) - 0.3
    # hand-check one transition: c('the cat')=3, c('the')=6... all docs
    # with >=2 tokens count; spot value is finite and negative
    assert math.isfinite(out[1]["logprob"]) and out[1]["logprob"] < 0


def test_token_count_bpe_counts_punctuation_runs(spark):
    from petastorm_spark.operators.text import token_count, token_count_bpe

    df = spark.createDataFrame(
        [
            (1, "plain words here"),                 # ws 3 / bpe 3
            (2, "def f(x): return x+1  # comment"),  # code: bpe >> ws
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count("text").alias("ws"),
            token_count_bpe("text").alias("bpe"),
        ).collect()
    }
    assert out[1] == (3, 3)
    ws2, bpe2 = out[2]
    assert ws2 == 6 and bpe2 > ws2  # punctuation splits inflate BPE count


def test_negative_pairs_deterministic_and_never_self(spark):
    from petastorm_spark.operators.sampling_extra import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    out = negative_pairs(df, "doc_id", k=3, seed=0).collect()
    assert all(r["id_a"] != r["id_b"] for r in out)
    # at most one partner per (id, draw)
    keys = [(r["id_a"], r["draw"]) for r in out]
    assert len(keys) == len(set(keys))
    # most draws pair (buckets average 2 members)
    assert len(out) > 200 * 3 * 0.5
    # key-stable across runs
    again = negative_pairs(df, "doc_id", k=3, seed=0).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed gives a different pairing
    other = negative_pairs(df, "doc_id", k=3, seed=1).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
    import pytest

    with pytest.raises(ValueError):
        negative_pairs(df, "doc_id", k=0)


def test_approx_quantiles_sampled_accuracy_and_stability(spark):
    from petastorm_spark.operators.sampling_extra import approx_quantiles_sampled

    # uniform 0..9999 in one group: true p50 = ~5000
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(10000)], ["id", "grp", "v"]
    )
    est = approx_quantiles_sampled(
        df, "grp", "v", "id", probs=[0.5], k=256
    ).collect()[0]["p_0_5"]
    assert abs(est - 5000) / 5000 < 0.15  # ~1/sqrt(256) deviation
    # deterministic
    again = approx_quantiles_sampled(
        df, "grp", "v", "id", probs=[0.5], k=256
    ).collect()[0]["p_0_5"]
    assert est == again
