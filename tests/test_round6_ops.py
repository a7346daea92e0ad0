"""Tests for the round-6 additions: CCNet perplexity buckets, DSIR
importance weights, TF-IDF keywords, Z-order layout."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# perplexity_buckets
# ---------------------------------------------------------------------------


def test_perplexity_buckets_thirds_and_order(spark):
    from petastorm_spark.operators.sampling_extra import perplexity_buckets

    # 9 docs in one stratum: natural text ranks above repeated-rare-token
    # strings under the corpus's own unigram LM
    rows = [Row(doc_id=i, text="the cat sat on the mat " * 3, lang="en") for i in range(6)]
    rows += [Row(doc_id=6 + i, text=f"zzz{i} qqq{i} vvv{i} www{i}", lang="en") for i in range(3)]
    df = spark.createDataFrame(rows)
    out = perplexity_buckets(df, "text", "doc_id", "lang").collect()
    assert len(out) == 9
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    # ceil(9/3)=3 per bucket exactly
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3
    }
    # every head logprob >= every tail logprob
    assert min(r.logprob for r in by_bucket["head"]) >= max(
        r.logprob for r in by_bucket["tail"]
    )
    # the rare-token docs land in the tail
    assert {r.doc_id for r in by_bucket["tail"]} == {6, 7, 8}


def test_perplexity_buckets_strata_independent(spark):
    from petastorm_spark.operators.sampling_extra import perplexity_buckets

    rows = [Row(doc_id=i, text="a b c d e", lang="en") for i in range(4)]
    rows += [Row(doc_id=10 + i, text="x y z w v", lang="fr") for i in range(2)]
    df = spark.createDataFrame(rows)
    out = perplexity_buckets(df, "text", "doc_id", "lang").collect()
    fr = [r for r in out if r.lang == "fr"]
    # 2-doc stratum: ceil(2/3)=1 head, ceil(4/3)=2 -> 1 middle, 0 tail
    assert sorted(r.bucket for r in fr) == ["head", "middle"]


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def test_dsir_weights_separates_target_like_docs(spark):
    from petastorm_spark.operators.sampling_extra import dsir_weights

    # target slice speaks "alpha beta", the rest speaks "gamma delta";
    # held-out docs resembling the target must score higher
    rows = [Row(doc_id=i, text="alpha beta alpha beta", grp="target") for i in range(5)]
    rows += [Row(doc_id=10 + i, text="gamma delta gamma delta", grp="raw") for i in range(5)]
    rows += [Row(doc_id=20, text="alpha beta", grp="probe_t")]
    rows += [Row(doc_id=21, text="gamma delta", grp="probe_r")]
    df = spark.createDataFrame(rows)
    # n_buckets small relative to the toy corpus so the +0.5 smoothing
    # mass doesn't drown the real counts (at corpus scale the default
    # 1024 buckets are each heavily loaded and this is a non-issue)
    out = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(
            df, "text", "doc_id", F.col("grp") == "target", n_buckets=64
        ).collect()
    }
    assert out[20] > 0 > out[21]
    assert out[20] > out[21]


def test_dsir_weights_hand_computed_single_bucket(spark):
    from petastorm_spark.operators.sampling_extra import dsir_weights

    # n_buckets=1 collapses every token into one feature: the ratio is
    # (nt+0.5)/(nt+0.5) / ((nr+0.5)/(nr+0.5)) = 1 -> ln = 0 for all docs
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b c", t=True), Row(doc_id=1, text="d e", t=False)]
    )
    out = dsir_weights(df, "text", "doc_id", F.col("t"), n_buckets=1).collect()
    assert all(abs(r.dsir_logweight) < 1e-9 for r in out)
    assert {r.doc_id: r.n_tokens for r in out} == {0: 3, 1: 2}


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_ranks_rare_terms_above_universal(spark):
    from petastorm_spark.operators.text import tfidf_top_terms

    # 'common' appears in every doc (idf floor = 1); each doc's unique
    # term, at the same tf, outranks it on idf
    rows = [Row(doc_id=i, text=f"common uniq{i} uniq{i}") for i in range(4)]
    df = spark.createDataFrame(rows)
    out = tfidf_top_terms(df, "text", "doc_id", k=1).collect()
    assert len(out) == 4
    for r in out:
        assert r.term == f"uniq{r.doc_id}"
        assert r.rank == 1
    # hand-check the score: tf=2, idf = ln(5/2)+1
    expect = math.floor(2 * (math.log(5 / 2) + 1) * 10000) / 10000
    assert all(abs(r.tfidf - expect) < 1e-9 for r in out)


def test_tfidf_k_and_tie_break(spark):
    from petastorm_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame([Row(doc_id=0, text="b a b a c")])
    out = tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    # single doc: every term has identical idf; tf(a)=tf(b)=2 > tf(c);
    # tie between a and b breaks alphabetically
    assert [(r.term, r.rank) for r in sorted(out, key=lambda r: r.rank)] == [
        ("a", 1), ("b", 2)
    ]
    with pytest.raises(ValueError):
        tfidf_top_terms(df, "text", "doc_id", k=0)


# ---------------------------------------------------------------------------
# zorder layout
# ---------------------------------------------------------------------------


def _morton_ref(vals, bits):
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_value_matches_reference_interleave(spark):
    from petastorm_spark.operators.layout import zorder_value

    rows = [Row(x=x, y=y) for x in [0, 1, 5, 1023] for y in [0, 2, 7, 1023]]
    df = spark.createDataFrame(rows)
    out = df.withColumn("z", zorder_value(["x", "y"], bits=10)).collect()
    for r in out:
        assert r.z == _morton_ref([r.x, r.y], 10), (r.x, r.y)


def test_zorder_value_sql_parity(spark):
    import duckdb

    from petastorm_spark.operators.layout import zorder_value_sql

    con = duckdb.connect()
    expr = zorder_value_sql(["x", "y"], bits=10)
    got = con.sql(
        f"SELECT {expr} AS z FROM (SELECT 5 AS x, 7 AS y)"
    ).fetchone()[0]
    assert got == _morton_ref([5, 7], 10)


def test_zorder_value_validates_args(spark):
    from petastorm_spark.operators.layout import zorder_value

    with pytest.raises(ValueError):
        zorder_value(["x"], bits=10)
    with pytest.raises(ValueError):
        zorder_value(["x", "y"], bits=32)  # 64 bits > signed range


def test_zorder_repartition_tightens_file_boxes(spark, tmp_path):
    """The point of z-ordering: after a z-ordered write, each file's
    (min,max) box on EVERY interleaved dimension is small, so parquet
    stats prune scans on either column. Compare total box width
    against a round-robin layout of the same data."""
    from petastorm_spark.operators.layout import zorder_value, zorder_repartition

    n, bits, parts = 4096, 6, 8
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        F.expr("id div 64").alias("y"),
    )
    z = zorder_value(["x", "y"], bits=bits)

    def boxes(sdf, path):
        sdf.write.mode("overwrite").parquet(str(path))
        stats = (
            spark.read.parquet(str(path))
            .groupBy(F.input_file_name())
            .agg(
                (F.max("x") - F.min("x")).alias("wx"),
                (F.max("y") - F.min("y")).alias("wy"),
            )
            .collect()
        )
        return sum(r.wx + r.wy for r in stats) / len(stats)

    zw = boxes(zorder_repartition(df, z, parts), tmp_path / "zorder")
    rw = boxes(df.repartition(parts), tmp_path / "roundrobin")
    # round-robin files each span ~the full 63+63 range; z-ordered
    # files cover a fraction of it
    assert zw < rw / 2, (zw, rw)


# ---------------------------------------------------------------------------
# global rank / equi-depth histogram / ntile
# ---------------------------------------------------------------------------


def test_global_rank_matches_single_window(spark):
    from pyspark.sql import Window

    from petastorm_spark.operators.rank import global_rank

    df = spark.range(1000).select(
        ((F.col("id") * 2654435761) % 997).alias("v"), F.col("id")
    ).repartition(7)
    got = global_rank(df, ["v", "id"], rank_col="r")
    want = df.withColumn(
        "r_ref", F.row_number().over(Window.orderBy("v", "id"))
    )
    diff = got.join(want, ["v", "id"]).where(F.col("r") != F.col("r_ref"))
    assert diff.count() == 0
    assert got.count() == 1000


def test_histogram_equidepth_balanced_and_ordered(spark):
    from petastorm_spark.operators.rank import histogram_equidepth

    df = spark.range(1003).select(F.col("id").alias("v"), F.col("id"))
    h = sorted(
        histogram_equidepth(df, "v", ["id"], n_bins=8).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in h] == list(range(8))
    # equal depth +-1
    assert max(r.n_rows for r in h) - min(r.n_rows for r in h) <= 1
    assert sum(r.n_rows for r in h) == 1003
    # bins tile the value range in order without overlap
    for a, b in zip(h, h[1:]):
        assert a.hi < b.lo


def test_global_ntile_matches_sql_ntile(spark):
    from pyspark.sql import Window

    from petastorm_spark.operators.rank import global_ntile

    df = spark.range(103).select(
        ((F.col("id") * 48271) % 1009).alias("v"), F.col("id")
    ).repartition(5)
    got = global_ntile(df, ["v", "id"], n=7, tile_col="t")
    want = df.withColumn("t_ref", F.ntile(7).over(Window.orderBy("v", "id")))
    diff = got.join(want, ["v", "id"]).where(F.col("t") != F.col("t_ref"))
    assert diff.count() == 0


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_keeps_clusters_together(spark):
    from petastorm_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(200)]
    )
    # chain pairs: (0,1), (2,3), ... 50 two-doc clusters
    pairs = spark.createDataFrame(
        [Row(id_a=2 * i, id_b=2 * i + 1) for i in range(50)]
    )
    out = leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    split_of = {r.doc_id: r.split for r in out}
    for i in range(50):
        assert split_of[2 * i] == split_of[2 * i + 1], i
    # singletons keyed on themselves, all three splits materialize
    assert {r.split for r in out} == {"train", "val", "test"}
    # rough mass check on 200 docs
    n_train = sum(1 for s in split_of.values() if s == "train")
    assert 120 <= n_train <= 190


def test_leakage_safe_split_validates_weights(spark):
    import pytest as _pytest

    from petastorm_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame([Row(doc_id=0, text="x")])
    pairs = spark.createDataFrame([Row(id_a=0, id_b=0)])
    with _pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, "doc_id", {"train": 0.5, "val": 0.1})


# ---------------------------------------------------------------------------
# corr_matrix_exact
# ---------------------------------------------------------------------------


def test_corr_matrix_exact_hand_values(spark):
    import numpy as np

    from petastorm_spark.operators.diagnostics import corr_matrix_exact

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 6.0, 8.0, 10.0]      # perfectly correlated
    zs = [5.0, 3.0, 4.0, 1.0, 2.0]       # anything else
    df = spark.createDataFrame(
        [Row(a=x, b=y, c=z) for x, y, z in zip(xs, ys, zs)]
    )
    out = corr_matrix_exact(df, {"a": 0, "b": 0, "c": 0}).collect()[0]
    assert abs(out["corr_a_b"] - 1.0) < 1e-9
    ref = float(np.corrcoef(xs, zs)[0, 1])
    assert abs(out["corr_a_c"] - (math.floor(ref * 1e6) / 1e6)) < 1e-6


def test_corr_matrix_exact_constant_column_is_null(spark):
    from petastorm_spark.operators.diagnostics import corr_matrix_exact

    df = spark.createDataFrame([Row(a=1.0, b=float(i)) for i in range(5)])
    out = corr_matrix_exact(df, {"a": 0, "b": 0}).collect()[0]
    assert out["corr_a_b"] is None


# ---------------------------------------------------------------------------
# dsir_score_stream
# ---------------------------------------------------------------------------


def test_dsir_stream_matches_batch_twin(spark, sf_dir, tmp_path_factory):
    """dsir_score_stream (broadcast ratio table + update-mode agg) over
    a static dir must reproduce dsir_weights exactly."""
    from petastorm_spark.operators.sampling_extra import (
        dsir_bucket_ratios,
        dsir_weights,
    )
    from petastorm_spark.streaming.feed import dsir_score_stream, stream_dataset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    is_target = F.col("source").isin("src0", "src1")
    d = str(tmp_path_factory.mktemp("dsir") / "docs")
    docs.coalesce(1).write.parquet(d)

    ratio = dsir_bucket_ratios(docs, "text", is_target)
    q = (
        dsir_score_stream(
            stream_dataset(spark, d).select("doc_id", "text"),
            ratio, "text", "doc_id",
        )
        .writeStream.format("memory")
        .queryName("dsir_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        r.doc_id: (r.n_tokens, r.dsir_logweight)
        for r in spark.sql("SELECT * FROM dsir_out").collect()
    }
    batch_rows = {
        r.doc_id: (r.n_tokens, r.dsir_logweight)
        for r in dsir_weights(docs, "text", "doc_id", is_target).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_grouped_rank_matches_grouped_window(spark):
    from pyspark.sql import Window

    from petastorm_spark.operators.rank import grouped_rank

    df = spark.range(900).select(
        (F.col("id") % 4).alias("g"),
        ((F.col("id") * 2654435761) % 997).alias("v"),
        F.col("id"),
    ).repartition(7)
    got = grouped_rank(df, ["g"], ["v", "id"], rank_col="r", count_col="n")
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("r_ref", F.row_number().over(w)).withColumn(
        "n_ref", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    diff = got.join(want, ["g", "v", "id"]).where(
        (F.col("r") != F.col("r_ref")) | (F.col("n") != F.col("n_ref"))
    )
    assert diff.count() == 0
    assert got.count() == 900


# ---------------------------------------------------------------------------
# normalize_text / hard negatives / recall report
# ---------------------------------------------------------------------------


def test_normalize_text_collapses_disguised_copies(spark):
    from petastorm_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            Row(id=0, text="Hello,  World!"),
            Row(id=1, text="hello world"),
            Row(id=2, text="HELLO--WORLD?!"),
            Row(id=3, text="goodbye world"),
        ]
    )
    out = df.select("id", normalize_text("text").alias("t")).collect()
    t = {r.id: r.t for r in out}
    assert t[0] == t[1] == t[2] == "hello world"
    assert t[3] == "goodbye world"


def test_hard_negatives_exclude_same_label(spark):
    from petastorm_spark.operators.similarity import hard_negative_mining

    rows = [
        Row(vec_id=i, embedding=[1.0, float(i) * 0.01], label=i % 2)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    out = hard_negative_mining(
        df, df.where(F.col("vec_id") < 2), k=3
    ).collect()
    labels = {r.vec_id: r.label for r in rows}
    for r in out:
        assert labels[r.neighbor_id] != labels[r.query_id]
        assert r.neighbor_id != r.query_id
    assert {r.query_id for r in out} == {0, 1}


def test_ann_recall_report_counts_hits(spark):
    from petastorm_spark.operators.similarity import ann_recall_report

    exact = spark.createDataFrame(
        [Row(query_id=0, neighbor_id=n, rank=i + 1) for i, n in enumerate([10, 11, 12])]
        + [Row(query_id=1, neighbor_id=n, rank=i + 1) for i, n in enumerate([20, 21, 22])]
    )
    approx = spark.createDataFrame(
        [Row(query_id=0, neighbor_id=n, rank=i + 1) for i, n in enumerate([10, 12, 99])]
        + [Row(query_id=1, neighbor_id=n, rank=i + 1) for i, n in enumerate([7, 8, 9])]
    )
    out = {r.query_id: (r.n_hits, r.recall) for r in ann_recall_report(exact, approx, k=3).collect()}
    assert out[0] == (2, 2 / 3)
    assert out[1] == (0, 0.0)


def test_curate_cli_zorder_write_clusters_files(spark, sf_dir, tmp_path):
    """--zorder on the curate CLI: output files each cover a compact
    box on BOTH interleaved columns, and the dataset stays readable."""
    from petastorm_spark.tools.curate import curate

    src = f"{sf_dir}/documents.parquet"
    dst = str(tmp_path / "curated_z")
    counts = curate(
        spark, src, dst,
        quality_floor=0.0,
        zorder_cols=["doc_id", "n_chars"],
        zorder_bits=8,
        zorder_partitions=6,
    )
    out = spark.read.parquet(dst)
    assert out.count() == counts["output"] > 0
    stats = (
        out.groupBy(F.input_file_name())
        .agg(
            (F.max(F.col("doc_id") % 256) - F.min(F.col("doc_id") % 256)).alias("wid"),
        )
        .collect()
    )
    # a random layout would give every file ~the full 0-255 id-bucket
    # span; the z-ordered write must average well under it
    assert len(stats) >= 4
    assert sum(r.wid for r in stats) / len(stats) < 200


def test_cm_sketch_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """cm_sketch_stream (bounded d*w-cell state) over a static dir must
    reproduce the batch sketch register-for-register."""
    from petastorm_spark.operators.sketch import cm_sketch
    from petastorm_spark.streaming.feed import cm_sketch_stream, stream_dataset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    d = str(tmp_path_factory.mktemp("cms") / "docs")
    docs.coalesce(1).write.parquet(d)
    q = (
        cm_sketch_stream(stream_dataset(spark, d), "source", w=64, d=3)
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.r, r.bucket): r.c for r in spark.table("cms_out").collect()
    }
    want = {
        (r.r, r.bucket): r.c
        for r in cm_sketch(docs, "source", w=64, d=3).collect()
    }
    assert got == want and len(want) > 0
