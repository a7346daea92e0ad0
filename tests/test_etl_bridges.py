"""Indexing, converter, bridges, CLI tools, streaming."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from petastorm_spark.converter import make_spark_converter
from petastorm_spark.etl.generate_metadata import generate_metadata
from petastorm_spark.etl.rowgroup_indexing import (
    FieldNotNullIndexer,
    IntersectIndexSelector,
    SingleFieldIndexer,
    SingleIndexSelector,
    UnionIndexSelector,
    build_rowgroup_index,
    list_indexes,
)
from petastorm_spark.reader import make_batch_reader, make_reader
from petastorm_spark.tools.copy_dataset import copy_dataset


@pytest.fixture(scope="module")
def indexed_ds(spark, tmp_path_factory):
    url = str(tmp_path_factory.mktemp("idx") / "ds")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("sparse"),
    )
    df.repartition(10, "bucket").write.parquet(url)
    build_rowgroup_index(
        spark,
        url,
        [SingleFieldIndexer("by_bucket", "bucket"), FieldNotNullIndexer("has_sparse", "sparse")],
    )
    return url


def test_index_listing(spark, indexed_ds):
    assert sorted(list_indexes(spark, indexed_ds)) == ["by_bucket", "has_sparse"]


def test_single_index_selector_prunes(spark, indexed_ds):
    sel = SingleIndexSelector("by_bucket", [3])
    files = sel.select_files(spark, indexed_ds)
    assert 0 < len(files) < 10  # pruned to the files holding bucket 3
    with make_reader(indexed_ds, spark=spark, rowgroup_selector=sel) as r:
        buckets = {row.bucket for row in r}
    assert 3 in buckets  # selected files contain target (plus co-located rows)


def test_union_intersect_selectors(spark, indexed_ds):
    s3 = SingleIndexSelector("by_bucket", [3])
    s7 = SingleIndexSelector("by_bucket", [7])
    u = UnionIndexSelector([s3, s7]).select_files(spark, indexed_ds)
    i = IntersectIndexSelector([s3, s7]).select_files(spark, indexed_ds)
    assert u >= s3.select_files(spark, indexed_ds)
    assert i <= u


def test_selector_plus_predicate_exact(spark, indexed_ds):
    from petastorm_spark.predicates import in_set

    sel = SingleIndexSelector("by_bucket", [5])
    with make_reader(
        indexed_ds, spark=spark, rowgroup_selector=sel, predicate=in_set([5], "bucket")
    ) as r:
        ids = sorted(row.id for row in r)
    assert ids == [i for i in range(100) if i % 10 == 5]


def test_converter_roundtrip_and_cache(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    conv = make_spark_converter(df, dtype=None)
    try:
        assert len(conv) == 25
        again = make_spark_converter(df, dtype=None)
        assert again is conv  # plan-keyed cache hit (sameSemantics)
        with conv.make_batch_reader() as r:
            total = sum(len(b.n_nationkey) for b in r)
        assert total == 25
    finally:
        conv.delete()


def test_converter_precision_cast(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    conv = make_spark_converter(df, dtype="float32")
    try:
        with conv.make_batch_reader() as r:
            batch = next(iter(r))
            assert batch.c_acctbal.dtype == np.float32
    finally:
        conv.delete()


def test_torch_dataloader_batches(spark, sf_dir):
    from petastorm_spark.bridges.torch import DataLoader

    with DataLoader(
        make_batch_reader(
            f"{sf_dir}/customer.parquet",
            spark=spark,
            schema_fields=["c_custkey", "c_acctbal"],
        ),
        batch_size=64,
    ) as loader:
        sizes = [len(b["c_custkey"]) for b in loader]
    assert sum(sizes) == spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert set(sizes[:-1]) == {64}


def test_torch_inmem_loader_epochs(spark, sf_dir):
    from petastorm_spark.bridges.torch import InMemBatchedDataLoader

    reader = make_batch_reader(
        f"{sf_dir}/nation.parquet", spark=spark, schema_fields=["n_nationkey"]
    )
    loader = InMemBatchedDataLoader(reader, batch_size=10, num_epochs=2, seed=5)
    batches = list(loader)
    assert sum(len(b["n_nationkey"]) for b in batches) == 50


def test_tf_batch_generator(spark, sf_dir):
    from petastorm_spark.bridges.tf import batch_generator

    reader = make_batch_reader(f"{sf_dir}/orders.parquet", spark=spark)
    gen = batch_generator(reader, batch_size=100)
    first = next(gen)
    assert len(first["o_orderkey"]) == 100
    # datetime64 -> int64 ns sanitization
    assert first["o_orderdate"].dtype == np.int64


def test_copy_dataset_projection_and_filter(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "copied")
    copy_dataset(
        spark,
        f"{sf_dir}/customer.parquet",
        dst,
        field_regex=["c_custkey", "c_acctbal"],
        not_null_fields=["c_acctbal"],
        partitions_count=2,
    )
    out = spark.read.parquet(dst)
    assert set(out.columns) == {"c_custkey", "c_acctbal"}
    from petastorm_spark.etl.dataset_metadata import load_unischema

    assert load_unischema(spark, dst).field_names() == ["c_custkey", "c_acctbal"]


def test_generate_metadata_retrofit(spark, sf_dir, tmp_path):
    url = str(tmp_path / "plain")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(url)
    schema = generate_metadata(spark, url)
    assert schema.field_names() == ["r_regionkey", "r_name"]
    from petastorm_spark.etl.dataset_metadata import load_unischema

    assert load_unischema(spark, url) is not None


def test_dataset_as_rdd(spark, sf_dir):
    from petastorm_spark.spark_utils import dataset_as_rdd

    rdd = dataset_as_rdd(f"{sf_dir}/region.parquet", spark, schema_fields=["r_name"])
    names = {t.r_name for t in rdd.collect()}
    assert names == {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # readStream needs a dataset DIRECTORY (growing-file feed), not a file
    d = str(tmp_path_factory.mktemp("stream") / "events")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(d)
    return d


def test_streaming_windowed_counts(spark, sf_dir, events_dir):
    from petastorm_spark.streaming.feed import stream_dataset, windowed_event_counts

    stream = stream_dataset(spark, events_dir)
    agg = windowed_event_counts(stream, window="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_events) AS n FROM win_counts").collect()[0].n
    assert got == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_streaming_sessionize(spark, events_dir):
    from petastorm_spark.streaming.feed import sessionize_stream, stream_dataset

    stream = stream_dataset(spark, events_dir)
    sess = sessionize_stream(stream, gap="30 minutes", watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM sessions").collect()[0].n
    assert n > 0


def test_streaming_dedup(spark, sf_dir, tmp_path_factory):
    """dedup_stream drops later copies of a digest: streaming over a
    corpus with planted duplicates yields exactly the distinct count."""
    from petastorm_spark.streaming.feed import dedup_stream, stream_dataset

    d = str(tmp_path_factory.mktemp("streamdup") / "docs")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.unionByName(docs.withColumn("doc_id", docs.doc_id + 100000)).write.parquet(d)
    distinct_texts = docs.select("text").distinct().count()

    stream = stream_dataset(spark, d)
    q = (
        dedup_stream(stream, "text")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    assert n == distinct_texts


def test_streaming_ewma_matches_batch_twin(spark, sf_dir, tmp_path_factory):
    """applyInPandasWithState custom stateful fold: availableNow over a
    static directory must reproduce the batch applyInPandas twin
    exactly (same closed-form update, state folded per key)."""
    from petastorm_spark.operators.stateful import ewma_by_key
    from petastorm_spark.streaming.feed import running_ewma_stream, stream_dataset

    d = str(tmp_path_factory.mktemp("ewma") / "events")
    # one file -> one micro-batch, so cross-batch arrival order cannot
    # diverge from event-time order
    spark.read.parquet(f"{sf_dir}/events.parquet").coalesce(1).write.parquet(d)

    q = (
        running_ewma_stream(stream_dataset(spark, d))
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        r.user_id: (r.n_events, round(r.ewma, 6), r.last_ts)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    batch_rows = {
        r.user_id: (r.n_events, round(r.ewma, 6), r.last_ts)
        for r in ewma_by_key(spark.read.parquet(d)).collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_throughput_cli(spark, sf_dir, capsys):
    """petastorm-throughput parity: measures cycles/sec on any dataset."""
    from petastorm_spark.benchmark.cli import main
    from petastorm_spark.benchmark.throughput import reader_throughput

    res = reader_throughput(
        f"{sf_dir}/nation.parquet",
        warmup_cycles=5,
        measure_cycles=20,
        workers_count=2,
        spark=spark,
    )
    assert res.samples_per_second > 0
    # reference parity: RSS + CPU%% reported alongside the rate
    # (petastorm/benchmark/throughput.py memory_info/cpu columns);
    # procfs is always present on the Linux CI container
    assert res.rss_mb is not None and res.rss_mb > 10
    assert res.cpu_pct is not None and res.cpu_pct >= 0
    r2 = reader_throughput(
        f"{sf_dir}/nation.parquet",
        warmup_cycles=1,
        measure_cycles=2,
        read_method="batch",
        spark=spark,
    )
    assert r2.batched and r2.samples_per_second > 0
    assert (
        main(
            [
                f"{sf_dir}/nation.parquet",
                "-m", "2", "-n", "5", "-w", "2",
                "--field-regex", "n_.*",
            ]
        )
        == 0
    )
    assert "samples/sec" in capsys.readouterr().out


def test_streaming_contamination_matches_batch_twin(spark, sf_dir, tmp_path_factory):
    """contamination_stream (stream-static broadcast join + update-mode
    agg) over a static dir must reproduce batch contamination_overlap
    exactly."""
    from petastorm_spark.operators.dedup import contamination_overlap
    from petastorm_spark.streaming.feed import contamination_stream, stream_dataset

    d = str(tmp_path_factory.mktemp("contam") / "docs")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ev = docs.where(docs.doc_id % 97 == 0)
    tr = docs.where(docs.doc_id % 97 != 0)
    tr.coalesce(1).write.parquet(d)  # one file -> one micro-batch

    q = (
        contamination_stream(stream_dataset(spark, d), ev, "text", "doc_id")
        .writeStream.format("memory")
        .queryName("contam_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        r.doc_id: r.n_overlap
        for r in spark.sql("SELECT * FROM contam_out").collect()
    }
    batch_rows = {
        r.doc_id: r.n_overlap
        for r in contamination_overlap(tr, ev, "text", "doc_id").collect()
    }
    assert stream_rows == batch_rows and stream_rows


def test_streaming_ewma_ns_layout_emits_micros(spark, tmp_path_factory):
    """ADVICE r5 low: on the legacy bigint-ns events layout the stream
    emitted last_ts in NANOseconds while the batch path normalizes to
    µs. The stream now runs the same _event_time shim before the fold,
    so last_ts is epoch-µs for every layout."""
    from petastorm_spark.operators.stateful import ewma_by_key
    from petastorm_spark.session import events_ts_us
    from petastorm_spark.streaming.feed import running_ewma_stream, stream_dataset

    d = str(tmp_path_factory.mktemp("ewmans") / "events")
    base_ns = 1_600_000_000_000_000_000
    rows = [
        (1, base_ns + i * 1_000_000_000, float(i)) for i in range(5)
    ] + [(2, base_ns + 500_000_000, 9.0)]
    spark.createDataFrame(
        rows, "user_id bigint, ts bigint, value double"
    ).coalesce(1).write.parquet(d)

    q = (
        running_ewma_stream(stream_dataset(spark, d))
        .writeStream.format("memory")
        .queryName("ewma_ns_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        r.user_id: (r.n_events, round(r.ewma, 6), r.last_ts)
        for r in spark.sql("SELECT * FROM ewma_ns_out").collect()
    }
    ev = spark.read.parquet(d)
    batch = ev.select(
        "user_id", events_ts_us(ev).alias("ts"), "value"
    )
    batch_rows = {
        r.user_id: (r.n_events, round(r.ewma, 6), r.last_ts)
        for r in ewma_by_key(batch).collect()
    }
    assert stream_rows == batch_rows and stream_rows
    # last_ts is µs, not ns
    assert stream_rows[2][2] == (base_ns + 500_000_000) // 1000


def test_compact_dataset_merges_small_files(spark, tmp_path):
    """16 tiny files compact into the size-targeted count; rows
    survive byte-identically; the output is a fully-described engine
    dataset (sidecar present, make_reader works) even though the input
    was bare parquet."""
    from petastorm_spark.etl.compact import compact_dataset, dataset_size_bytes
    from petastorm_spark.etl.dataset_metadata import load_unischema
    from petastorm_spark.reader import make_reader

    src = str(tmp_path / "small")
    spark.range(2000).selectExpr(
        "id", "id * 2 AS v"
    ).repartition(16).write.parquet(src)
    assert dataset_size_bytes(src) > 0

    dst = str(tmp_path / "compacted")
    n = compact_dataset(spark, src, dst, target_mb=128)
    assert n == 1  # tiny dataset -> one file
    import os

    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == 1
    got = spark.read.parquet(dst)
    assert got.count() == 2000
    assert sorted(r.v for r in got.collect()) == [i * 2 for i in range(2000)]
    assert load_unischema(spark, dst) is not None  # upgraded to engine dataset
    with make_reader(dst, spark=spark) as r:
        assert len({row.id for row in r}) == 2000


def test_streaming_quality_scrub_matches_batch(spark, sf_dir, tmp_path_factory):
    """The curation map stages (quality floor + PII scrub) compose
    directly onto a readStream feed: availableNow over a static dir
    must keep/scrub exactly the rows the batch pipeline does."""
    from pyspark.sql import functions as F

    from petastorm_spark.operators.text import quality_score, scrub_pii
    from petastorm_spark.streaming.feed import stream_dataset

    d = str(tmp_path_factory.mktemp("curstream") / "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).write.parquet(d)

    q4 = F.floor(quality_score("text") * 10000) / 10000

    def curate(df):
        return df.where(q4 >= 0.8).select(
            "doc_id", F.md5(scrub_pii("text")).alias("h")
        )

    qy = (
        curate(stream_dataset(spark, d))
        .writeStream.format("memory")
        .queryName("cur_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    got = {
        (r.doc_id, r.h) for r in spark.sql("SELECT * FROM cur_stream").collect()
    }
    want = {(r.doc_id, r.h) for r in curate(spark.read.parquet(d)).collect()}
    assert got == want and got


def test_streaming_hll_registers_match_batch(spark, sf_dir, events_dir):
    """The streaming register table (availableNow) must equal the batch
    one row-for-row, so stream and batch estimates are identical."""
    from pyspark.sql import functions as F

    from petastorm_spark.operators.sketch import hll_distinct, hll_estimate
    from petastorm_spark.streaming.feed import hll_registers_stream, stream_dataset

    stream = stream_dataset(spark, events_dir).select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    regs = hll_registers_stream(stream, "event_type", "uid", p=10)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_est = {
        r["event_type"]: r["hll_distinct"]
        for r in hll_estimate(
            spark.table("hll_regs"), "event_type", p=10
        ).collect()
    }
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    batch_est = {
        r["event_type"]: r["hll_distinct"]
        for r in hll_distinct(batch, "event_type", "uid", p=10).collect()
    }
    assert stream_est == batch_est and len(stream_est) == 5


def test_streaming_rolling_zscore_matches_batch_anomalies(spark, sf_dir, events_dir):
    """availableNow rolling z-score flags the same events as the
    events_anomaly batch window query, with matching scores."""
    from petastorm_spark.queries import QUERIES
    from petastorm_spark.streaming.feed import rolling_zscore_stream, stream_dataset

    stream = stream_dataset(spark, events_dir)
    q = (
        rolling_zscore_stream(stream)
        .writeStream.format("memory")
        .queryName("zs_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_id"]): r["zscore"]
        for r in spark.table("zs_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["zscore"]
        for r in QUERIES["events_anomaly"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) <= 2e-4 for k in want)
    assert len(want) > 0


def test_streaming_bloom_contamination_matches_batch(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from petastorm_spark.operators.dedup import contamination_bloom
    from petastorm_spark.streaming.feed import (
        contamination_bloom_stream,
        stream_dataset,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    tr = docs.where(F.col("doc_id") % 97 != 0)
    d = str(tmp_path_factory.mktemp("bloomstream") / "train")
    tr.write.parquet(d)

    stream = stream_dataset(spark, d)
    q = (
        contamination_bloom_stream(stream, ev, "text", "doc_id", m=65536, d=3)
        .writeStream.format("memory")
        .queryName("bloom_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["n_suspect"])
        for r in spark.table("bloom_stream").collect()
    }
    want = {
        (r["doc_id"], r["n_suspect"])
        for r in contamination_bloom(tr, ev, "text", "doc_id", m=65536, d=3).collect()
    }
    assert got == want and len(want) > 0


def test_curate_cli_writes_dataset_and_report(spark, sf_dir, tmp_path):
    from petastorm_spark.reader import make_batch_reader
    from petastorm_spark.tools.curate import curate

    src = f"{sf_dir}/documents.parquet"
    dst = str(tmp_path / "curated")
    rep = str(tmp_path / "report")
    counts = curate(
        spark, src, dst,
        quality_floor=0.0,  # keep quality non-destructive on tiny corpus
        strata_col="source",
        max_per_stratum=20,
        report_url=rep,
    )
    assert counts["input"] == 500
    assert counts["output"] == counts["capped"] <= 20 * 20
    assert counts["dedup"] <= counts["input"]
    # curated output is a first-class engine dataset: readable by the
    # iteration tier
    with make_batch_reader(f"file://{dst}") as r:
        n = sum(len(b.doc_id) for b in r)
    assert n == counts["output"]
    assert spark.read.parquet(rep).count() == len(counts)


def test_curate_cli_lm_floor_gate(spark, sf_dir, tmp_path):
    """--lm-floor plumbs through the CLI: the lm stage appears in the
    attrition report, gates between quality and cap, and scores
    against the frozen model corpus given by --lm-model-url."""
    from petastorm_spark.tools.curate import curate

    src = f"{sf_dir}/documents.parquet"
    counts = curate(
        spark, src, str(tmp_path / "curated_lm"),
        quality_floor=0.0,
        lm_floor=-9.0,  # between fluent and salad on this corpus
        lm_model_url=src,
    )
    order = list(counts)
    assert order == ["input", "dedup", "quality", "lm", "capped", "output"]
    assert 0 < counts["lm"] <= counts["quality"]
    assert counts["output"] == counts["capped"] == counts["lm"]


def test_streaming_funnel_matches_batch(spark, sf_dir, events_dir):
    from petastorm_spark.queries import QUERIES
    from petastorm_spark.streaming.feed import funnel_stream, stream_dataset

    stream = stream_dataset(spark, events_dir)
    q = (
        funnel_stream(stream, ["signup", "view", "purchase"])
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["funnel_depth"], r["t_step1"], r["t_step2"], r["t_step3"])
        for r in spark.table("funnel_stream").collect()
    }
    want = {
        r["user_id"]: (r["funnel_depth"], r["t_step1"], r["t_step2"], r["t_step3"])
        for r in QUERIES["funnel_signup_purchase"](spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_converter_vector_udt_to_array(spark):
    """C11 for real (reference spark_dataset_converter's VectorUDT
    handling): dense AND sparse ML vectors materialize as
    array<double>/array<float> parquet columns and read back through
    the batch reader — pyspark.ml is present in this environment, so
    the import gate is exercised, not skipped."""
    import numpy as np
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [
            (0, Vectors.dense([1.0, 2.0, 3.0])),
            (1, Vectors.sparse(3, {1: 5.0})),
        ],
        ["id", "features"],
    )
    conv = make_spark_converter(df, dtype="float32")
    try:
        with conv.make_batch_reader() as r:
            rows = {}
            for b in r:
                for i, vid in enumerate(b.id):
                    rows[int(vid)] = np.asarray(b.features[i])
        np.testing.assert_allclose(rows[0], [1.0, 2.0, 3.0])
        np.testing.assert_allclose(rows[1], [0.0, 5.0, 0.0])  # sparse densified
        assert rows[0].dtype == np.float32  # precision cast applied after
    finally:
        conv.delete()


def test_batch_reader_plain_array_columns(spark, sf_dir, tmp_path):
    """Regression: make_batch_reader over a plain parquet ARRAY column
    (no codec, no sidecar — the embeddings table shape) must pass the
    per-row arrays through; the element-dtype 'restore' cast used to
    explode with 'setting an array element with a sequence'. Nullable
    arrays ride the same path."""
    import numpy as np

    with make_batch_reader(
        f"file://{sf_dir}/embeddings.parquet", spark=spark
    ) as r:
        total, dim = 0, None
        for b in r:
            total += len(b.vec_id)
            dim = len(b.embedding[0])
        assert dim == 64 and total > 0

    # nullable array column
    p = str(tmp_path / "nullable_arrays")
    spark.sql(
        "SELECT * FROM VALUES (1, array(1.0D, 2.0D)), (2, CAST(NULL AS ARRAY<DOUBLE>)) t(id, v)"
    ).write.parquet(p)
    with make_batch_reader(f"file://{p}", spark=spark) as r:
        rows = {}
        for b in r:
            for i, rid in enumerate(b.id):
                rows[int(rid)] = b.v[i]
    np.testing.assert_allclose(np.asarray(rows[1]), [1.0, 2.0])
    assert rows[2] is None or (isinstance(rows[2], float) and np.isnan(rows[2]))


def test_batch_reader_struct_map_nested(spark, tmp_path):
    """Struct, map, and nested-array columns pass through the batch
    reader undecoded (numpy_dtype=None fields) — the upgrade over the
    reference, which refuses non-flat schemas."""
    p = str(tmp_path / "structs")
    spark.sql(
        "SELECT * FROM VALUES"
        " (1, named_struct('a', 1, 'b', 'x'), map('k', 1.5D), array(array(1,2))),"
        " (2, named_struct('a', 2, 'b', 'y'), map('q', 2.5D), array(array(4)))"
        " t(id, st, mp, nested)"
    ).write.parquet(p)
    with make_batch_reader(f"file://{p}", spark=spark) as r:
        rows = {}
        for b in r:
            for i, rid in enumerate(b.id):
                rows[int(rid)] = (b.st[i], b.mp[i], b.nested[i])
    assert rows[1][0] == {"a": 1, "b": "x"}
    assert dict(rows[2][1]) == {"q": 2.5}
    assert list(rows[1][2][0]) == [1, 2]


def test_torch_dataloader_array_columns(spark, sf_dir):
    """The training-loader path over an EMBEDDING table: array columns
    ride the batch reader (fixed this round) into torch-bridge
    batches as per-row vectors — the shape every embedding-training
    job consumes."""
    import numpy as np

    from petastorm_spark.bridges.torch import DataLoader

    with DataLoader(
        make_batch_reader(f"{sf_dir}/embeddings.parquet", spark=spark),
        batch_size=128,
    ) as loader:
        n = 0
        for b in loader:
            n += len(b["vec_id"])
            e = np.asarray(b["embedding"])
            assert e.ndim == 2 and e.shape[1] == 64  # stacked (batch, dim)
            assert e.dtype.kind == "f"
    assert n == spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()


def test_tf_batch_generator_array_columns(spark, sf_dir):
    """The TF generator stacks equal-shape array columns into
    (batch, dim) — re-chunking concatenates the 2D blocks correctly."""
    import numpy as np

    from petastorm_spark.bridges.tf import batch_generator

    reader = make_batch_reader(f"{sf_dir}/embeddings.parquet", spark=spark)
    try:
        gen = batch_generator(reader, batch_size=100)
        b = next(gen)
        e = np.asarray(b["embedding"])
        assert e.shape == (100, 64) and e.dtype.kind == "f"
    finally:
        reader.stop()
        reader.join()


def test_converter_torch_dataloader_embeddings(spark, sf_dir):
    """The reference's flagship converter flow (examples/
    spark_dataset_converter): DataFrame -> cached parquet ->
    make_torch_dataloader, here over an embedding table — batches
    arrive as float32 (batch, dim)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    conv = make_spark_converter(emb, dtype="float32")
    try:
        with conv.make_torch_dataloader(batch_size=64) as dl:
            b = next(iter(dl))
            e = np.asarray(b["embedding"])
            assert e.shape == (64, 64) and e.dtype == np.float32
    finally:
        conv.delete()


def test_transform_spec_over_array_columns(spark, sf_dir):
    """TransformSpec consuming AND producing array columns through the
    batch reader (U1-U3 x the array path fixed this round): derive a
    scalar and a sliced vector from the embedding, drop the source."""
    import numpy as np

    from petastorm_spark.transform import TransformSpec

    def f(pdf):
        pdf["norm"] = [float(np.linalg.norm(v)) for v in pdf["embedding"]]
        pdf["half"] = [np.asarray(v)[:32] for v in pdf["embedding"]]
        return pdf.drop(columns=["embedding"])

    ts = TransformSpec(
        f,
        edit_fields=[
            ("norm", np.float64, (), False),
            ("half", np.float32, (32,), False),
        ],
        removed_fields=["embedding"],
    )
    with make_batch_reader(
        f"{sf_dir}/embeddings.parquet", spark=spark, transform_spec=ts
    ) as r:
        n = 0
        for b in r:
            n += len(b.vec_id)
            assert len(b.half[0]) == 32
            assert abs(float(b.norm[0]) - 1.0) < 1e-6  # unit vectors
            assert not hasattr(b, "embedding")
    assert n == spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()


def test_l_diversity_stream_matches_batch(spark, tmp_path_factory):
    """availableNow over a static dir == the batch l_diversity_report
    row for row (the streaming-twin contract, r13 verdict #7). The
    stream carries distinctness as collect_set state since streaming
    forbids countDistinct."""
    from petastorm_spark.operators.privacy import l_diversity_report
    from petastorm_spark.streaming.feed import (
        l_diversity_stream,
        stream_dataset,
    )

    cust = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    ).select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal").cast("double") / 2000))
        .cast("bigint")
        .alias("bal_bucket"),
    )
    d = str(tmp_path_factory.mktemp("ldiv") / "cust")
    cust.coalesce(1).write.parquet(d)
    qi = ["c_nationkey", "c_mktsegment"]
    q = (
        l_diversity_stream(stream_dataset(spark, d), qi, "bal_bucket", l=3)
        .writeStream.format("memory")
        .queryName("ldiv_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (r["c_nationkey"], r["c_mktsegment"])  # noqa: E731
    got = {
        key(r): (r["class_size"], r["n_sensitive_values"], r["at_risk"])
        for r in spark.table("ldiv_out").collect()
    }
    want = {
        key(r): (r["class_size"], r["n_sensitive_values"], r["at_risk"])
        for r in l_diversity_report(cust, qi, "bal_bucket", l=3).collect()
    }
    assert got == want and len(want) > 0
    # both risk classes represented on this fixture
    risks = {v[2] for v in want.values()}
    assert risks == {0, 1}
