"""NGram + sampling operator semantics (mirrors petastorm test_ngram*
and test_weighted_sampling_reader intent)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from petastorm_spark.operators.ngram import NGram
from petastorm_spark.operators.sampling import (
    WeightedSamplingReader,
    shard_dataframe,
    weighted_mix,
)


@pytest.fixture(scope="module")
def ts_df(spark):
    # key a: ts 1,2,3,10,11 (deltas 1,1,7,1); key b: ts 5,6
    rows = [
        ("a", 1, 10),
        ("a", 2, 20),
        ("a", 3, 30),
        ("a", 10, 40),
        ("a", 11, 50),
        ("b", 5, 60),
        ("b", 6, 70),
    ]
    return spark.createDataFrame(rows, ["key", "ts", "v"])


def test_ngram_windows_with_threshold(ts_df):
    ngram = NGram(fields={0: ["ts", "v"], 1: ["ts", "v"]}, delta_threshold=2, timestamp_field="ts")
    out = ngram.apply(ts_df, partition_by=["key"]).orderBy("key", "t0_ts")
    got = [(r.key, r.t0_ts, r.t1_ts) for r in out.collect()]
    # (3,10) excluded: delta 7 > 2
    assert got == [("a", 1, 2), ("a", 2, 3), ("a", 10, 11), ("b", 5, 6)]


def test_ngram_trigram_crosses_nothing_invalid(ts_df):
    ngram = NGram(fields={0: ["ts"], 1: ["ts"], 2: ["ts"]}, delta_threshold=2, timestamp_field="ts")
    out = ngram.apply(ts_df, partition_by=["key"])
    got = {(r.t0_ts, r.t1_ts, r.t2_ts) for r in out.collect()}
    assert got == {(1, 2, 3)}


def test_ngram_non_overlap(ts_df):
    ngram = NGram(
        fields={0: ["ts"], 1: ["ts"]},
        delta_threshold=100,
        timestamp_field="ts",
        timestamp_overlap=False,
    )
    out = ngram.apply(ts_df, partition_by=["key"])
    starts = sorted(r.t0_ts for r in out.collect() if r.t0_ts is not None)
    # non-overlapping blocks: a -> (1,2),(3,10),(10? no—block), b -> (5,6)
    ts_used = [t for r in out.collect() for t in (r.t0_ts, r.t1_ts)]
    assert len(ts_used) == len(set(ts_used))  # no row reused


def test_ngram_offsets_noncontiguous(ts_df):
    ngram = NGram(fields={0: ["ts"], 2: ["ts"]}, delta_threshold=7, timestamp_field="ts")
    out = ngram.apply(ts_df, partition_by=["key"])
    got = {(r.t0_ts, r.t2_ts) for r in out.collect()}
    assert got == {(1, 3), (2, 10), (3, 11)}


def test_shard_dataframe_complete_and_disjoint(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = df.count()
    seen = 0
    for i in range(4):
        seen += shard_dataframe(df, i, 4, "o_orderkey").count()
    assert seen == total


def test_weighted_mix_deterministic(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "view")
    m1 = weighted_mix([a, b], [0.5, 0.5], "event_id").count()
    m2 = weighted_mix([a, b], [0.5, 0.5], "event_id").count()
    assert m1 == m2
    assert 0 < m1 < a.count() + b.count()


def test_weighted_sampling_reader(spark, sf_dir, tmp_path):
    from petastorm_spark.reader import make_reader

    url = f"{sf_dir}/nation.parquet"
    r1 = make_reader(url, spark=spark, num_epochs=2)
    r2 = make_reader(url, spark=spark, num_epochs=2)
    with WeightedSamplingReader([r1, r2], [0.8, 0.2], seed=1) as mixed:
        rows = list(mixed)
    assert len(rows) == 4 * 25  # both readers fully drained
    assert mixed.schema.field_names() == ["n_nationkey", "n_name", "n_regionkey"]


def test_ngram_reader_integration(spark, tmp_path):
    """make_reader(schema_fields=NGram) yields {offset: namedtuple}
    dicts (reference: petastorm/tests/test_ngram_end_to_end.py)."""
    from petastorm_spark.reader import make_batch_reader, make_reader

    url = str(tmp_path / "ts_ds")
    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("a", 10, 40), ("a", 11, 50)]
    spark.createDataFrame(rows, ["key", "ts", "v"]).coalesce(1).write.parquet(url)

    ngram = NGram(fields={0: ["ts", "v"], 1: ["ts", "v"]}, delta_threshold=2, timestamp_field="ts")
    with make_reader(url, spark=spark, schema_fields=ngram) as r:
        windows = list(r)
    got = sorted((w[0].ts, w[1].ts) for w in windows)
    assert got == [(1, 2), (2, 3), (10, 11)]
    assert windows[0][0]._fields == ("ts", "v")

    with pytest.raises(NotImplementedError):
        make_batch_reader(url, spark=spark, schema_fields=ngram)


def test_ngram_reader_non_overlap(spark, tmp_path):
    from petastorm_spark.reader import make_reader

    url = str(tmp_path / "ts_ds2")
    rows = [("a", i, i * 10) for i in range(1, 7)]
    spark.createDataFrame(rows, ["key", "ts", "v"]).coalesce(1).write.parquet(url)
    ngram = NGram(
        fields={0: ["ts"], 1: ["ts"]},
        delta_threshold=5,
        timestamp_field="ts",
        timestamp_overlap=False,
    )
    with make_reader(url, spark=spark, schema_fields=ngram) as r:
        got = [(w[0].ts, w[1].ts) for w in r]
    used = [t for pair in got for t in pair]
    assert len(used) == len(set(used))  # disjoint windows
    assert got == [(1, 2), (3, 4), (5, 6)]


def test_ngram_over_tensor_codec_sequence(spark, tmp_path):
    """The reference's flagship NGram use: consecutive-frame windows
    over a TENSOR (NdarrayCodec) column — a video-frame sequence
    dataset read as 3-grams with full payloads (reference
    petastorm/tests/test_ngram_end_to_end.py's shape)."""
    import numpy as np
    from pyspark.sql.types import IntegerType

    from petastorm_spark.codecs import NdarrayCodec, ScalarCodec
    from petastorm_spark.etl.dataset_metadata import materialize_dataset
    from petastorm_spark.reader import make_reader
    from petastorm_spark.unischema import (
        Unischema,
        UnischemaField,
        dict_to_spark_row,
    )

    schema = Unischema(
        "Seq",
        [
            UnischemaField("ts", np.int32, (), ScalarCodec(IntegerType()), False),
            UnischemaField("frame", np.uint8, (4, 4), NdarrayCodec(), False),
        ],
    )
    url = str(tmp_path / "seq")
    rows = [
        {"ts": i, "frame": np.full((4, 4), i, np.uint8)} for i in range(20)
    ]
    with materialize_dataset(spark, url, schema, row_group_size_mb=1):
        spark.createDataFrame(
            [dict_to_spark_row(schema, r) for r in rows],
            schema.as_spark_schema(),
        ).coalesce(1).write.mode("overwrite").parquet(url)

    ngram = NGram(
        {i: ["ts", "frame"] for i in range(3)},
        delta_threshold=1,
        timestamp_field="ts",
    )
    with make_reader(url, spark=spark, schema_fields=ngram) as r:
        grams = sorted(list(r), key=lambda g: g[0].ts)
    assert len(grams) == 18  # 20 frames -> 18 complete 3-grams
    for g in grams:
        assert [g[i].ts - g[0].ts for i in range(3)] == [0, 1, 2]
        assert all(int(g[i].frame[0, 0]) == g[i].ts for i in range(3))
