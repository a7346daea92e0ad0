"""Regression tests for the round-1 ADVICE findings."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from petastorm_spark.codecs import NdarrayCodec, ScalarCodec
from petastorm_spark.etl.dataset_metadata import materialize_dataset
from petastorm_spark.predicates import (
    _spark_cast_string,
    in_lambda,
    in_pseudorandom_split,
)
from petastorm_spark.reader import make_reader
from petastorm_spark.unischema import Unischema, UnischemaField, dict_to_spark_row


@pytest.fixture(scope="module")
def many_rowgroup_ds(spark, tmp_path_factory):
    url = str(tmp_path_factory.mktemp("shardds") / "ds")
    # 16 files -> >= 16 row groups, ids recoverable per row
    spark.range(1600).repartition(16).write.parquet(url)
    return url


def test_shards_disjoint_under_unseeded_shuffle(spark, many_rowgroup_ds):
    """ADVICE high: shard AFTER shuffle with per-worker RNGs made shards
    overlap/drop. Sharding is now index-based before the shuffle."""
    seen = []
    for shard in range(3):
        with make_reader(
            many_rowgroup_ds,
            spark=spark,
            shuffle_row_groups=True,  # no seed on purpose
            cur_shard=shard,
            shard_count=3,
        ) as r:
            seen.append({row.id for row in r})
    assert seen[0] | seen[1] | seen[2] == set(range(1600))
    assert not (seen[0] & seen[1] or seen[0] & seen[2] or seen[1] & seen[2])


def test_cur_shard_validated(spark, many_rowgroup_ds):
    with pytest.raises(ValueError, match="cur_shard"):
        make_reader(many_rowgroup_ds, spark=spark, cur_shard=3, shard_count=3)
    with pytest.raises(ValueError, match="cur_shard"):
        make_reader(many_rowgroup_ds, spark=spark, cur_shard=-1, shard_count=3)


def test_unischema_none_dtype_sidecar_roundtrip(spark):
    """ADVICE medium: numpy_dtype=None serialized as float64 (np.dtype(None))."""
    df = spark.createDataFrame(
        [(1, {"a": 2})], "id bigint, s struct<a:bigint>"
    )
    sch = Unischema.from_spark_schema(df.schema)
    assert sch.fields["s"].numpy_dtype is None
    js = sch.to_json()
    assert js["fields"][1]["numpy_dtype"] is None
    back = Unischema.from_json(js)
    assert back.fields["s"].numpy_dtype is None
    assert back.fields["s"] == sch.fields["s"]


def test_predicate_sees_decoded_tensor_values(spark, tmp_path):
    """ADVICE medium: in_lambda over a codec'd field must receive decoded
    ndarrays, not np.save bytes (reference two-phase load)."""
    schema = Unischema(
        "S",
        [
            UnischemaField("id", np.int64, (), ScalarCodec(IntegerType()), False),
            UnischemaField("vec", np.float32, (4,), NdarrayCodec(), False),
        ],
    )
    url = str(tmp_path / "predds")
    rows = [
        {"id": i, "vec": np.full((4,), float(i), dtype=np.float32)}
        for i in range(20)
    ]
    with materialize_dataset(spark, url, schema):
        spark.createDataFrame(
            [dict_to_spark_row(schema, r) for r in rows],
            schema.as_spark_schema(),
        ).coalesce(1).write.mode("overwrite").parquet(url)

    seen_types = []

    def pred(cols):
        vals = list(cols["vec"])
        seen_types.extend(type(v) for v in vals)
        return np.array([v.sum() >= 40 for v in vals])

    with make_reader(
        url, spark=spark, predicate=in_lambda(["vec"], pred)
    ) as r:
        got = sorted(row.id for row in r)
    assert got == list(range(10, 20))
    assert seen_types and all(t is np.ndarray for t in seen_types)


def test_pseudorandom_split_bool_timestamp_parity(spark):
    """ADVICE low: pandas path hashed str(v) ('True'), Spark path
    hashes cast-to-string ('true') — subsets disagreed for booleans."""
    pdf = pd.DataFrame(
        {
            "flag": [True, False] * 10,
            "ts": pd.to_datetime(
                ["2021-03-04 05:06:07.125000", "2021-03-04 05:06:07"] * 10,
                format="mixed",
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    for field in ("flag", "ts"):
        for idx in range(2):
            pred = in_pseudorandom_split([0.5, 0.5], idx, field)
            spark_n = df.filter(pred.to_column()).count()
            pandas_n = int(pred.do_include_pandas(pdf).sum())
            assert spark_n == pandas_n, (field, idx)


def test_spark_cast_string_rendering():
    assert _spark_cast_string(True) == "true"
    assert _spark_cast_string(np.bool_(False)) == "false"
    assert (
        _spark_cast_string(pd.Timestamp("2021-03-04 05:06:07.125000"))
        == "2021-03-04 05:06:07.125"
    )
    assert (
        _spark_cast_string(pd.Timestamp("2021-03-04 05:06:07"))
        == "2021-03-04 05:06:07"
    )
    assert _spark_cast_string(np.int64(7)) == "7"
