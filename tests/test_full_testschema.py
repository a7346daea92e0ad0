"""Full F1 fixture (FIXTURES.md; mirrors the reference TestSchema,
petastorm/tests/test_common.py:38-56): every codec/type combo, unsigned
widening, variable shapes, nullability patterns, hive partitioning —
exact round-trip against retained ground truth."""

from decimal import Decimal

import numpy as np
import pytest
from pyspark.sql.types import DecimalType, IntegerType, ShortType, StringType

from petastorm_spark.codecs import (
    CompressedImageCodec,
    CompressedNdarrayCodec,
    NdarrayCodec,
    ScalarCodec,
)
from petastorm_spark.etl.dataset_metadata import materialize_dataset
from petastorm_spark.reader import make_reader
from petastorm_spark.unischema import Unischema, UnischemaField, dict_to_spark_row

TestSchema = Unischema(
    "TestSchema",
    [
        UnischemaField("partition_key", np.str_, (), ScalarCodec(StringType()), False),
        UnischemaField("id", np.int64, (), ScalarCodec(IntegerType()), False),
        UnischemaField("id2", np.int32, (), ScalarCodec(ShortType()), False),
        UnischemaField("id_float", np.float64, (), ScalarCodec(DecimalType(10, 2)), False),
        UnischemaField("id_odd", np.bool_, (), None, False),
        UnischemaField("python_primitive_uint8", np.uint8, (), None, False),
        UnischemaField("image_png", np.uint8, (32, 16, 3), CompressedImageCodec("png"), False),
        UnischemaField("matrix", np.float32, (32, 16, 3), NdarrayCodec(), False),
        UnischemaField("decimal", Decimal, (), ScalarCodec(DecimalType(10, 9)), False),
        UnischemaField("matrix_uint16", np.uint16, (32, 16, 3), NdarrayCodec(), False),
        UnischemaField("matrix_uint32", np.uint32, (32, 16, 3), CompressedNdarrayCodec(), False),
        UnischemaField("matrix_string", np.bytes_, (None, None), NdarrayCodec(), False),
        UnischemaField("empty_matrix_string", np.bytes_, (None,), NdarrayCodec(), False),
        UnischemaField("matrix_nullable", np.uint16, (32, 16, 3), NdarrayCodec(), True),
        UnischemaField("sensor_name", np.str_, (1,), NdarrayCodec(), False),
        UnischemaField("string_array_nullable", np.str_, (None,), NdarrayCodec(), True),
        UnischemaField("integer_nullable", np.int32, (), ScalarCodec(IntegerType()), True),
    ],
)

N = 30


def _rows(seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(N):
        out.append(
            {
                "partition_key": f"p_{i // 10}",
                "id": i,
                "id2": np.int32(i % 2),
                "id_float": float(i),
                "id_odd": bool(i % 2),
                "python_primitive_uint8": np.uint8(i % 255),
                "image_png": rng.integers(0, 255, (32, 16, 3), dtype=np.uint8),
                "matrix": rng.random((32, 16, 3), dtype=np.float32),
                "decimal": Decimal(f"{i % 9}.123456789"),
                "matrix_uint16": rng.integers(0, 2**16, (32, 16, 3), dtype=np.uint16),
                "matrix_uint32": rng.integers(0, 2**32, (32, 16, 3), dtype=np.uint32),
                "matrix_string": np.array(
                    [[b"a", b"bc"], [b"def", b"g"]][: 1 + i % 2], dtype=np.bytes_
                ),
                "empty_matrix_string": np.array([], dtype=np.bytes_),
                "matrix_nullable": None,
                "sensor_name": np.array(["sensor_%d" % i], dtype=np.str_),
                "string_array_nullable": (
                    None
                    if i % 5 == 0
                    else (
                        np.array([], dtype=np.str_)
                        if i % 4 == 0
                        else np.array([f"a_{i}", f"b_{i}"], dtype=np.str_)
                    )
                ),
                "integer_nullable": None if i % 2 else np.int32(i * 10),
            }
        )
    return out


@pytest.fixture(scope="module")
def full_ds(spark, tmp_path_factory):
    url = str(tmp_path_factory.mktemp("full") / "ds")
    rows = _rows()
    with materialize_dataset(spark, url, TestSchema, row_group_size_mb=1):
        df = spark.createDataFrame(
            [dict_to_spark_row(TestSchema, r) for r in rows],
            TestSchema.as_spark_schema(),
        )
        df.repartition(2).write.partitionBy("partition_key").mode("overwrite").parquet(url)
    return url, rows


def test_full_schema_round_trip(spark, full_ds):
    url, rows = full_ds
    truth = {r["id"]: r for r in rows}
    count = 0
    with make_reader(url, spark=spark) as reader:
        for row in reader:
            src = truth[row.id]
            count += 1
            assert row.partition_key == src["partition_key"]
            assert row.id2 == src["id2"] and isinstance(row.id2, (int, np.integer))
            assert row.id_odd == src["id_odd"]
            assert row.python_primitive_uint8 == src["python_primitive_uint8"]
            np.testing.assert_array_equal(row.image_png, src["image_png"])
            np.testing.assert_array_equal(row.matrix, src["matrix"])
            assert row.matrix.dtype == np.float32
            assert Decimal(row.decimal) == src["decimal"]
            np.testing.assert_array_equal(row.matrix_uint16, src["matrix_uint16"])
            assert row.matrix_uint16.dtype == np.uint16  # unsigned survives
            np.testing.assert_array_equal(row.matrix_uint32, src["matrix_uint32"])
            assert row.matrix_uint32.dtype == np.uint32
            np.testing.assert_array_equal(row.matrix_string, src["matrix_string"])
            assert row.empty_matrix_string.size == 0
            assert row.matrix_nullable is None
            assert row.sensor_name[0] == src["sensor_name"][0]
            if src["string_array_nullable"] is None:
                assert row.string_array_nullable is None
            else:
                np.testing.assert_array_equal(
                    row.string_array_nullable, src["string_array_nullable"]
                )
            if src["integer_nullable"] is None:
                assert row.integer_nullable is None
            else:
                assert row.integer_nullable == src["integer_nullable"]
    assert count == N


def test_partition_pruning_via_predicate(spark, full_ds):
    from petastorm_spark.predicates import in_set

    url, _ = full_ds
    with make_reader(
        url, spark=spark, schema_fields=["id", "partition_key"],
        predicate=in_set(["p_1"], "partition_key"),
    ) as r:
        ids = sorted(row.id for row in r)
    assert ids == list(range(10, 20))


def test_struct_column_readable(spark, tmp_path):
    """F2 nested_struct: the reference DROPS struct columns
    (unischema.py:338-341); we read them (documented upgrade)."""
    from pyspark.sql import functions as F

    from petastorm_spark.reader import make_batch_reader

    url = str(tmp_path / "structs")
    spark.range(10).select(
        "id", F.struct(F.col("id").alias("nested_int")).alias("nested_struct")
    ).write.parquet(url)
    with make_batch_reader(url, spark=spark) as r:
        batch = next(iter(r))
        assert batch.nested_struct[0]["nested_int"] == batch.id[0]


def test_shuffling_buffer_uniform_and_complete():
    from petastorm_spark.bridges.shuffling import RandomShufflingBuffer

    buf = RandomShufflingBuffer(capacity=50, min_after_dequeue=20, seed=1)
    out = list(buf.shuffle(range(1000)))
    assert sorted(out) == list(range(1000))
    assert out != list(range(1000))  # actually shuffled
    # shuffle window == capacity: i-th output drawn from first cap+i items
    assert all(v < 50 + i + 1 for i, v in enumerate(out[:100]))
    # the buffer actually fills to capacity before the first yield
    assert max(out[:10]) > 10  # a min-window-only buffer could not reach here


def test_length_bucketed_loader_groups_and_is_complete():
    from collections import namedtuple

    import numpy as np

    from petastorm_spark.bridges.torch import LengthBucketedLoader

    Row = namedtuple("Row", ["rid", "toks"])
    rng = np.random.default_rng(5)
    rows = [
        Row(i, np.arange(int(n)) + 1)
        for i, n in enumerate(rng.integers(1, 40, 200))
    ]

    class FakeReader:
        def __iter__(self):
            return iter(rows)

        def close(self):
            pass

    with LengthBucketedLoader(
        FakeReader(), "toks", boundaries=[8, 16, 24], batch_size=16, pad_value=0
    ) as loader:
        seen = []
        for batch in loader:
            lens = batch["toks_len"]
            seen.extend(batch["rid"].tolist())
            # all rows in a full batch share a bucket: spread <= bucket width
            assert batch["toks"].shape[1] == lens.max()
            # padding correct: zeros beyond each row's length
            for i, n in enumerate(lens):
                assert (batch["toks"][i, int(n):] == 0).all()
                assert (batch["toks"][i, : int(n)] > 0).all()
        assert sorted(seen) == list(range(200))  # complete, exactly once

    import pytest

    with pytest.raises(ValueError):
        LengthBucketedLoader(FakeReader(), "toks", boundaries=[16, 8])
