"""Hello-world: write a tensor dataset, read it back — the
petastorm hello_world example re-expressed on petastorm_spark.

    PYTHONPATH=. python examples/hello_world.py
"""

import tempfile

import numpy as np
from pyspark.sql.types import IntegerType

from petastorm_spark import (
    CompressedImageCodec,
    NdarrayCodec,
    ScalarCodec,
    Unischema,
    UnischemaField,
    dict_to_spark_row,
    get_spark,
    make_batch_reader,
    make_reader,
    materialize_dataset,
)

HelloWorldSchema = Unischema(
    "HelloWorldSchema",
    [
        UnischemaField("id", np.int32, (), ScalarCodec(IntegerType()), False),
        UnischemaField("image1", np.uint8, (128, 256, 3), CompressedImageCodec("png"), False),
        UnischemaField("array_4d", np.uint8, (None, 128, 30, None), NdarrayCodec(), False),
    ],
)


def row_generator(x):
    return {
        "id": x,
        "image1": np.random.randint(0, 255, dtype=np.uint8, size=(128, 256, 3)),
        "array_4d": np.random.randint(0, 255, dtype=np.uint8, size=(4, 128, 30, 3)),
    }


def main():
    spark = get_spark("hello_world", cpus=4)
    output_url = "file://" + tempfile.mkdtemp() + "/hello_world_dataset"

    rowgroup_size_mb = 32
    rows_count = 10
    with materialize_dataset(spark, output_url, HelloWorldSchema, rowgroup_size_mb):
        rows_rdd = (
            spark.sparkContext.parallelize(range(rows_count))
            .map(row_generator)
            .map(lambda x: dict_to_spark_row(HelloWorldSchema, x))
        )
        spark.createDataFrame(rows_rdd, HelloWorldSchema.as_spark_schema()).coalesce(
            4
        ).write.mode("overwrite").parquet(output_url)

    # row-oriented read with decoded tensors
    with make_reader(output_url, spark=spark) as reader:
        for row in reader:
            print("row:", row.id, row.image1.shape, row.array_4d.shape)
            break

    # columnar read with a projection
    with make_batch_reader(output_url, spark=spark, schema_fields=["id"]) as reader:
        for batch in reader:
            print("batch ids:", batch.id.tolist())


if __name__ == "__main__":
    main()
