"""Write-side: materialize_dataset + the JSON metadata sidecar.

Parity surface: petastorm/etl/dataset_metadata.py:52-132 (context
manager), :160-178 (row-group size control), :194-241 (stored schema +
row-group stats). Differences by design:
  - metadata is versioned JSON in ``_petastorm_spark_metadata.json``,
    not pickles in the parquet ``_common_metadata`` footer (the
    reference flags its own pickling as a compat trap,
    petastorm/etl/dataset_metadata.py:201-202);
  - row-group counts are not stored — Spark's split planning reads
    parquet footers itself; we store only the schema and write config.

All filesystem access goes through the Hadoop FileSystem API of the
live JVM, so the same code works on file://, hdfs://, s3a://, gs://.
"""

from __future__ import annotations

import json
from contextlib import contextmanager

from pyspark.sql import SparkSession

from petastorm_spark.unischema import Unischema

SIDECAR_NAME = "_petastorm_spark_metadata.json"


def _fs_and_path(spark: SparkSession, url: str):
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(url)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, path


def write_sidecar(spark: SparkSession, dataset_url: str, payload: dict) -> None:
    fs, dpath = _fs_and_path(spark, dataset_url)
    jvm = spark.sparkContext._jvm
    spath = jvm.org.apache.hadoop.fs.Path(dpath, SIDECAR_NAME)
    out = fs.create(spath, True)
    try:
        out.write(bytearray(json.dumps(payload, indent=1).encode()))
    finally:
        out.close()


def read_sidecar(spark: SparkSession, dataset_url: str) -> dict | None:
    fs, dpath = _fs_and_path(spark, dataset_url)
    jvm = spark.sparkContext._jvm
    spath = jvm.org.apache.hadoop.fs.Path(dpath, SIDECAR_NAME)
    if not fs.exists(spath):
        return None
    stream = fs.open(spath)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode())


def load_unischema(spark: SparkSession, dataset_url: str) -> Unischema | None:
    payload = read_sidecar(spark, dataset_url)
    if payload is None:
        return None
    return Unischema.from_json(payload["unischema"])


@contextmanager
def materialize_dataset(
    spark: SparkSession,
    dataset_url: str,
    schema: Unischema,
    row_group_size_mb: int | None = None,
):
    """Wrap a ``df.write.parquet(dataset_url)`` call: sets the parquet
    row-group size for the write and stores the Unischema sidecar after.

        with materialize_dataset(spark, url, schema, 32):
            df.write.mode("overwrite").parquet(url)
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    if row_group_size_mb is not None:
        hconf.setInt("parquet.block.size", row_group_size_mb * 1024 * 1024)
    try:
        yield
    finally:
        if row_group_size_mb is not None:
            if old_block is None:
                hconf.unset("parquet.block.size")
            else:
                hconf.set("parquet.block.size", old_block)
    write_sidecar(
        spark,
        dataset_url,
        {
            "unischema": schema.to_json(),
            "row_group_size_mb": row_group_size_mb,
        },
    )
