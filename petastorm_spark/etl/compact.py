"""Dataset compaction — the small-file management pass every long-lived
100 TB store needs: streaming ingests and incremental appends leave
thousands of KB-sized parquet files whose per-file open/footer cost
dominates scans; compaction rewrites the dataset into ~``target_mb``
files and refreshes the engine sidecar so readers keep working.

The reference engine has no compaction (its datasets are written once
by one Spark job); this is operational surface a production deployment
needs on day one.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from petastorm_spark.etl.dataset_metadata import (
    load_unischema,
    materialize_dataset,
)
from petastorm_spark.unischema import Unischema


def dataset_size_bytes(dataset_url: str) -> int:
    """Total parquet bytes of a dataset (pyarrow fs listing)."""
    from petastorm_spark.reader import _list_parquet_files_fs, _resolve_fs

    pair = _resolve_fs(dataset_url)
    if pair is None:
        raise ValueError(f"unsupported dataset url {dataset_url!r}")
    fs, root = pair
    files = _list_parquet_files_fs(fs, root)
    return sum(fs.get_file_info(f).size or 0 for f in files)


def compact_dataset(
    spark: SparkSession,
    dataset_url: str,
    output_url: str,
    target_mb: int = 128,
    petastorm_compat: bool = True,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``dataset_url`` into ``output_url`` with ~``target_mb``
    per output file; returns the number of output partitions.

    The Unischema sidecar (and, when possible, the petastorm-compat
    footer) is carried over — a schema-less plain-parquet dataset gets
    one inferred from its Spark schema, so compaction also UPGRADES a
    bare directory into a fully-described engine dataset.

    ``partition_by`` preserves a hive-partitioned layout: rows are
    hash-repartitioned ON the partition columns before a
    ``partitionBy`` write, so each partition value lands in exactly
    one task and comes out as ONE file — the append-heavy case
    (ivf_append's cell directories) compacts to one file per cell
    WITHOUT losing the directory pruning readers depend on. Omitting
    it on a partitioned input would silently flatten the layout and
    break partition-filter pruning.

    Scale: one distributed read + repartition + write; no driver-side
    data. Row-group size is capped at the file target so a single
    output file holds >= 1 complete row group.
    """
    df = spark.read.parquet(dataset_url)
    schema = load_unischema(spark, dataset_url) or Unischema.from_spark_schema(
        df.schema
    )
    total = dataset_size_bytes(dataset_url)
    n_parts = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    with materialize_dataset(
        spark,
        output_url,
        schema,
        row_group_size_mb=min(target_mb, 128),
        petastorm_compat=petastorm_compat,
    ):
        if partition_by:
            from pyspark.sql import functions as F

            (
                df.repartition(n_parts, *[F.col(c) for c in partition_by])
                .write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(output_url)
            )
        else:
            df.repartition(n_parts).write.mode("overwrite").parquet(output_url)
    return n_parts
