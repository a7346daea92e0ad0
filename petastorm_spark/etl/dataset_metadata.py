"""Write-side: materialize_dataset + the JSON metadata sidecar.

Parity surface: petastorm/etl/dataset_metadata.py:52-132 (context
manager), :160-178 (row-group size control), :194-241 (stored schema +
row-group stats). Differences by design:
  - metadata is versioned JSON in ``_petastorm_spark_metadata.json``,
    not pickles in the parquet ``_common_metadata`` footer (the
    reference flags its own pickling as a compat trap,
    petastorm/etl/dataset_metadata.py:201-202);
  - per-file row-group counts ARE stored (``row_groups``), like the
    reference's num_row_groups_per_file map: the Reader's iteration
    tier builds its piece list from them without opening a single
    footer. The plan tier never needs them (Spark reads footers
    itself). Counts are computed by a distributed Spark job for large
    datasets, a parallel driver scan for small ones.

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


def collect_rowgroup_counts(
    spark: SparkSession, dataset_url: str
) -> dict[str, int] | None:
    """{relative file path: num row groups} for the dataset — a
    distributed Spark job over the file list when it is large
    (reference model: petastorm/etl/dataset_metadata.py:208-241), a
    parallel driver-side footer scan when small. None if pyarrow
    cannot reach the filesystem."""
    import os

    from petastorm_spark.reader import (
        _list_parquet_files_fs,
        _parallel_footers,
        _resolve_fs,
    )

    pair = _resolve_fs(dataset_url)
    if pair is None:
        return None
    fs, root = pair
    files = _list_parquet_files_fs(fs, root)
    if not files:
        return {}
    if len(files) > 64:
        def count_fn(batches):
            import pandas as pd
            import pyarrow.parquet as _pq

            for b in batches:
                ns = []
                for p in b["path"]:
                    with fs.open_input_file(p) as fh:
                        ns.append(_pq.ParquetFile(fh).metadata.num_row_groups)
                yield pd.DataFrame({"path": b["path"], "n": ns})

        from petastorm_spark.session import arrow_local_df

        rows = (
            arrow_local_df(spark, {"path": list(files)}, "path string")
            .repartition(min(len(files), 256))
            .mapInPandas(count_fn, "path string, n int")
            .collect()
        )
        counts = {r.path: r.n for r in rows}
    else:
        counts = _parallel_footers(fs, files, lambda p, md: md.num_row_groups)
    rootp = root.rstrip("/")
    return {os.path.relpath(p, rootp): int(n) for p, n in counts.items()}


@contextmanager
def materialize_dataset(
    spark: SparkSession,
    dataset_url: str,
    schema: Unischema,
    row_group_size_mb: int | None = None,
    petastorm_compat: bool = True,
    manifest_part_cols=None,
    manifest_hash_cols=None,
):
    """Wrap a ``df.write.parquet(dataset_url)`` call: sets the parquet
    row-group size for the write and stores the Unischema sidecar after.

        with materialize_dataset(spark, url, schema, 32):
            df.write.mode("overwrite").parquet(url)

    With ``petastorm_compat`` (default), also writes the reference's
    ``_common_metadata`` footer (pickled Unischema + rowgroup-count
    keys, format /root/reference/petastorm/etl/dataset_metadata.py:194-241)
    so ORIGINAL petastorm readers can consume the dataset — mixed-fleet
    migrations where old trainers read new ETL output. Skipped with a
    warning when a codec has no byte-compatible reference equivalent.

    ``manifest_part_cols`` (optional) also writes the partition-digest
    snapshot manifest (``_ps_manifest/`` sidecar,
    :func:`operators.layout.write_dataset_manifest`) keyed by those
    columns — one extra scan at write time so later snapshot diffs
    (:func:`operators.layout.manifest_diff`) never re-scan the data;
    ``manifest_hash_cols`` narrows the digested payload (default: all
    non-key columns). The write-time sibling of the observed-metrics
    contract gate."""
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
    row_groups = collect_rowgroup_counts(spark, dataset_url)
    write_sidecar(
        spark,
        dataset_url,
        {
            "unischema": schema.to_json(),
            "row_group_size_mb": row_group_size_mb,
            "row_groups": row_groups,
        },
    )
    if petastorm_compat:
        from petastorm_spark.etl.petastorm_compat import (
            write_petastorm_compat_metadata,
        )

        write_petastorm_compat_metadata(dataset_url, schema, row_groups)
    if manifest_part_cols is not None:
        from petastorm_spark.operators.layout import write_dataset_manifest

        write_dataset_manifest(
            spark, dataset_url, manifest_part_cols, manifest_hash_cols
        )
