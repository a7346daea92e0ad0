"""WebDataset tar-shard sink and source: the sequential-read shard
format multimodal training loaders consume (one tar per shard, one
file per sample per column — ``{key}.{ext}`` entries, samples grouped
by key). The petastorm-side twin is the parquet dataset the rest of
the engine reads; this sink exists for handing curated corpora to
tar-streaming dataloaders without an export hop.

Spark-first shape: the caller decides sharding with an integer shard
column (``operators.layout.shard_plan`` produces balanced ones), the
writer repartitions BY that column so each task owns whole shards and
streams one tar per shard — no driver collect, no cross-task
coordination, output parallelism = number of shards. Binary columns
land as raw payload files; everything else is encoded as JSON in a
single ``{key}.json`` entry per sample (the WebDataset convention).

Determinism: entries are written sample-by-sample in ascending key
order with zeroed tar timestamps, so a shard's bytes are a pure
function of its rows — re-runs produce identical tars (byte-stable
artifacts diff cleanly across pipeline versions).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


def _tar_add(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0  # byte-stable shards
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    shard_col: str = "shard",
    prefix: str = "shard",
) -> int:
    """Write one ``{prefix}-{shard:06d}.tar`` per distinct value of
    ``shard_col``. Binary columns become ``{key}.{column}`` entries;
    all other columns are gathered into one ``{key}.json`` entry.
    Returns the number of shards written.

    Scale: one hash repartition on the shard column, then each task
    streams its shards' tars sequentially — memory is one sample at a
    time, IO is append-only, and shard count bounds parallelism
    exactly the way a 1000-executor export wants. Keys sort within a
    shard so output bytes are run-independent."""
    os.makedirs(out_dir, exist_ok=True)
    bin_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, BinaryType) and f.name != key_col
    ]
    meta_cols = [
        f.name
        for f in df.schema.fields
        if f.name not in bin_cols and f.name not in (key_col, shard_col)
    ]
    cols = [key_col, shard_col, *bin_cols, *meta_cols]

    def write_shards(rows) -> Iterator[tuple[int]]:
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r[shard_col], []).append(r)
        for shard, samples in by_shard.items():
            path = os.path.join(out_dir, f"{prefix}-{int(shard):06d}.tar")
            with tarfile.open(path, "w") as tar:
                for r in sorted(samples, key=lambda x: x[key_col]):
                    key = str(r[key_col])
                    for c in bin_cols:
                        if r[c] is not None:
                            _tar_add(tar, f"{key}.{c}", bytes(r[c]))
                    meta = {c: r[c] for c in meta_cols}
                    payload = json.dumps(
                        meta, sort_keys=True, default=str
                    ).encode()
                    _tar_add(tar, f"{key}.json", payload)
            yield (1,)

    written = (
        df.select(*cols)
        .repartition(shard_col)
        .rdd.mapPartitions(write_shards)
        .count()
    )
    return int(written)


def read_webdataset(
    spark: SparkSession, in_dir: str, prefix: str = "shard"
) -> DataFrame:
    """Read WebDataset shards back into (key, column, payload) rows —
    one row per tar entry, distributed one task per shard via
    binaryFile on the tars themselves. Regroup with
    ``groupBy('key').pivot('column')`` when a wide frame is wanted;
    the long shape is the streaming-friendly one."""
    tars = spark.read.format("binaryFile").load(
        os.path.join(in_dir, f"{prefix}-*.tar")
    )

    def explode_tar(rows):
        import pandas as pd

        for pdf in rows:
            out = {"key": [], "column": [], "payload": []}
            for raw in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(raw))) as tar:
                    for m in tar.getmembers():
                        key, _, col = m.name.rpartition(".")
                        out["key"].append(key)
                        out["column"].append(col)
                        out["payload"].append(tar.extractfile(m).read())
            yield pd.DataFrame(out)

    return (
        tars.select("content")
        .mapInPandas(explode_tar, "key string, column string, payload binary")
    )


def webdataset_to_frame(long_df: DataFrame) -> DataFrame:
    """Pivot the (key, column, payload) long shape back into one row
    per sample with a binary column per entry extension — the inverse
    of write_webdataset's layout for consumers that want a frame
    instead of a stream. Scale: one groupBy-pivot on the sample key;
    column set is the (small, fixed) extension vocabulary."""
    cols = [
        r.column
        for r in long_df.select("column").distinct().collect()
    ]
    return (
        long_df.groupBy("key")
        .pivot("column", sorted(cols))
        .agg(F.first("payload"))
    )
