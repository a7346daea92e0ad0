"""Secondary (data-skipping) indexes: value -> file-set tables.

Parity surface: petastorm/etl/rowgroup_indexing.py:37-80 (I1 build),
petastorm/etl/rowgroup_indexers.py (I2 SingleFieldIndexer, I3
FieldNotNullIndexer), petastorm/selectors.py (I4-I6 selectors),
selector application petastorm/reader.py:599-618.

Design difference: the reference pickles an inverted index into the
parquet footer at row-group granularity. Here the index is itself a
parquet table (``<dataset>/_ps_index/<name>/``) built by a distributed
Spark job at *file* granularity — the natural skipping unit for Spark
split planning (a pruned file list goes straight into
``spark.read.parquet(*files)``). Within the surviving files, parquet
row-group min/max stats still skip at the finer grain for free.

Scale: index build is one groupBy over (value, file) — shuffle sized by
distinct values, not rows; query-time pre-pass reads only the (tiny)
index table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_DIRNAME = "_ps_index"


def _index_path(dataset_url: str, index_name: str) -> str:
    return f"{dataset_url.rstrip('/')}/{INDEX_DIRNAME}/{index_name}"


class SingleFieldIndexer:
    """Inverted index value -> file set for one column. Array columns
    index each element (reference parity: rowgroup_indexers.py:21-75)."""

    def __init__(self, index_name: str, column: str, explode_arrays: bool = False):
        self.index_name = index_name
        self.column = column
        self.explode_arrays = explode_arrays

    def build(self, df: DataFrame) -> DataFrame:
        val = (
            F.explode(F.col(self.column))
            if self.explode_arrays
            else F.col(self.column)
        )
        return (
            df.select(val.alias("value"), F.input_file_name().alias("file"))
            .where(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.collect_set("file").alias("files"))
        )


class FieldNotNullIndexer:
    """Files containing at least one non-null value of the column
    (reference parity: rowgroup_indexers.py:78-124)."""

    def __init__(self, index_name: str, column: str):
        self.index_name = index_name
        self.column = column

    def build(self, df: DataFrame) -> DataFrame:
        return (
            df.where(F.col(self.column).isNotNull())
            .select(F.lit("__not_null__").alias("value"), F.input_file_name().alias("file"))
            .groupBy("value")
            .agg(F.collect_set("file").alias("files"))
        )


def build_rowgroup_index(
    spark: SparkSession, dataset_url: str, indexers: list
) -> None:
    """Build and store each index as a parquet table under the dataset
    (I1). Distributed: one Spark job per index."""
    df = spark.read.parquet(dataset_url)
    for indexer in indexers:
        out = indexer.build(df)
        out.write.mode("overwrite").parquet(
            _index_path(dataset_url, indexer.index_name)
        )


def list_indexes(spark: SparkSession, dataset_url: str) -> list[str]:
    from petastorm_spark.etl.dataset_metadata import _fs_and_path

    fs, dpath = _fs_and_path(spark, f"{dataset_url.rstrip('/')}/{INDEX_DIRNAME}")
    if not fs.exists(dpath):
        return []
    return [s.getPath().getName() for s in fs.listStatus(dpath)]


class SingleIndexSelector:
    """Files whose index contains ANY of the given values (I4)."""

    def __init__(self, index_name: str, values: list):
        self.index_name = index_name
        self.values = list(values)

    def select_files(self, spark: SparkSession, dataset_url: str) -> set[str]:
        idx = spark.read.parquet(_index_path(dataset_url, self.index_name))
        rows = (
            idx.where(F.col("value").isin(self.values))
            .select(F.explode("files").alias("f"))
            .distinct()
            .collect()
        )
        return {r.f for r in rows}


class IntersectIndexSelector:
    """AND of single-index selections (I5)."""

    def __init__(self, selectors: list):
        self.selectors = selectors

    def select_files(self, spark: SparkSession, dataset_url: str) -> set[str]:
        sets = [s.select_files(spark, dataset_url) for s in self.selectors]
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return out


class UnionIndexSelector:
    """OR of single-index selections (I6)."""

    def __init__(self, selectors: list):
        self.selectors = selectors

    def select_files(self, spark: SparkSession, dataset_url: str) -> set[str]:
        out: set[str] = set()
        for s in self.selectors:
            out |= s.select_files(spark, dataset_url)
        return out
