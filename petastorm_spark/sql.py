"""SQL surface: register the engine's tables/datasets as temp views so
the full catalog is reachable with ``spark.sql(...)`` — Catalyst plans
SQL and DataFrame code identically, so everything in COVERAGE.md is
available to SQL users for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register each parquet table in ``sf_dir`` as a temp view."""
    names = names or TESTDATA_TABLES
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)
    return list(names)


def register_dataset(spark: SparkSession, dataset_url: str, view_name: str) -> None:
    """Register a (petastorm-style or plain) dataset dir as a view."""
    spark.read.parquet(dataset_url).createOrReplaceTempView(view_name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
