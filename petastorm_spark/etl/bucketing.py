"""Bucketed-table support: pre-shuffle a fact table once at write time
so every later equi-join/aggregation on the bucket key runs without an
exchange — the single biggest repeated-shuffle saver for 100 TB star
schemas joined daily.

Spark's bucketing rides the session catalog (``saveAsTable``); readers
of the table see ``SortMergeJoin`` with NO ``Exchange`` on the bucketed
side when bucket counts line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally removes the sort step
    of later sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, table_name: str) -> bool:
    """True iff the catalog table carries bucket metadata."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    return any("Num Buckets" in (r.col_name or "") for r in rows)
