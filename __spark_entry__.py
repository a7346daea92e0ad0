"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001
queries()      -> every implemented operator from SURVEY.md §2
oracle_sql()   -> DuckDB-equivalent SQL per query (correctness gate)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from petastorm_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary at sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
