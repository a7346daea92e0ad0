"""Dataset->dataset copy with projection / not-null filter / repartition.

Parity surface: petastorm/tools/copy_dataset.py:34-90 (S9). The
reference is already a Spark job; this is the same plan with the JSON
sidecar carried over. Usable as a module function or CLI:

    python -m petastorm_spark.tools.copy_dataset SRC DST \
        --field-regex 'id.*' --not-null-fields id --partitions 8
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from petastorm_spark.etl.dataset_metadata import load_unischema, materialize_dataset
from petastorm_spark.unischema import Unischema


def copy_dataset(
    spark: SparkSession,
    source_url: str,
    target_url: str,
    field_regex: list[str] | None = None,
    not_null_fields: list[str] | None = None,
    partitions_count: int | None = None,
    row_group_size_mb: int | None = None,
) -> None:
    df = spark.read.parquet(source_url)
    schema = load_unischema(spark, source_url) or Unischema.from_spark_schema(df.schema)

    if field_regex:
        schema = schema.create_schema_view(field_regex)
        df = df.select(*schema.field_names())
    if not_null_fields:
        for fname in not_null_fields:
            df = df.where(F.col(fname).isNotNull())
    if partitions_count:
        df = df.repartition(partitions_count)

    with materialize_dataset(spark, target_url, schema, row_group_size_mb):
        df.write.mode("errorifexists").parquet(target_url)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source_url")
    p.add_argument("target_url")
    p.add_argument("--field-regex", nargs="*", default=None)
    p.add_argument("--not-null-fields", nargs="*", default=None)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--row-group-size-mb", type=int, default=None)
    args = p.parse_args()

    from petastorm_spark.session import get_spark

    copy_dataset(
        get_spark("copy_dataset"),
        args.source_url,
        args.target_url,
        field_regex=args.field_regex,
        not_null_fields=args.not_null_fields,
        partitions_count=args.partitions,
        row_group_size_mb=args.row_group_size_mb,
    )


if __name__ == "__main__":
    main()
