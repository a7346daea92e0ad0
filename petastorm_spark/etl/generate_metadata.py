"""Retrofit the petastorm_spark JSON sidecar onto an existing parquet
store (parity: petastorm/etl/petastorm_generate_metadata.py:47-111, S10).

    python -m petastorm_spark.etl.generate_metadata DATASET_URL
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from petastorm_spark.etl.dataset_metadata import read_sidecar, write_sidecar
from petastorm_spark.unischema import Unischema


def generate_metadata(
    spark: SparkSession, dataset_url: str, unischema: Unischema | None = None
) -> Unischema:
    """Write (or refresh) the sidecar. Without an explicit Unischema the
    schema is inferred from the store (keeping any tensor fields from a
    pre-existing sidecar, mirroring the reference's use_schema_from_dataset
    path)."""
    if unischema is None:
        existing = read_sidecar(spark, dataset_url)
        if existing is not None:
            unischema = Unischema.from_json(existing["unischema"])
        else:
            df = spark.read.parquet(dataset_url)
            unischema = Unischema.from_spark_schema(df.schema)
    from petastorm_spark.etl.dataset_metadata import collect_rowgroup_counts

    write_sidecar(
        spark,
        dataset_url,
        {
            "unischema": unischema.to_json(),
            "row_group_size_mb": None,
            "row_groups": collect_rowgroup_counts(spark, dataset_url),
        },
    )
    return unischema


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset_url")
    args = p.parse_args()

    from petastorm_spark.session import get_spark

    generate_metadata(get_spark("generate_metadata"), args.dataset_url)


if __name__ == "__main__":
    main()
