"""Shuffle-quality analysis (parity surface:
petastorm/test_util/shuffling_analysis.py:30-90, re-expressed — the
reference generates an id dataset and measures the rank correlation of
read order vs natural order across repeated shuffled reads).

A perfectly shuffled read has |Spearman rho| near 0 against the sorted
order; an unshuffled read has rho == 1. Use this to compare shuffle
knob settings (shuffle_row_groups / shuffle_rows /
shuffle_row_drop_partitions) quantitatively.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from petastorm_spark.codecs import ScalarCodec
from petastorm_spark.etl.dataset_metadata import materialize_dataset
from petastorm_spark.reader import make_reader
from petastorm_spark.unischema import Unischema, UnischemaField, dict_to_spark_row

_ShuffleAnalysisSchema = Unischema(
    "_ShuffleAnalysisSchema",
    [UnischemaField("id", np.int64, (), None, False)],
)


def generate_shuffle_analysis_dataset(
    spark: SparkSession,
    output_dataset_url: str,
    num_rows: int = 1000,
    row_group_size: int = 100,
) -> None:
    """Sorted id dataset split into ``num_rows / row_group_size`` row
    groups — the canonical input for shuffle-quality measurement."""
    from pyspark.sql import functions as F

    with materialize_dataset(spark, output_dataset_url, _ShuffleAnalysisSchema):
        (
            spark.range(num_rows)
            .select(F.col("id").cast("long"))
            .sort("id")
            .coalesce(max(1, num_rows // row_group_size))
            .write.mode("overwrite")
            .option("compression", "none")
            .parquet(output_dataset_url)
        )


def _spearman_rho(order: np.ndarray) -> float:
    """Spearman rank correlation of the observed order vs sorted order."""
    n = len(order)
    ranks = np.empty(n)
    ranks[np.argsort(order)] = np.arange(n)
    ideal = np.arange(n)
    d = ranks - ideal
    return float(1 - 6 * np.sum(d * d) / (n * (n * n - 1)))


def compute_correlation_distribution(
    dataset_url: str,
    id_column: str = "id",
    num_corr_samples: int = 10,
    seed: int | None = None,
    **reader_kwargs,
) -> dict:
    """Read the dataset ``num_corr_samples`` times with the given
    reader options and report the distribution of |Spearman rho|
    between the observed read order and the sorted order.

    ``seed`` makes the measurement reproducible: sample ``i`` reads
    with ``seed + i`` (distinct permutations, deterministic run).
    Unseeded, each sample draws a fresh random permutation.

    Returns {"mean_abs_rho", "max_abs_rho", "samples"} — lower is
    better-shuffled; an unshuffled reader reports 1.0 exactly.
    """
    rhos = []
    for i in range(num_corr_samples):
        kwargs = dict(reader_kwargs)
        if seed is not None:
            kwargs["seed"] = seed + i
        with make_reader(dataset_url, **kwargs) as r:
            ids = np.array([getattr(row, id_column) for row in r])
        rhos.append(abs(_spearman_rho(ids)))
    return {
        "mean_abs_rho": float(np.mean(rhos)),
        "max_abs_rho": float(np.max(rhos)),
        "samples": rhos,
    }
