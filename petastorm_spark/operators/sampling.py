"""Distribution operators: sharding, shuffling, weighted sampling.

Parity surface: sharding petastorm/reader.py:573-597 (D1), seeded
shuffles petastorm/reader.py:666-682 + arrow_reader_worker.py:360-371
(D2/D3), WeightedSamplingReader petastorm/weighted_sampling_reader.py:20-115
(D9).

Two flavors throughout:
  - **random** (training-time): seeded ``rand()`` — reproducible for a
    fixed seed+plan, the Spark analogue of the reference's seeded RNG;
  - **deterministic** (pipeline-time): md5-keyed — row membership is a
    pure function of a key column, stable under repartitioning, data
    growth, and re-runs (what you want for 100 TB incremental runs).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from petastorm_spark.predicates import md5_fraction


def shard_dataframe(df: DataFrame, cur_shard: int, shard_count: int, key: str) -> DataFrame:
    """Deterministic row-level shard: md5-bucket of ``key`` mod
    shard_count. Every row lands in exactly one shard; membership is
    stable regardless of partitioning (unlike spark_partition_id)."""
    if not 0 <= cur_shard < shard_count:
        raise ValueError(f"cur_shard {cur_shard} outside [0, {shard_count})")
    return df.where(shard_id(key, shard_count) == F.lit(cur_shard))


def shard_id(key: str, shard_count: int):
    return F.floor(md5_fraction(key) * shard_count).cast("int")


def shuffle_dataframe(df: DataFrame, seed: int | None = None, global_sort: bool = False) -> DataFrame:
    """Seeded shuffle. ``global_sort=False`` permutes within partitions
    (no exchange — the scalable default, analogue of in-row-group
    shuffle D3); ``global_sort=True`` is a full ``ORDER BY rand(seed)``
    (one range exchange, analogue of piece-order+row shuffle)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return df.orderBy(r) if global_sort else df.sortWithinPartitions(r)


def weighted_mix(dfs: list[DataFrame], probabilities: list[float], key: str) -> DataFrame:
    """Deterministic weighted union (D9, pipeline flavor): source ``i``
    contributes the rows whose md5-fraction of ``key`` falls below
    p_i — i.e. an exact-expectation p_i sample of each source —
    unioned into one stream. Schemas must match (reference requirement).

    Scale: union of filtered scans; no shuffle at all.
    """
    if len(dfs) != len(probabilities):
        raise ValueError("need one probability per dataframe")
    norm = [p / sum(probabilities) for p in probabilities]
    out = None
    for df, p in zip(dfs, norm):
        part = df.where(md5_fraction(key) < F.lit(p))
        out = part if out is None else out.unionByName(part)
    return out


class WeightedSamplingReader:
    """Mix N readers: each ``next()`` draws reader i with probability
    p_i (seeded). Row-level parity with the reference's reader mixer."""

    def __init__(self, readers: list, probabilities: list[float], seed: int | None = None):
        if len(readers) != len(probabilities):
            raise ValueError("need one probability per reader")
        total = float(sum(probabilities))
        self._cum = np.cumsum([p / total for p in probabilities])
        self._readers = readers
        self._rng = np.random.default_rng(seed)
        first = readers[0].schema.field_names()
        for r in readers[1:]:
            if r.schema.field_names() != first:
                raise ValueError("all readers must share one schema")
        self.schema = readers[0].schema

    def __iter__(self):
        iters = [iter(r) for r in self._readers]
        probs = np.diff(np.concatenate([[0.0], self._cum]))
        alive = list(range(len(iters)))
        while alive:
            # renormalize over the surviving readers — falling back to a
            # fixed reader would skew the mixture after one exhausts.
            # If only zero-probability readers remain, drain them
            # uniformly (their rows are still part of the union).
            p = probs[alive]
            total = p.sum()
            p = p / total if total > 0 else np.full(len(alive), 1.0 / len(alive))
            i = alive[int(self._rng.choice(len(alive), p=p))]
            try:
                yield next(iters[i])
            except StopIteration:
                alive.remove(i)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        for r in self._readers:
            r.close()
