"""Order-dependent per-key folds: exponentially-weighted moving
average over event-time-ordered values.

An EWMA is a sequential fold (e_i = a*v_i + (1-a)*e_{i-1}) — something
built-in SQL aggregates cannot express — so it is the canonical shape
for Spark's custom-stateful surface:

  - batch: ``ewma_by_key`` via ``applyInPandas`` (vectorized closed
    form per group, no per-row python loop);
  - streaming: ``running_ewma_stream`` (streaming/feed.py) via
    ``applyInPandasWithState`` with the SAME fold, state = (count,
    ewma, last_ts) per key in the state store.

Order contract (ties): values fold in (ts, value) order — a total
order up to interchangeable duplicates, so the fold result is
deterministic and the DuckDB oracle (list_reduce over
list(value ORDER BY ts, value)) reproduces it bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)


def ts_as_int(v) -> int:
    """Event-time scalar -> int for the bigint ``last_ts`` output:
    integral values pass through; pandas/numpy datetimes become
    epoch-microseconds (matching DuckDB's ``epoch_us``)."""
    if isinstance(v, pd.Timestamp):
        return v.value // 1000  # pandas stores ns; emit µs
    if isinstance(v, np.datetime64):
        return int(v.astype("datetime64[us]").astype(np.int64))
    return int(v)


def ewma_update(
    values: np.ndarray, alpha: float, prev: float | None
) -> float | None:
    """Fold ``values`` (already in event order) into a running EWMA.

    Closed form instead of a per-row loop:
      e_n = (1-a)^n * e_prev + a * sum_i (1-a)^(n-1-i) * v_i
    with e_0 = v_0 when there is no prior state (pandas ewm
    ``adjust=False`` convention).
    """
    v = np.asarray(values, dtype=np.float64)
    if v.size == 0:
        return prev
    if prev is None:
        prev_val, v = float(v[0]), v[1:]
        if v.size == 0:
            return prev_val
    else:
        prev_val = float(prev)
    n = v.size
    decay = np.power(1.0 - alpha, np.arange(n - 1, -1, -1, dtype=np.float64))
    return float((1.0 - alpha) ** n * prev_val + alpha * np.dot(decay, v))


def ewma_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """Batch per-key EWMA in (ts, value) order: key, n_events, ewma,
    last_ts. Scale: one hash shuffle on the key; the fold itself is a
    vectorized Arrow-batched pandas function per group."""
    out_schema = (
        f"{key_col} bigint, n_events bigint, ewma double, last_ts bigint"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [ewma_update(pdf[value_col].to_numpy(), alpha, None)],
                "last_ts": [ts_as_int(pdf[ts_col].iloc[-1])],
            }
        )

    return df.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        fold, out_schema
    )


def cusum_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    target,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-key CUSUM change-point scores via the prefix identity —
    ``s_i = max(0, s_{i-1} + (x_i - target))`` equals
    ``prefix_i - min(prefix_0..i)`` where ``prefix`` is the running
    sum of ``(x - target)`` — so the classic sequential drift monitor
    becomes TWO window aggregates (cumulative sum + running min), no
    fold, no UDF, engine-reproducible. Emits every event's upward
    CUSUM score; filter/max downstream for alarms.

    Output: input rows + ``cusum`` (same type as the running sum).
    Feed INTEGER deviations (e.g. micro-units) when cross-engine
    exactness matters: integer prefix sums are exact, while double
    windowed sums differ in the last ulp between engines (DuckDB's
    segment-tree summation order). Scale: one key shuffle +
    partition-local sort, both windows share the exchange.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = F.col(value_col) - target
    prefix = F.sum(dev).over(w)
    # Spark cannot nest window functions: materialize prefix first
    out = df.withColumn("_prefix", prefix)
    w2 = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cusum = F.col("_prefix") - F.least(
        F.min("_prefix").over(w2), F.lit(0).cast("bigint")
        if dict(df.dtypes)[value_col] in ("bigint", "int")
        else F.lit(0.0)
    )
    return out.withColumn("cusum", cusum).drop("_prefix")
