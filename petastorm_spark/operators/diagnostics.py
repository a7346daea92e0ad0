"""Scale-engineering diagnostics: the measurements you run BEFORE a
100 TB job, not after it dies.

``key_skew_report`` answers the question every shuffle plan hangs on —
"is this join/aggregation key skewed, and by how much?" — cheaply
enough to run as a pre-flight: one partially-aggregated count shuffle,
key-cardinality-sized state, driver sees only the top-N rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Per-key skew profile of a prospective shuffle key: the ``top_n``
    heaviest keys with their row share and cumulative share, plus the
    key-distribution entropy ratio (1.0 = perfectly uniform; near 0 =
    one key owns the data) and total key count stamped on every row.

    Read it like a pre-flight check: ``max frac`` >> 1/shuffle-
    partitions means the heaviest key bottlenecks one task (salt it or
    rely on AQE skew-join); a low ``entropy_ratio`` says the whole key
    choice is wrong, not just one value.

    Output (one row per top key, heaviest first):
      (rank, key, n_rows, frac, cum_frac, n_keys, entropy_ratio)
    floor-scaled to 1e-4. Deterministic: ties break on the key string.

    Scale: ONE partially-aggregated count shuffle (state = distinct
    keys); the entropy and totals are a second aggregate over that
    key-sized table; ranking happens on the key-sized table too, so
    nothing row-scale ever reaches a single task or the driver.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark.sql import Window

    cnt = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    tot = cnt.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("n_keys"),
        # H = log(total) - sum(n*log n)/total, in nats
        (
            F.log(F.sum("n_rows"))
            - F.sum(F.col("n_rows") * F.log("n_rows")) / F.sum("n_rows")
        ).alias("_h"),
    )
    # two-phase top-N (cap_per_group's pattern): a partition-local rank
    # discards beyond-N keys map-side, so the single-task global sort
    # sees at most top_n * num_partitions rows even when the key space
    # is web-scale (urls, user ids)
    local = Window.partitionBy("_pid").orderBy(
        F.col("n_rows").desc(), F.col("key").asc()
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    ranked = (
        cnt.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local))
        .where(F.col("_lr") <= top_n)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .drop("_pid", "_lr")
        .crossJoin(F.broadcast(tot))
    )
    frac = F.col("n_rows") / F.col("_total")
    cum = F.sum("n_rows").over(
        Window.orderBy(F.col("rank")).rowsBetween(Window.unboundedPreceding, 0)
    ) / F.col("_total")
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    ent_ratio = F.when(
        F.col("n_keys") > 1, F.col("_h") / F.log(F.col("n_keys"))
    ).otherwise(F.lit(0.0))
    return ranked.select(
        "rank",
        "key",
        "n_rows",
        f4(frac).alias("frac"),
        f4(cum).alias("cum_frac"),
        "n_keys",
        f4(ent_ratio).alias("entropy_ratio"),
    )


def corr_matrix_exact(
    df: DataFrame,
    cols: dict[str, int],
    group_col: str | None = None,
    out_decimals: int = 6,
) -> DataFrame:
    """Pearson correlation for every column pair, ENGINE-EXACT: each
    column is scaled to integers (``cols`` maps column -> decimal
    places, e.g. ``{"l_discount": 2}`` for cents-precision data) and
    the five sufficient statistics per pair (n, Sx, Sy, Sxy, Sxx, Syy)
    accumulate as DECIMAL(38,0) — INTEGER sums, immune to the
    float-summation-order differences that make naive ``corr()``
    disagree across engines in the last ulp. The final combination
    ``(n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))`` runs
    in double over identical inputs using only correctly-rounded IEEE
    ops (*, -, /, sqrt), so even the doubles are bit-reproducible.

    Output: one row per ``group_col`` value (or a single global row)
    with ``corr_<a>_<b>`` columns for each pair in sorted-name order,
    floor-scaled to ``out_decimals``. NULL when either side is
    constant. Headroom: DECIMAL(38,0) holds n*Sxy up to ~1e38 — at
    100 TB (n ~ 1e12, cent-scaled prices) the product peaks ~1e37.

    Scale: ONE partially-aggregated pass (map-side combine does almost
    all the work); the result is group-cardinality-sized.
    """
    names = sorted(cols)
    if len(names) < 2:
        raise ValueError(f"need >= 2 columns, got {names}")

    def iv(name: str):
        return F.round(F.col(name) * (10 ** cols[name]), 0).cast(
            "decimal(38,0)"
        )

    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    for a in names:
        aggs.append(F.sum(iv(a)).cast("decimal(38,0)").alias(f"_s_{a}"))
        aggs.append(
            F.sum(iv(a) * iv(a)).cast("decimal(38,0)").alias(f"_ss_{a}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum(iv(a) * iv(b)).cast("decimal(38,0)").alias(f"_sp_{a}_{b}")
            )
    grouped = df.groupBy(group_col) if group_col else df.groupBy()
    stats = grouped.agg(*aggs)

    def dbl(c: str):
        return F.col(c).cast("double")

    out_cols = [F.col(group_col)] if group_col else []
    scale = 10**out_decimals
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            n = dbl("_n")
            num = n * dbl(f"_sp_{a}_{b}") - dbl(f"_s_{a}") * dbl(f"_s_{b}")
            va = n * dbl(f"_ss_{a}") - dbl(f"_s_{a}") * dbl(f"_s_{a}")
            vb = n * dbl(f"_ss_{b}") - dbl(f"_s_{b}") * dbl(f"_s_{b}")
            corr = F.when(
                (va > 0) & (vb > 0),
                F.floor(num / F.sqrt(va * vb) * scale) / scale,
            )
            out_cols.append(corr.alias(f"corr_{a}_{b}"))
    return stats.select(*out_cols)


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Version diff between two snapshots of a dataset keyed by
    ``key_col``: which rows were added, removed, or changed (digest of
    ``compare_cols`` differs)? Output: (key, status, old_digest,
    new_digest) — unchanged rows are NOT emitted, so the result is
    difference-sized, not corpus-sized.

    The content digest is md5 over the compare columns joined with a
    0x1f separator (NULLs encoded as 0x00 so NULL vs '' differ).
    Digests are computed map-side and projected BEFORE the join: the
    full-outer shuffle carries (key, digest) pairs only, never row
    payloads. At 100 TB, bucket both snapshots by key at write time
    and the join is co-located with zero shuffle.
    """

    def dig() -> Column:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in compare_cols
        ]
        return F.md5(F.concat_ws("\x1f", *parts))

    o = old.select(F.col(key_col), dig().alias("old_digest"))
    n = new.select(F.col(key_col), dig().alias("new_digest"))
    j = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(key_col, "status", "old_digest", "new_digest")
    )
