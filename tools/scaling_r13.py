"""Round-13 decade receipts: sf1->sf10 organic scaling for the
round-12 operator families the r12 verdict flagged (#6), plus the
knn_graph auto-sizing candidate-volume receipt (#3).

Builds /tmp/ps_scale_r13/{sf1,sf10} with HONEST-multiplicity replicas
of exactly the three tables these measurements read (nothing else):

- ``embeddings``  vec_id shift + seeded signed coordinate permutation
  per replica (orthogonal — within-replica cosines exact,
  cross-replica random-pair-sized), the build_sf1_organic map.
- ``events``      event_id AND user_id shifts per replica — the USER
  population grows linearly (the honest axis for per-user resampling:
  more data means more series, not 100x-denser ones).
- ``customer``    c_custkey shift + c_mktsegment prefixed ``r{i}-``
  per replica — the k-anonymity QI CLASS population grows linearly
  with preserved class-size distribution (more data = more classes,
  not 100x-deeper ones).

Measurements (min-of-2, bench GC discipline), sf1 vs sf10:
- embedding_dim_robust_stats / embedding_outliers: the registered
  queries (they read only embeddings) — the weighted-median / per-dim
  rank machinery the verdict suspected of super-linearity.
- resample interp: the resample_ffill operator over ALL users (the
  registered query caps user_id < 50, which would measure a constant
  subset at any scale).
- pii_k_anonymity: the registered query (reads only customer).
- knn_graph auto: derived n_cells, MEASURED candidate-join volume
  (sum over cells of members x probers, minus self-pairs) under the
  auto quantizer, and the graph wall with the production numpy
  kernel. Pass criterion: volume grows ~ N^1.5 (sqrt(10) * 10 ~ 32x
  per decade), nowhere near N^2 (100x).

Usage: python tools/scaling_r13.py   (prints markdown rows for
SCALING_OUT.md)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.queries import QUERIES  # noqa: E402
from petastorm_spark.session import get_spark  # noqa: E402
from scaling_study import _signed_perm_expr  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/ps_scale_r13"
SHIFT = 10**9


def build(spark, replicas: int, dst: str) -> None:
    params = f"replicas={replicas};shift={SHIFT};r13-v1"
    marker = f"{dst}/_BUILD_COMPLETE"
    if os.path.exists(marker) and open(marker).read().strip() == params:
        return
    os.makedirs(dst, exist_ok=True)
    t0 = time.perf_counter()

    ebase = spark.read.parquet(f"{SRC}/embeddings.parquet")
    out = None
    for i in range(replicas):
        part = ebase.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        if i > 0:
            part = part.withColumn(
                "embedding", F.expr(_signed_perm_expr(64, 3000 + i))
            )
        out = part if out is None else out.unionByName(part)
    out.repartition(max(4, replicas // 12)).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )

    evbase = spark.read.parquet(f"{SRC}/events.parquet")
    out = None
    for i in range(replicas):
        part = evbase.withColumn(
            "event_id", F.col("event_id") + F.lit(i * SHIFT)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * SHIFT))
        out = part if out is None else out.unionByName(part)
    out.repartition(max(8, replicas // 3)).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )

    cbase = spark.read.parquet(f"{SRC}/customer.parquet")
    out = None
    for i in range(replicas):
        part = cbase.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * SHIFT)
        )
        if i > 0:
            part = part.withColumn(
                "c_mktsegment", F.concat(F.lit(f"r{i}-"), "c_mktsegment")
            )
        out = part if out is None else out.unionByName(part)
    out.repartition(max(4, replicas // 12)).write.mode("overwrite").parquet(
        f"{dst}/customer.parquet"
    )

    print(f"built {dst} x{replicas}: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    with open(marker, "w") as f:
        f.write(params + "\n")


def timed(spark, fn) -> tuple[float, int]:
    best, n = float("inf"), 0
    for _ in range(2):  # min-of-2, the SCALING_OUT convention
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    return best, n


def resample_all_users(spark, sf_dir: str):
    from petastorm_spark.operators.temporal import resample_ffill
    from petastorm_spark.session import events_ts_us

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.withColumn("ts_us", events_ts_us(ev)).select(
        "user_id", "ts_us", "value", "event_id"
    )
    return resample_ffill(
        ev, "user_id", "ts_us", "value", 86_400_000_000, "event_id",
        fill="interp",
    )


def knn_auto_receipt(spark, sf_dir: str) -> dict:
    """Derived n_cells, measured candidate volume, and graph wall
    under the auto path (sqrt(N) + k-means quantizer)."""
    from petastorm_spark.operators.similarity import (
        _knn_quantizer,
        _probe_cells_numpy,
        auto_n_cells,
        knn_graph,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    n_cells = auto_n_cells(n)
    cent = _knn_quantizer(emb, "vec_id", "embedding", None, None)
    crows = cent.select("cell", "cent_vec").collect()
    probed = _probe_cells_numpy(
        emb, crows, "vec_id", "embedding", 2, keep_order=True
    )
    members = (
        probed.select(F.get("_cells", 0).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    probers = (
        probed.select(F.explode("_cells").alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("p"))
    )
    vol = (
        members.join(probers, "cell")
        .agg(F.sum(F.col("m") * F.col("p")).alias("v"))
        .collect()[0]["v"]
    ) - n  # each vector meets itself once, in its home cell
    wall, edges = timed(
        spark,
        lambda: knn_graph(
            emb, k=3, n_probe=2, centroids=cent, score_kernel="numpy"
        ).count(),
    )
    return {
        "N": n, "n_cells": len(crows), "auto_n_cells": n_cells,
        "cand_volume": int(vol), "wall": wall, "edges": edges,
    }


def main() -> None:
    spark = get_spark("scaling_r13")
    build(spark, 10, f"{ROOT}/sf1")
    build(spark, 100, f"{ROOT}/sf10")

    rows = []
    for name, fn in (
        ("embedding_dim_robust_stats",
         lambda d: QUERIES["embedding_dim_robust_stats"](spark, d).count()),
        ("embedding_outliers",
         lambda d: QUERIES["embedding_outliers"](spark, d).count()),
        ("resample_all_users_interp",
         lambda d: resample_all_users(spark, d).count()),
        ("pii_k_anonymity",
         lambda d: QUERIES["pii_k_anonymity"](spark, d).count()),
    ):
        w1, n1 = timed(spark, lambda: fn(f"{ROOT}/sf1"))
        w10, n10 = timed(spark, lambda: fn(f"{ROOT}/sf10"))
        rows.append((name, w1, n1, w10, n10))
        print(f"| {name} | {w1:.2f}s | {w10:.2f}s | {w10 / w1:.1f}x | "
              f"{n1:,} -> {n10:,} |", flush=True)

    k1 = knn_auto_receipt(spark, f"{ROOT}/sf1")
    k10 = knn_auto_receipt(spark, f"{ROOT}/sf10")
    for tag, k in (("sf1", k1), ("sf10", k10)):
        print(
            f"| knn_graph auto {tag} | N={k['N']:,} | n_cells={k['n_cells']} "
            f"(auto {k['auto_n_cells']}) | cand={k['cand_volume']:,} | "
            f"wall={k['wall']:.2f}s | edges={k['edges']:,} |", flush=True
        )
    print(
        f"volume ratio {k10['cand_volume'] / k1['cand_volume']:.1f}x for "
        f"10x vectors (N^1.5 predicts ~{10 ** 1.5:.0f}x, N^2 would be 100x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
