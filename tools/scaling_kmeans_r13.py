"""Round-13 decade receipt for the engine-exact k-means family:
kmeans_lloyd (report path — fit + final assignment + report agg) and
the cluster-balanced sampler's assign path, sf1 vs sf10 on the same
HONEST-multiplicity organic embeddings scaling_r13.py builds (vec_id
shift + seeded signed coordinate permutation per replica).

Expected shape: (rounds+1) linear corpus scans with per-row k*dims
integer folds + one <= k*dims-row exchange per round — wall should
grow ~linearly with N (the only driver-side state is k x dims ints).

Usage: python tools/scaling_kmeans_r13.py   (prints markdown rows)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import ROOT, build, timed  # noqa: E402


def main() -> None:
    spark = get_spark("scaling_kmeans_r13")
    build(spark, 10, f"{ROOT}/sf1")
    build(spark, 100, f"{ROOT}/sf10")

    from petastorm_spark.operators.similarity import kmeans_lloyd

    for name, kw in (
        ("kmeans_lloyd_report", dict(output="report")),
        ("kmeans_lloyd_assign", dict(output="assign")),
        ("kmeans_lloyd_assign_numpy", dict(output="assign", kernel="numpy")),
    ):
        walls = {}
        for sf in ("sf1", "sf10"):
            emb = spark.read.parquet(f"{ROOT}/{sf}/embeddings.parquet")
            w, n = timed(
                spark,
                lambda e=emb: kmeans_lloyd(
                    e, k=8, dims=8, rounds=2, **kw
                ).count(),
            )
            walls[sf] = (w, n)
        w1, n1 = walls["sf1"]
        w10, n10 = walls["sf10"]
        print(
            f"| {name} | {w1:.2f}s | {w10:.2f}s | {w10 / w1:.1f}x | "
            f"{n1:,} -> {n10:,} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
