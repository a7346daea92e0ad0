"""Flat-profile classifier: min-of-2 wall per SF (sf0.001/0.01/0.1)
for the named registered queries, ONE fresh session — the
pre-registered evidence BASELINE.md's noise-vs-regression protocol
requires for every new or behavior-changed query. A query whose walls
are flat across three decades of data is scheduler-bound at bench SFs:
cross-session swings beyond +-25% on identical code are expected and
MUST NOT be read as regressions (the r13/r14 A/B precedent).

Usage: python tools/flat_profile.py <query> [<query> ...]
Prints one markdown row per query for BASELINE.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petastorm_spark.queries import QUERIES  # noqa: E402
from petastorm_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]


def timed(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit(__doc__)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(
        "flat_profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    for n in names:
        walls = [
            timed(spark, QUERIES[n], f"/root/testdata/sf{sf}") for sf in SFS
        ]
        flat = max(walls) <= 2.0 * min(walls)
        cls = "FLAT (scheduler-bound)" if flat else "data-bound"
        cells = " | ".join(f"{w:.2f}" for w in walls)
        print(f"| {n} | {cells} | {cls} |")


if __name__ == "__main__":
    main()
