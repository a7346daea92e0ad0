"""Round-14 decade receipts, part 2: the non-IVF new query families
(Heaps vocab growth, exact equi-depth boundaries, inter-arrival gap
report) measured sf1 -> sf10 on organic replicas.

Replica semantics (honest multiplicity, the scaling_r13 rules):

- ``documents``: doc_id shift per replica, and replica i>0 gets its
  text tokens suffixed ``@ri`` via regexp (every token becomes a NEW
  vocab type) — the honest Heaps axis: more data means new sources
  with their own vocabularies, so BOTH the token count and the vocab
  keep growing (pure duplication would saturate vocab at the base
  corpus's and measure nothing).
- ``orders``: o_orderkey shift; o_totalprice jittered by an exact
  per-replica integer cent offset (i cents) so the global order
  statistic actually has 10x distinct values to rank, not 10 copies
  of each.
- ``events``: the scaling_r13 replicas (event_id AND user_id shifts
  — the user population grows linearly, the honest axis for a
  per-user gap report: more data = more series).

Usage: python tools/scaling_r14b.py  (markdown rows for SCALING_OUT.md)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import ROOT, SHIFT, build, timed  # noqa: E402

SRC = "/root/testdata/sf0.1"


def build_extra(spark, replicas: int, dst: str) -> None:
    params = f"replicas={replicas};shift={SHIFT};r14b-v1"
    marker = f"{dst}/_BUILD_COMPLETE_R14B"
    if os.path.exists(marker) and open(marker).read().strip() == params:
        return
    t0 = time.perf_counter()

    dbase = spark.read.parquet(f"{SRC}/documents.parquet")
    out = None
    for i in range(replicas):
        part = dbase.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        if i > 0:
            part = part.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1@r{i}")
            )
        out = part if out is None else out.unionByName(part)
    out.repartition(max(4, replicas // 12)).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )

    obase = spark.read.parquet(f"{SRC}/orders.parquet")
    out = None
    for i in range(replicas):
        part = obase.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * SHIFT)
        ).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(i) / F.lit(100.0)
        )
        out = part if out is None else out.unionByName(part)
    out.repartition(max(8, replicas // 3)).write.mode("overwrite").parquet(
        f"{dst}/orders.parquet"
    )
    print(f"built r14b extras {dst} x{replicas}: "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    with open(marker, "w") as f:
        f.write(params + "\n")


def main() -> None:
    from petastorm_spark.queries import QUERIES

    spark = get_spark("scaling_r14b")
    build(spark, 10, f"{ROOT}/sf1")       # events replicas (r13 builder)
    build(spark, 100, f"{ROOT}/sf10")
    build_extra(spark, 10, f"{ROOT}/sf1")
    build_extra(spark, 100, f"{ROOT}/sf10")

    for name in ("vocab_growth_heaps", "equidepth_hist_prices",
                 "event_gap_report"):
        w1, n1 = timed(spark, lambda: QUERIES[name](spark, f"{ROOT}/sf1").count())
        w10, n10 = timed(
            spark, lambda: QUERIES[name](spark, f"{ROOT}/sf10").count()
        )
        print(f"| {name} | {w1:.2f}s | {w10:.2f}s | {w10 / w1:.1f}x | "
              f"rows {n1:,} -> {n10:,} |", flush=True)


if __name__ == "__main__":
    main()
