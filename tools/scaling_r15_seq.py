"""Round-15 decade receipts: the two new sequence queries
(event_transition_matrix, session_paths_topk) measured sf1 -> sf10 on
the scaling_r13 ORGANIC events replicas (event_id AND user_id shifted
per replica — the user population grows linearly, the honest axis for
per-user sequence work: more data means more series, not 100x-denser
ones).

Expected shape: both queries are ONE user_id exchange + windows whose
partitions (user sequences) keep constant length, then partial-agg
groupBys on bounded domains (K^2 type pairs / K^3 paths) — wall should
grow sublinearly with the decade (shuffle volume linear, reduce side
constant).

Usage: python tools/scaling_r15_seq.py  (markdown for SCALING_OUT.md)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from petastorm_spark.queries_llm import (  # noqa: E402
    event_transition_matrix,
    session_paths_topk,
)
from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import ROOT, build, timed  # noqa: E402


def main() -> None:
    spark = get_spark(
        "scaling_r15_seq",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    build(spark, 10, f"{ROOT}/sf1")
    build(spark, 100, f"{ROOT}/sf10")
    for name, fn in (
        ("event_transition_matrix", event_transition_matrix),
        ("session_paths_topk", session_paths_topk),
    ):
        walls = []
        for sf in ("sf1", "sf10"):
            w, n = timed(
                spark, lambda f=fn, s=sf: len(f(spark, f"{ROOT}/{s}").collect())
            )
            walls.append((w, n))
        (w1, n1), (w10, n10) = walls
        print(
            f"| {name} | sf1 {w1:.2f}s ({n1} rows) | "
            f"sf10 {w10:.2f}s ({n10} rows) | {w10 / w1:.2f}x per 10x |"
        )


if __name__ == "__main__":
    main()
