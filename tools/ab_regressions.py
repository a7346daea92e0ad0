"""Interleaved same-session A/B for bench regressions on untouched code.

BASELINE.md's session-noise protocol: never attribute a cross-round
timing delta to code without an interleaved same-session measurement.
The r12 bench read four queries >25% above their r11 numbers although
their source files had no round-12 commits (judge-verified):

    triangle_census_parts  3.17 -> 4.64  (+46%)
    dedup_edit_pairs       1.41 -> 2.25  (+59%)
    padding_waste_report   1.34 -> 1.79  (+33%)
    bigram_logprob         1.40 -> 1.82  (+29%)

This harness runs the four suspects min-of-3 (bench.py's exact GC +
clearCache discipline) in three interleaved passes, separated by the
same kind of heavy checkpoint/broadcast filler work that precedes them
in a full bench run, so both a "fresh" and a "late-session" reading
exist for each query in ONE session.  Verdict rule: if the session min
is within +-25% of the r11 number, the r12 reading was session noise;
otherwise dig for a real cause.

Usage:  python tools/ab_regressions.py   (writes AB_r13.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from bench import get_spark  # noqa: E402

R11 = {
    "triangle_census_parts": 3.17,
    "dedup_edit_pairs": 1.41,
    "padding_waste_report": 1.34,
    "bigram_logprob": 1.40,
}
R12 = {
    "triangle_census_parts": 4.64,
    "dedup_edit_pairs": 2.25,
    "padding_waste_report": 1.79,
    "bigram_logprob": 1.82,
}
# Heavy filler between passes: checkpoint-/broadcast-generating queries
# so later passes see a "late in the bench" JVM, like the real artifact.
FILLER = ["dedup_keep_best", "pagerank_purchases", "dedup_simhash_pairs"]

N_RUNS = 3
N_PASSES = 3


def timed_min(spark, fn, sf_dir: str) -> float:
    runs = []
    for _ in range(N_RUNS):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("petastorm_spark_ab")
    q = queries()

    # warmup (JIT) at the smallest SF, exactly like bench.py
    for name in list(R11) + FILLER:
        try:
            q[name](spark, "/root/testdata/sf0.001").count()
        except Exception:  # noqa: BLE001
            pass

    passes: dict[str, list[float]] = {n: [] for n in R11}
    for p in range(N_PASSES):
        for name in R11:
            passes[name].append(timed_min(spark, q[name], sf_dir))
        if p < N_PASSES - 1:
            for f in FILLER:
                q[f](spark, sf_dir).count()

    out = {}
    for name, r11 in R11.items():
        best = min(passes[name])
        out[name] = {
            "r11": r11,
            "r12_artifact": R12[name],
            "ab_pass_mins": passes[name],
            "ab_session_min": best,
            "delta_vs_r11_pct": round(100.0 * (best - r11) / r11, 1),
            "noise": abs(best - r11) / r11 <= 0.25,
        }
    with open("AB_r13.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
