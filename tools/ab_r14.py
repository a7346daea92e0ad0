"""Round-14 interleaved code A/B: r12 snapshot (652a868) vs HEAD.

The r13 DRIVER bench artifact read reader throughput at 5,382 sps
(r12: 7,711, -30%) and the ANN/semantic family +31-51%
(ann_cosine_ivfpq 3.03->4.14s, ann_recall_ivfpq 2.34->3.53s,
knn_graph_ivf 1.75->2.51s, dedup_semantic 1.46->2.22s,
dedup_semantic_incremental 1.52->1.99s, incremental_near_dup
3.16->4.43s) — and round 13 materially rewrote BOTH suspects
(reader.py schema evolution, similarity.py +2,714 lines), so the
repo's clean-run counter-evidence is not enough: BASELINE.md's
protocol requires an interleaved SAME-SESSION A/B of the two code
snapshots before attributing (or dismissing) a cross-round delta.

Design: the two snapshots cannot share one Python process (imports
collide), so "same session" here is the round-10 protocol — one
MACHINE session, alternating fresh processes A,B,A,B,A,B back to
back (identical host load envelope), each process running the exact
bench discipline:

- reader throughput first (bench.measure_reader_throughput, the
  hello_world PNG protocol: 200 warmup + 1000-read windows,
  best-of-5 + stall rerun);
- then the six flagged queries, sf0.001 warmup, min-of-2 at sf0.1
  with clearCache + System.gc before each run.

A = the r12 snapshot in a git worktree (652a868), B = HEAD.
Verdict rule (BASELINE.md session-noise protocol): a query delta is
NOISE unless |min_B - min_A| / min_A > 25%; the reader verdict reads
the MEDIAN window sps (the noise-robust trend number) at the same
threshold.

Usage:
    git worktree add /tmp/ab_r12 652a868
    python tools/ab_r14.py          # writes AB_r14.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

A_ROOT = "/tmp/ab_r12"
B_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PASSES = 3

QUERIES = [
    "ann_cosine_ivfpq",
    "ann_recall_ivfpq",
    "knn_graph_ivf",
    "dedup_semantic",
    "dedup_semantic_incremental",
    "incremental_near_dup",
]

R12_ARTIFACT = {
    "ann_cosine_ivfpq": 3.028,
    "ann_recall_ivfpq": 2.342,
    "knn_graph_ivf": 1.75,
    "dedup_semantic": 1.459,
    "dedup_semantic_incremental": 1.522,
    "incremental_near_dup": 3.155,
    "reader_median_sps": 7459.5,
}
R13_ARTIFACT = {
    "ann_cosine_ivfpq": 4.144,
    "ann_recall_ivfpq": 3.526,
    "knn_graph_ivf": 2.514,
    "dedup_semantic": 2.217,
    "dedup_semantic_incremental": 1.992,
    "incremental_near_dup": 4.432,
    "reader_median_sps": 5101.0,
}

PROBE = r"""
import json, os, sys, time

root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)

from petastorm_spark.session import get_spark  # noqa: E402

spark = get_spark("ab_r14_probe")
import importlib  # noqa: E402

bench = importlib.import_module("bench")
out = {}
r = bench.measure_reader_throughput(spark)
out["reader_sps"] = r["samples_per_sec"]
out["reader_median_sps"] = r["median_sps"]
out["reader_window_sps"] = r["window_sps"]

entry = importlib.import_module("__spark_entry__")
q = entry.queries()
names = json.loads(sys.argv[2])
for name in names:  # JIT warmup, the bench.py protocol
    q[name](spark, "/root/testdata/sf0.001").count()
for name in names:
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        q[name](spark, "/root/testdata/sf0.1").count()
        runs.append(time.perf_counter() - t0)
    out[name] = round(min(runs), 3)
print("AB_PROBE_JSON " + json.dumps(out))
"""


def run_probe(root: str) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", PROBE, root, json.dumps(QUERIES)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_PROBE_JSON "):
            return json.loads(line[len("AB_PROBE_JSON "):])
    raise RuntimeError(
        f"probe at {root} produced no result; rc={p.returncode}\n"
        f"stdout tail: {p.stdout[-2000:]}\nstderr tail: {p.stderr[-2000:]}"
    )


def main() -> None:
    passes = {"A": [], "B": []}
    for i in range(N_PASSES):
        for side, root in (("A", A_ROOT), ("B", B_ROOT)):
            res = run_probe(root)
            passes[side].append(res)
            print(f"pass {i} side {side}: reader_median="
                  f"{res['reader_median_sps']} " +
                  " ".join(f"{n}={res[n]}" for n in QUERIES), flush=True)

    def best(side: str, key: str, lo_is_best: bool = True):
        vals = [p[key] for p in passes[side]]
        return (min if lo_is_best else max)(vals), vals

    out = {
        "protocol": "interleaved fresh-process A/B, A=652a868 (r12 "
        "snapshot worktree) B=HEAD, 3 passes/side alternating, "
        "reader best-of-5-windows median + min-of-2 query walls",
        "metrics": {},
    }
    for name in QUERIES:
        a, av = best("A", name)
        b, bv = best("B", name)
        delta = 100.0 * (b - a) / a
        out["metrics"][name] = {
            "r12_artifact": R12_ARTIFACT[name],
            "r13_artifact": R13_ARTIFACT[name],
            "ab_A_passes": av, "ab_B_passes": bv,
            "ab_A_min": a, "ab_B_min": b,
            "delta_pct": round(delta, 1),
            "verdict": (
                "regression" if delta > 25.0 else
                "improvement" if delta < -25.0 else "noise"
            ),
        }
    a, av = best("A", "reader_median_sps", lo_is_best=False)
    b, bv = best("B", "reader_median_sps", lo_is_best=False)
    delta = 100.0 * (b - a) / a
    out["metrics"]["reader_median_sps"] = {
        "r12_artifact": R12_ARTIFACT["reader_median_sps"],
        "r13_artifact": R13_ARTIFACT["reader_median_sps"],
        "ab_A_passes": av, "ab_B_passes": bv,
        "ab_A_best": a, "ab_B_best": b,
        "delta_pct": round(delta, 1),
        "verdict": (
            "regression" if delta < -25.0 else
            "improvement" if delta > 25.0 else "noise"
        ),
    }
    with open(os.path.join(B_ROOT, "AB_r14.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
