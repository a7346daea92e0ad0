"""Round-16 interleaved code A/B: r14 snapshot (a2fc3f5) vs HEAD, for
the two bench deltas the r15 driver artifact flagged without a
pre-registered receipt:

- knn_graph_ivf 2.08s (r14) -> 3.46s (r15, +66%). similarity.py WAS
  touched in r15 (probe-config recording in knn_graph.json — which the
  registered query never writes — plus the append-probe fix and the
  l1_probe/l1_rounds knobs), so the clean-run counter-evidence alone
  is not enough; AB_r14.json measured this exact query at 2.76-3.12s
  on identical code in one session, so 3.46 sits just above the known
  envelope.
- events_ewma 1.46s -> 2.21s (+51%) on code untouched since r12, with
  no flat-profile row pre-registered.

Protocol = tools/ab_r14.py's (the round-10 discipline): one MACHINE
session, alternating fresh processes A,B,A,B,A,B; per process a
sf0.001 JIT warmup then min-of-2 walls at sf0.1 with clearCache +
System.gc before each run. No reader leg — the r15 reader medians were
in-envelope. Verdict rule (BASELINE.md session-noise protocol): noise
unless |min_B - min_A| / min_A > 25%.

Usage:
    git worktree add /tmp/ab_r14snap a2fc3f5
    python tools/ab_r16.py          # writes AB_r16.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

A_ROOT = "/tmp/ab_r14snap"
B_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PASSES = 3

QUERIES = ["knn_graph_ivf", "events_ewma"]

R14_ARTIFACT = {"knn_graph_ivf": 2.081, "events_ewma": 1.463}
R15_ARTIFACT = {"knn_graph_ivf": 3.459, "events_ewma": 2.214}

PROBE = r"""
import json, os, sys, time

root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)

from petastorm_spark.session import get_spark  # noqa: E402

spark = get_spark("ab_r16_probe")
import importlib  # noqa: E402

entry = importlib.import_module("__spark_entry__")
q = entry.queries()
names = json.loads(sys.argv[2])
out = {}
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
    p = subprocess.run(
        [sys.executable, "-c", PROBE, root, json.dumps(QUERIES)],
        capture_output=True, text=True, timeout=1800,
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
            print(f"pass {i} side {side}: " +
                  " ".join(f"{n}={res[n]}" for n in QUERIES), flush=True)

    out = {
        "protocol": "interleaved fresh-process A/B, A=a2fc3f5 (r14 "
        "snapshot worktree) B=HEAD, 3 passes/side alternating, "
        "sf0.001 warmup + min-of-2 sf0.1 walls",
        "metrics": {},
    }
    for name in QUERIES:
        av = [p[name] for p in passes["A"]]
        bv = [p[name] for p in passes["B"]]
        a, b = min(av), min(bv)
        delta = 100.0 * (b - a) / a
        out["metrics"][name] = {
            "r14_artifact": R14_ARTIFACT[name],
            "r15_artifact": R15_ARTIFACT[name],
            "ab_A_passes": av, "ab_B_passes": bv,
            "ab_A_min": a, "ab_B_min": b,
            "delta_pct": round(delta, 1),
            "verdict": (
                "regression" if delta > 25.0 else
                "improvement" if delta < -25.0 else "noise"
            ),
        }
    path = os.path.join(B_ROOT, "AB_r16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["metrics"], indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
