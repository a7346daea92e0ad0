"""Round-16 structural profiler: for each named registered query,
measure wall (min-of-N, bench methodology: clearCache + JVM GC before
every timed run) AND the structural fingerprint the wall-noise
protocol cannot blur — number of Spark jobs, stages and tasks the
query submits, counted via the status tracker under a per-query job
group. Scheduler-bound queries' walls swing +-25% between sessions on
identical code; their job/stage counts do not, so a stage-count drop
is hard evidence an optimization removed fixed cost (and, for
exchange removals, shuffle cost at any scale).

Usage:
  python tools/profile_r16.py [--sf SF] [--runs N] [--plans DIR] q1 q2 ...
  python tools/profile_r16.py --top  # the r15 slowest-30 set

With --plans DIR, writes DIR/<query>.txt containing
explain("formatted") of the returned DataFrame (note: work done
EAGERLY inside the query function — localCheckpoint ladders — is
visible in the job/stage counts but not in the final plan).

Output: one JSON line per query:
  {"query", "wall_min", "walls", "n_jobs", "n_stages", "n_tasks",
   "plan_exchanges", "plan_python"}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from petastorm_spark.queries import QUERIES  # noqa: E402
from petastorm_spark.session import get_spark  # noqa: E402

TOP = [
    "pagerank_personalized", "audio_dup_pairs", "dedup_simhash_pairs",
    "video_dup_pairs", "ann_recall_ivfpq", "label_propagation_parts",
    "knn_graph_ivf", "ann_cosine_ivfpq", "pagerank_purchases",
    "dedup_keep_best", "incremental_near_dup", "knn_graph_communities",
    "bitext_margin_mine", "winnowing_matches", "kcore_purchase_graph",
    "events_ewma", "dedup_threshold_curve", "split_leakage_safe",
    "embedding_intrinsic_dim", "dedup_near_pairs", "dedup_source_matrix",
    "q21_waiting_suppliers", "ann_cosine_pq", "dedup_clusters",
    "cluster_balanced_sample", "dedup_containment_pairs",
    "dedup_semantic_incremental", "dedup_semantic_probe2",
    "triangle_census_parts", "kmeans_embeddings",
]


def job_group_counts(spark, group: str) -> tuple[int, int, int]:
    st = spark.sparkContext.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for jid in jobs:
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is None:
                continue
            n_stages += 1
            n_tasks += si.numTasks
    return len(jobs), n_stages, n_tasks


def main() -> None:
    args = sys.argv[1:]
    sf = "0.1"
    runs = 3
    plans_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf = args[i + 1]; i += 2
        elif a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--top":
            names += TOP; i += 1
        else:
            names.append(a); i += 1
    if not names:
        raise SystemExit(__doc__)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
    sf_dir = f"/root/testdata/sf{sf}"
    spark = get_spark("profile_r16")
    sc = spark.sparkContext
    # warmup at the smallest sf (bench methodology: JIT outside timing)
    for n in names:
        try:
            QUERIES[n](spark, "/root/testdata/sf0.001").count()
        except Exception as e:  # noqa: BLE001
            print(f"WARMUP-FAIL {n}: {e}", file=sys.stderr)
    for n in names:
        walls = []
        counts = (0, 0, 0)
        for r in range(runs):
            spark.catalog.clearCache()
            sc._jvm.System.gc()
            group = f"prof_{n}_{r}"
            sc.setJobGroup(group, n)
            t0 = time.perf_counter()
            df = QUERIES[n](spark, sf_dir)
            df.count()
            walls.append(time.perf_counter() - t0)
            counts = job_group_counts(spark, group)
            sc.setJobGroup(f"prof_gap", "between")
        plan_ex = plan_py = None
        try:
            df = QUERIES[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = None
        if plan is not None:
            plan_ex = plan.count("Exchange")
            plan_py = (
                plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas")
                + plan.count("MapInArrow")
                + plan.count("FlatMapGroupsInPandas")
            )
            if plans_dir:
                with open(os.path.join(plans_dir, f"{n}.txt"), "w") as f:
                    f.write(plan)
        print(json.dumps({
            "query": n,
            "wall_min": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
            "n_jobs": counts[0],
            "n_stages": counts[1],
            "n_tasks": counts[2],
            "plan_exchanges": plan_ex,
            "plan_python": plan_py,
        }), flush=True)


if __name__ == "__main__":
    main()
