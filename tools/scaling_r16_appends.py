"""Round-16: ANN index MAINTENANCE receipt (the r15 verdict's #5).
ivf_append is pinned append==rebuild at fixture scale (row-identical
results); what was missing is the OPERATIONAL receipt: does an index
that grew through REPEATED appends (10 batches of 5% on a 50% base)
stay within epsilon of a from-scratch build over the same corpus with
the SAME centroids, in

- RESULTS: the appended and rebuilt indexes must return row-identical
  top-k (same centroids + same content => same cells => same exact
  rescoring; any drift is a merge bug, not an approximation);
- RECALL vs exact brute force: identical for both by the above, shown
  anyway (the number a user watches for DISTRIBUTION drift, which
  appends do not cause — re-quantization-worthy drift shows up here);
- PROBE LATENCY + FILE COUNT: each append adds one file per touched
  cell, so 10 appends leave ~10x the files of a rebuild in hot cells —
  the real degradation channel. The receipt measures the wall drift
  and then shows etl.compact.compact_dataset(partition_by=["cell"])
  restoring the rebuilt index's file profile with results STILL
  row-identical (the drift-repair path; partition_by is load-bearing).

Corpus: the organic sf1 replica (scaling_r13 build, ~20k vectors,
dim 64). Queries: 256 held-out corpus vectors (exact ground truth via
brute-force cosine_topk). Walls: min-of-2 with clearCache + JVM GC.

Usage: python tools/scaling_r16_appends.py  (markdown for SCALING_OUT.md)
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from petastorm_spark.etl.compact import compact_dataset  # noqa: E402
from petastorm_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_append,
    ivf_build,
    ivf_query,
    ivf_read,
    ivf_write,
)
from petastorm_spark.session import get_spark  # noqa: E402
from scaling_r13 import ROOT, build, timed  # noqa: E402

K = 10
N_PROBE = 3
N_BATCHES = 10
OUT = "/tmp/ps_scale_r16"


def n_files(url: str) -> int:
    total = 0
    for _, _, files in os.walk(url):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def query_index(spark, url: str, queries):
    cent, cells = ivf_read(spark, url)
    return ivf_query(cent, cells, queries, k=K, n_probe=N_PROBE)


def recall_vs_exact(res, exact) -> float:
    hit = res.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    return hit.count() / exact.count()


def rows_set(df):
    return {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in df.collect()
    }


def main() -> None:
    spark = get_spark(
        "scaling_r16_appends",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    build(spark, 10, f"{ROOT}/sf1")
    emb = spark.read.parquet(f"{ROOT}/sf1/embeddings.parquet")
    n = emb.count()
    # deterministic split: 50% base, 10 batches of 5%, by vec_id rank
    bounds = [int(n * (0.5 + 0.05 * i)) for i in range(N_BATCHES + 1)]
    ordered = emb.withColumn(
        "_rn", F.row_number().over(Window.orderBy("vec_id")) - 1
    )
    from pyspark import StorageLevel

    ordered = ordered.persist(StorageLevel.MEMORY_AND_DISK)
    ordered.count()
    base = ordered.where(F.col("_rn") < bounds[0]).drop("_rn")
    queries = (
        ordered.where(F.col("_rn") % 37 == 1)
        .limit(256)
        .select("vec_id", "embedding")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    queries.count()
    print(f"corpus N={n}, base={bounds[0]}, {N_BATCHES} appends of 5%, "
          f"k={K}, n_probe={N_PROBE}, 256 queries\n")

    appended_url = f"{OUT}/ivf_appended"
    rebuilt_url = f"{OUT}/ivf_rebuilt"
    compacted_url = f"{OUT}/ivf_compacted"
    for u in (appended_url, rebuilt_url, compacted_url):
        shutil.rmtree(u, ignore_errors=True)

    cent, cells = ivf_build(base)
    ivf_write(appended_url, cent, cells)
    for i in range(N_BATCHES):
        batch = ordered.where(
            (F.col("_rn") >= bounds[i]) & (F.col("_rn") < bounds[i + 1])
        ).drop("_rn")
        ivf_append(spark, appended_url, batch)

    # from-scratch rebuild over the SAME corpus with the SAME centroids
    cent2, cells2 = ivf_build(emb, centroids=cent)
    ivf_write(rebuilt_url, cent2, cells2)

    exact = cosine_topk(emb, queries, k=K).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    exact.count()

    results = {}
    for label, url in (("appended x10", appended_url),
                       ("rebuilt", rebuilt_url)):
        w, _ = timed(spark, lambda u=url: query_index(
            spark, u, queries).count())
        res = query_index(spark, url, queries)
        rec = recall_vs_exact(res, exact)
        nf = n_files(url + "/cells")
        results[label] = rows_set(res)
        print(f"| {label} | probe {w:.2f}s | recall@{K} {rec:.4f} | "
              f"{nf} cell files |")

    same = results["appended x10"] == results["rebuilt"]
    print(f"| appended == rebuilt (row-identical) | {same} | | |")

    # compaction = the drift-repair path
    compact_dataset(spark, appended_url + "/cells",
                    compacted_url + "/cells", partition_by=["cell"])
    shutil.copytree(appended_url + "/centroids",
                    compacted_url + "/centroids")
    w, _ = timed(spark, lambda: query_index(
        spark, compacted_url, queries).count())
    res = query_index(spark, compacted_url, queries)
    nf = n_files(compacted_url + "/cells")
    same_c = rows_set(res) == results["rebuilt"]
    print(f"| appended -> compacted | probe {w:.2f}s | row-identical "
          f"{same_c} | {nf} cell files |")


if __name__ == "__main__":
    main()
