"""sf10-ORGANIC spot-check (round-11 verdict item): one decade past
the sf1 studies, because "fixed costs still dominate at 6M rows" says
nothing about 60M. Builds /tmp/ps_scale_sf10_organic — 100 replicas of
sf0.1 with the SAME honest-multiplicity maps as build_sf1_organic
(replica i>0 of documents rewrites tokens t -> r{i}t, so cross-replica
vocabularies are disjoint and dup pairs grow 100x LINEARLY; lineitem
gets plain l_orderkey shifts for the graph query) — then runs the six
slowest operator families min-of-2 and prints a table for
SCALING_OUT.md.

Only ``documents`` and ``lineitem`` are built at sf10 (those are the
only tables the six target queries read — 500k docs / 60M lineitem
rows); every other table symlinks to the sf1-organic build. The pass
criterion from the verdict: each sf10 wall <= ~10x its sf1 wall
(linear or better), else root-cause.

Usage: python tools/scaling_sf10.py [query ...]   (default: all six)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from petastorm_spark.queries import QUERIES  # noqa: E402
from petastorm_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
SF1_ORGANIC = "/tmp/ps_scale_sf1_organic"
DST = "/tmp/ps_scale_sf10_organic"
SHIFT = 10**9
REPLICAS = 100

TARGETS = [
    "triangle_census_parts",
    "dedup_keep_best",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs",
    "audio_dup_pairs",
    "video_dup_pairs",
    "winnowing_matches",
    # round-12 additions (the round-11 families' decade receipts)
    "lm_score_backoff",
    "ann_cosine_prefix",
    "embedding_covariance",
]


def build_embeddings(spark) -> None:
    """sf10 embeddings (round 12): the round-11 families read the
    embeddings table, which the original sf10 build symlinked to
    sf1-organic. Same honest map as build_sf1_organic: replica i>0
    applies a seeded signed coordinate permutation (orthogonal —
    within-replica cosines exact, cross-replica random-pair-sized).
    Own completion marker so adding it never rebuilds docs/lineitem."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_study import _signed_perm_expr

    eparams = f"replicas={REPLICAS};shift={SHIFT};embeddings-v1"
    marker = f"{DST}/_EMB_COMPLETE"
    if os.path.exists(marker) and open(marker).read().strip() == eparams:
        return
    link = f"{DST}/embeddings.parquet"
    if os.path.islink(link):
        os.remove(link)
    t0 = time.perf_counter()
    ebase = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eout = None
    for i in range(REPLICAS):
        part = ebase.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        if i > 0:
            part = part.withColumn(
                "embedding", F.expr(_signed_perm_expr(64, 2000 + i))
            )
        eout = part if eout is None else eout.unionByName(part)
    eout.repartition(8).write.mode("overwrite").parquet(link)
    print(f"embeddings x{REPLICAS}: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    with open(marker, "w") as f:
        f.write(eparams + "\n")


def build(spark) -> None:
    params = f"replicas={REPLICAS};shift={SHIFT};organic=documents-v1;li-v1"
    marker = f"{DST}/_BUILD_COMPLETE"
    if os.path.exists(marker) and open(marker).read().strip() == params:
        return
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "events", "embeddings"):
        link = f"{DST}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SF1_ORGANIC}/{t}.parquet", link)

    t0 = time.perf_counter()
    base = spark.read.parquet(f"{SRC}/documents.parquet")
    out = None
    for i in range(REPLICAS):
        part = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        if i > 0:
            part = part.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{i}$1")
            )
        out = part if out is None else out.unionByName(part)
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    print(f"documents x{REPLICAS}: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    out = None
    for i in range(REPLICAS):
        part = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * SHIFT))
        out = part if out is None else out.unionByName(part)
    out.repartition(64).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    print(f"lineitem x{REPLICAS}: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    with open(marker, "w") as f:
        f.write(params + "\n")


def main() -> None:
    names = sys.argv[1:] or TARGETS
    unknown = [q for q in names if q not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = get_spark("scaling_sf10")
    build(spark)
    build_embeddings(spark)

    for name in names:  # JIT warmup at toy scale
        QUERIES[name](spark, "/root/testdata/sf0.001").count()

    print("| query | sf10-ORGANIC wall | rows out |")
    print("|---|---|---|")
    for name in names:
        spark.sparkContext._jvm.System.gc()
        best, n = float("inf"), 0
        for _rep in range(2):  # min-of-2, the SCALING_OUT convention
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = QUERIES[name](spark, DST).count()
            best = min(best, time.perf_counter() - t0)
        print(f"| {name} | {best:.2f}s | {n:,} |", flush=True)


if __name__ == "__main__":
    main()
